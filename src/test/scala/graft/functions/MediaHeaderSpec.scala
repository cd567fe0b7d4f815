package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Pins the routed-stage header expression to the codecs' semantics —
  * in particular the WAV duration CONVERSION (decodeWav's 4th element
  * is the data-chunk byte count; duration_ms = bytes * 1000 /
  * byte-rate, the m03 formula) and the zero-byte-rate hostile case,
  * neither of which the e2e mixed-fixture test can see (it only
  * asserts non-nullness per format).
  */
class MediaHeaderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.pipeline.SparkTestSession.spark
  import spark.implicits._

  private def decode(payloads: Array[Byte]*) =
    payloads.toSeq.toDF("media")
      .select(MediaHeader.mediaHeader($"media").as("h"))
      .select($"h.kind", $"h.width", $"h.height", $"h.channels",
        $"h.sample_rate", $"h.bits", $"h.duration_ms")
      .collect()

  /** A spec-valid WAV header with the given fmt fields and data size. */
  private def wav(ch: Int, rate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * bits / 8)
    bb.putShort((ch * bits / 8).toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  test("WAV duration_ms is bytes/byte-rate (the m03 formula), NOT the " +
      "raw data byte count; zero-byte-rate declarations classify null") {
    // 88,200 bytes at 44.1kHz stereo 16-bit (176,400 B/s) = 500 ms
    val r = decode(wav(2, 44100, 16, 88200)).head
    assert(r.getString(0) == "wav")
    assert((r.getInt(3), r.getInt(4), r.getInt(5)) == ((2, 44100, 16)))
    assert(r.getLong(6) == 500L,
      s"duration must be ms, not the byte count (got ${r.getLong(6)})")
    // parity with the m03 audioMeta conversion on the synth fixtures
    (0L until 8L).foreach { id =>
      val p = Multimodal.synthWavPayload(id)
      val Some((ch, rate, bits, bytes)) = Multimodal.AudioCodec.decodeWav(p)
      val row = decode(p).head
      assert(row.getLong(6) == bytes * 1000L / (rate.toLong * ch * bits / 8),
        s"id=$id")
    }
    // hostile: ch=1, rate=1, bits=1 all pass decodeWav's > 0 gates but
    // the byte-rate floors to ZERO — must classify undecodable (null
    // struct -> deadletter), never divide by zero in an executor
    val hostile = decode(wav(1, 1, 1, 4)).head
    assert(hostile.isNullAt(0), "zero byte-rate must classify, not throw")
  }

  test("dispatch by magic: PNG carries dims only, MP4 dims+duration, " +
      "garbage and null classify as a null struct") {
    val png = decode(Multimodal.synthImagePayload(0L)).head
    assert(png.getString(0) == "png" && !png.isNullAt(1) &&
      png.isNullAt(3) && png.isNullAt(6))
    val mp4 = decode(Multimodal.synthMp4Payload(0L)).head
    assert(mp4.getString(0) == "mp4" && !mp4.isNullAt(1) &&
      !mp4.isNullAt(6) && mp4.isNullAt(4))
    val junk = decode(Array[Byte](1, 2, 3, 4), Array.emptyByteArray)
    assert(junk.forall(_.isNullAt(0)))
  }
}
