package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: one-pass media-container HEADER decode
  * of a binary blob — the engine's routed-multimodal stage
  * ([[graft.pipeline.Main]]'s `mediaStage`) evaluates it in the same
  * narrow map as routing, so blobs are classified and their metadata
  * extracted without ever shuffling payload bytes. Dispatch is by
  * magic bytes across the REAL pure-JVM container walks (PNG/JPEG
  * IHDR+marker, RIFF/WAVE chunk, ISO-BMFF box —
  * [[graft.ops.Multimodal]]); anything none of them accepts yields a
  * NULL struct, which the stage routes to the dead-letter sink (the
  * corrupt-JSON discipline: visible, never dropped).
  *
  * Result struct (fields a format doesn't define are null):
  * kind, width, height, channels, sample_rate, bits, duration_ms.
  */
case class MediaHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaHeader.schema
  override def nullable: Boolean = true
  override def prettyName: String = "media_header"

  override protected def nullSafeEval(input: Any): Any =
    MediaHeader.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the result is null for NON-NULL undecodable input, so the
    // defineCodeGen shortcut (which pins isNull to the child's) does
    // not apply — assign, then derive isNull from the value
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaHeader.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): MediaHeader =
    copy(child = newChild)
}

object MediaHeader {
  import graft.ops.Multimodal.{AudioCodec, ImageCodec, VideoCodec}

  val schema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("duration_ms", LongType),
    // video sample-table signals (m09) — null unless the blob is an
    // MP4 whose stbl parses (decodeSampleTables); the header fields
    // above stay valid either way, so a table-less MP4 is NOT
    // undecodable, it just lacks these
    StructField("n_frames", LongType),
    StructField("bitrate_bps", LongType),
    StructField("keyframe_density_x1000", LongType)))

  /** Static entry point shared by interpreted eval and generated code.
    * Null result == undecodable. Each codec gates on its own magic, so
    * the dispatch order carries no semantics.
    */
  def compute(payload: Array[Byte]): InternalRow =
    ImageCodec.decodeDims(payload) match {
      case Some((fmt, w, h)) =>
        row(fmt, Int.box(w), Int.box(h), null, null, null, null,
          null, null, null)
      case None => AudioCodec.decodeWav(payload) match {
        // decodeWav's 4th element is the data-chunk BYTE COUNT;
        // duration = bytes / byte-rate (the m03 formula). A declared
        // format whose byte-rate floors to zero (bits*ch*rate < 8 —
        // each factor individually passes decodeWav's > 0 gates) is
        // garbage: classify undecodable rather than divide by zero in
        // an executor.
        case Some((ch, rate, bits, dataBytes))
            if rate.toLong * ch * bits / 8 > 0 =>
          row("wav", null, null, Int.box(ch), Int.box(rate), Int.box(bits),
            Long.box(dataBytes * 1000L / (rate.toLong * ch * bits / 8)),
            null, null, null)
        // `_` not `None`: a zero-byte-rate WAV falls through here too
        case _ => VideoCodec.decodeMp4(payload) match {
          case Some((w, h, durMs)) =>
            // sample-table signals when the stbl parses AND its media
            // duration floors positive (decodeSampleTables guarantees
            // totalDelta > 0, not the floored ms) — absent otherwise,
            // without demoting the header decode
            val st = VideoCodec.decodeSampleTables(payload)
              .filter(s => s.totalDelta * 1000L / s.timescale > 0)
            row("mp4", Int.box(w), Int.box(h), null, null, null,
              Long.box(durMs),
              st.map(s => Long.box(s.nFrames)).orNull,
              st.map { s =>
                val mediaMs = s.totalDelta * 1000L / s.timescale
                Long.box(s.totalBytes * 8000L / mediaMs)
              }.orNull,
              st.map(s =>
                Long.box(s.nKeyframes * 1000L / s.nFrames)).orNull)
          case None => null
        }
      }
    }

  private def row(kind: String, vals: Any*): InternalRow =
    new GenericInternalRow(
      (UTF8String.fromString(kind) +: vals).toArray[Any])

  def mediaHeader(payload: Column): Column =
    org.apache.spark.sql.graftshim.columnOf(
      MediaHeader(org.apache.spark.sql.graftshim.expressionOf(payload)))
}
