package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side machinery is REAL and tested: schema, partition-size
  * control for fat binary rows, batched per-partition processing with a
  * reused decoder instance (the Scala analog of a Pandas-UDF batch), and
  * deterministic synthetic payloads. The actual codec work is STUBBED —
  * media libraries are not in this container — behind
  * [[StubCodec]], a deterministic fake whose "decode" parses our own
  * synthetic header. Swap `StubCodec` for a real JNI/ffmpeg-backed codec
  * without touching any of the dataflow.
  *
  * Scale notes: binary rows are huge relative to text rows, so
  *  - `spark.sql.files.maxPartitionBytes` governs scan-splits, and the
  *    repartition in [[decodeFeatures]] targets a bounded number of
  *    payload bytes per task rather than a row count;
  *  - features (small) are split from payloads (fat) immediately after
  *    decode so downstream shuffles never move the blobs.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int, // typed metadata travels beside the blob
      height: Int,
      duration_ms: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      feat: Seq[Float]) // fixed-size feature vector

  /** Deterministic synthetic payload: 16-byte header
    * [magic(4) | width(4) | height(4) | duration(4)] + seeded noise body.
    * Body LENGTH is a closed-form function of the id (`256 +
    * (id * 2654435761) % 1024`) so size-derived outputs are
    * oracle-recomputable in plain SQL; body CONTENT stays seeded noise.
    */
  def synthPayload(id: Long, kind: String, w: Int, h: Int,
      dur: Int): Array[Byte] = {
    val rng = new java.util.Random(id * 2654435761L)
    // floorMod, not %: for id >= ~3.47e9 the product wraps negative and
    // Java % would return a negative remainder (NegativeArraySizeException
    // + divergence from the oracle's exact-arithmetic modulo). Since 1024
    // divides 2^64, floorMod of the wrapped product equals the true
    // mathematical mod for ALL ids.
    val body = new Array[Byte](256 +
      Math.floorMod(id * 2654435761L, 1024L).toInt)
    rng.nextBytes(body)
    val bb = java.nio.ByteBuffer.allocate(16 + body.length)
    bb.putInt(0x4D454449) // "MEDI"
    bb.putInt(w); bb.putInt(h); bb.putInt(dur)
    bb.put(body)
    bb.array()
  }

  /** Kind is id % 3 (image/audio/video) — closed-form for the oracle;
    * dimensions/duration metadata stay seeded pseudo-random.
    */
  def synthMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism).map { id =>
      val rng = new java.util.Random(id)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val (w, h, d) = kind match {
        case "image" => (64 + rng.nextInt(512), 64 + rng.nextInt(512), 0)
        case "audio" => (0, 0, 1000 + rng.nextInt(60000))
        case _ => (320, 240, 1000 + rng.nextInt(10000))
      }
      MediaRow(id, kind, synthPayload(id, kind, w, h, d), w, h, d)
    }
  }

  /** STUB decoder — deterministic fake. A real implementation would wrap
    * an image/audio library here; everything around it (batching,
    * instance reuse, schema) is production-shaped.
    */
  object StubCodec {
    /** "Decode": validate magic, read header dims, hash the body into a
      * fixed-size pseudo-feature vector. Deterministic per payload.
      */
    def decodeToFeatures(payload: Array[Byte], dims: Int): (Long, Array[Float]) = {
      val bb = java.nio.ByteBuffer.wrap(payload)
      require(bb.getInt() == 0x4D454449, "bad magic: not a MEDI payload")
      bb.getInt(); bb.getInt(); bb.getInt() // header consumed
      var checksum = 1469598103934665603L // FNV-1a
      val feat = new Array[Float](dims)
      var i = 16
      while (i < payload.length) {
        checksum = (checksum ^ (payload(i) & 0xffL)) * 1099511628211L
        feat(i % dims) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (checksum, feat)
    }

    /** STUB "resize": real codec would rescale pixels; the fake just
      * rewrites the header dims (payload body untouched — deterministic).
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = payload.clone()
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(4, w); bb.putInt(8, h)
      out
    }
  }

  /** Decode + feature-extract: batched per partition with one codec
    * instance per task (the mapInPandas batch-shape analog in Scala).
    * Output drops the payload — downstream never shuffles blobs.
    *
    * Partitioning: `numTasks` (when given) sets the repartition width —
    * the caller sizes it so each task holds a bounded number of payload
    * BYTES (e.g. totalBytes / 256MB). The default, cluster parallelism,
    * is right for freshly-scanned media tables because
    * `spark.sql.files.maxPartitionBytes` already splits fat binary
    * files at scan time.
    */
  def decodeFeatures(media: Dataset[MediaRow], dims: Int = 16,
      numTasks: Option[Int] = None): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(math.max(1, numTasks.getOrElse(
        media.sparkSession.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        // codec init happens once per task, not per row
        it.map { m =>
          val (checksum, feat) = StubCodec.decodeToFeatures(m.payload, dims)
          MediaFeatures(m.media_id, m.kind, m.payload.length, checksum,
            feat.toSeq)
        }
      }
  }

  /** Frame-sampling plan for video rows: every `everyMs` ms — pure
    * column math (no decode needed for the schedule), the decode of each
    * sampled frame is the stubbed step.
    */
  def frameSamplePlan(media: DataFrame, everyMs: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0),
          col("duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))
}
