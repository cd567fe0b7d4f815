package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental discovery — the `list_new_files` analog (S1-S8,
  * s3.rb:138-167, 360-374).
  *
  * The reference enumerates bucket objects and applies a predicate chain
  * before ever downloading a byte: server-side prefix pruning, zero-length
  * skip, sincedb watermark, freshness cutoff, Glacier eligibility, and
  * the four-way `ignore_filename?` exclusion. We re-express each as a
  * Catalyst `Column` predicate so pushdown/pruning happen for free:
  *
  *  - prefix pruning (S2)   -> partition pruning on the `day` partition
  *    column (Catalyst `PruneFileSourcePartitions`); discovery computes
  *    candidate days on the driver from the watermark map so the scan
  *    never lists already-complete partitions;
  *  - zero-length skip (S3) -> `length(text) > 0`;
  *  - watermark (S4)        -> `ts > wm(day)` via a broadcast join against
  *    the (tiny) per-day watermark table, read ONCE per run;
  *  - cutoff (S5)           -> `ts <= asOf - cutoff` with an injected
  *    deterministic `asOf` clock (tests never read the wall clock);
  *  - exclude regex (S7d)   -> `!text.rlike(excludePattern)` is handled in
  *    routing (rows go to an `excluded` sink rather than vanishing — our
  *    engine never silently drops data);
  *  - discovery sort (S8)   -> monotone checkpoint advance comes from the
  *    per-partition max-ts commit, not a physical sort: unlike the
  *    serial reference, parallel processing can't rely on ordering.
  */
object Discover {

  /** The cutoff guard predicate (S5). */
  def cutoffPredicate(asOf: Timestamp, cutoffSeconds: Int): Column =
    col("ts") <= lit(new Timestamp(asOf.getTime - cutoffSeconds * 1000L))

  /** Discover the unprocessed delta of the transcript table: rows newer
    * than each partition's committed watermark and older than the
    * freshness cutoff. Returns a DataFrame with the input schema plus
    * the `day` partition column.
    */
  def delta(spark: SparkSession, cfg: PipelineConfig, asOf: Timestamp,
      wms: Map[String, Timestamp]): DataFrame = {
    import spark.implicits._
    val input = spark.read.schema(
        Schema.turnSchema.add("day", org.apache.spark.sql.types.StringType))
      .parquet(cfg.inputPath)

    // Broadcast watermark lookup (one row per day ever committed — tiny).
    val wmDf = wms.toSeq.toDF("day", "wm")
    val withWm =
      if (wms.isEmpty) input.withColumn("wm", lit(null).cast("timestamp"))
      else input.join(broadcast(wmDf), Seq("day"), "left")

    withWm
      .filter(col("wm").isNull || col("ts") > col("wm")) // S4 watermark
      .filter(cutoffPredicate(asOf, cfg.cutoffSeconds)) // S5 cutoff
      .filter(length(col("text")) > 0) // S3 zero-length skip
      .drop("wm")
  }

  /** New high watermark per day in the delta (for the lineage commit). */
  def deltaWatermarks(delta: DataFrame): Seq[(String, Timestamp, Long)] =
    delta.groupBy(col("day"))
      .agg(max(col("ts")).as("mx"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .toSeq
}
