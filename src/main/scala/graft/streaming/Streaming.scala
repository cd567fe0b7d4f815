package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.pipeline._

/** Structured Streaming surface of the transcript pipeline.
  *
  * The reference is a polling ingest loop: `Stud.interval(@interval)`
  * re-lists the bucket every 60s and processes the new files
  * (reference: lib/logstash/inputs/s3.rb:130-136), with
  * `watch_for_new_files=false` meaning "one listing, then stop"
  * (s3.rb:125-127). Structured Streaming maps both modes directly:
  *
  *  - `Trigger.ProcessingTime("60 seconds")` == the polling loop (S18);
  *  - `Trigger.AvailableNow` == watch_for_new_files=false: drain what
  *    exists, then stop;
  *  - the file-source's own tracking of seen files inside
  *    `checkpointLocation` == the sincedb (S17): a restarted query
  *    resumes exactly where it stopped, at-least-once upgraded to
  *    exactly-once for the file source + foreachBatch idempotent sinks;
  *  - `withWatermark("ts", "3 seconds")` == CUTOFF_SECOND (S5,
  *    s3.rb:91): tolerate 3s of event-time disorder before finalizing
  *    windows.
  *
  * Two processing shapes are provided:
  *
  *  1. [[runForeachBatch]] — the production shape. Each micro-batch runs
  *     the SAME batch operators (Parse -> Enrich -> Route) and appends
  *     per-sink output; the full operator set (including the chunked
  *     prefix scans, which need sorting) is legal inside foreachBatch.
  *
  *  2. [[streamingAggregates]] — a pure-streaming stateful aggregation:
  *     watermarked tumbling-hour per-sink counts in update mode (the
  *     reference's "metrics" analog with real late-data semantics).
  *
  * Plus [[StatefulHeaders.propagate]] — per-conversation header
  * propagation (P5, s3.rb:280-290) as `flatMapGroupsWithState`: the
  * carried `#Version:` header is genuine keyed state that survives
  * across micro-batches, which no per-batch window can do.
  */
object Streaming {

  /** File-source stream over a (possibly growing) transcript table dir.
    * Parquet streaming source requires an explicit schema; new files
    * appearing under the path are discovered per trigger — the
    * `list_new_files` analog (S1) with the source's seen-file log as
    * the listing watermark.
    */
  def readTurns(spark: SparkSession, inputPath: String,
      maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(Schema.turnSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputPath)

  /** Persisted per-conversation carry state for [[runForeachBatch]]:
    * (last header values, running record-start count) per conv, written
    * as a full-state snapshot per micro-batch. With maxFilesPerTrigger a
    * conversation can SPAN micro-batches; without a carry, headers seen
    * in an earlier batch would not stamp later batches and session ids
    * would restart per batch — diverging from the batch pipeline. The
    * carry is the foreachBatch analog of the engine-managed state store
    * (the [[StatefulHeaders]] mechanism), kept in plain parquet so a
    * retried/restarted batch recomputes it deterministically.
    *
    * Ordering VALIDITY IS CHECKED, not assumed: the carry records each
    * conversation's max committed turn_idx, and a batch delivering
    * turn_idx <= that max (an out-of-order backfill — e.g. an old file
    * landing late) has those rows QUARANTINED to
    * `stream/_violations/batch=N` before the pipeline runs, never
    * silently stamped with a header/session context that postdates them.
    * The reference gets the same guarantee from its serial oldest-first
    * listing (s3.rb:166); a parallel engine has to enforce it.
    */
  /** The shared full-snapshot store behind [[Carry]] and
    * [[StreamFingerprints]]: per-batch FULL snapshots under
    * `<dir>/batch=<id>`; reads take the latest snapshot STRICTLY
    * BEFORE a batch id (a retried batch never consults its own crashed
    * partial write — only the committed predecessor); writes overwrite
    * idempotently and retain this snapshot plus the previous two
    * (enough for any retry of batchId or batchId+1 to find its
    * strictly-earlier snapshot) — full snapshots, not deltas, so each
    * state dir stays O(state), not O(batches). ONE body so the
    * strictly-before and retention rules cannot drift between stores.
    */
  private[streaming] object SnapshotStore {
    import org.apache.spark.sql.types.StructType

    def read(spark: SparkSession, dir: String, schema: StructType,
        beforeBatch: Long): DataFrame = {
      val d = new org.apache.hadoop.fs.Path(dir)
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prev =
        if (!fs.exists(d)) None
        else fs.listStatus(d).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith("batch="))
          .map(_.stripPrefix("batch=").toLong)
          .filter(_ < beforeBatch)
          .sorted.lastOption
      prev match {
        case Some(b) => spark.read.schema(schema).parquet(s"$dir/batch=$b")
        case None => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    }

    def write(state: DataFrame, dir: String, batchId: Long): Unit = {
      state.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
      val d = new org.apache.hadoop.fs.Path(dir)
      val fs = d.getFileSystem(
        state.sparkSession.sparkContext.hadoopConfiguration)
      fs.listStatus(d).toSeq
        .map(_.getPath)
        .filter(_.getName.startsWith("batch="))
        .filter(_.getName.stripPrefix("batch=").toLong < batchId - 2)
        .foreach(p => fs.delete(p, true))
    }
  }

  object Carry {
    import org.apache.spark.sql.types._

    /** `carry_prev_belongs` is the what=next multiline seam flag: did
      * the conversation's LAST committed row "belong" under the codec's
      * pattern? If so, the conv's first row of the NEXT batch continues
      * the same record instead of starting one (see the seam adjustment
      * in [[runForeachBatch]]). Snapshots written before this field
      * existed read as null == false (no seam), which matches their
      * era's behavior.
      */
    val schema: StructType = StructType(Seq(
      StructField("conv_id", StringType),
      StructField("carry_header", StringType),
      StructField("carry_fields", StringType),
      StructField("carry_sessions", LongType),
      StructField("carry_max_idx", IntegerType),
      StructField("carry_prev_belongs", BooleanType)))

    def dir(sinkRoot: String): String = s"$sinkRoot/stream/_carry"

    def read(spark: SparkSession, sinkRoot: String,
        beforeBatch: Long): DataFrame =
      SnapshotStore.read(spark, dir(sinkRoot), schema, beforeBatch)

    def write(state: DataFrame, sinkRoot: String, batchId: Long): Unit =
      SnapshotStore.write(state, dir(sinkRoot), batchId)
  }

  /** Streaming fingerprint store for cross-batch dedup — the [[Carry]]
    * discipline applied to the seen-set: one FULL snapshot of all
    * content fingerprints per micro-batch (not per-batch deltas, whose
    * read fan-in would grow O(batches)), read strictly-before the
    * current batch id so a retried batch never consults its own
    * crashed partial write, retention = latest three snapshots. This
    * is the streaming face of the batch pipeline's
    * `_fingerprints/<cid>` store (PipelineConfig.dedupAcrossCycles) —
    * same invariant, same `duplicate` sink, checkpoint-replay-safe by
    * the same strictly-before rule.
    */
  object StreamFingerprints {
    import org.apache.spark.sql.types._

    val schema: StructType = StructType(Seq(StructField("fp", StringType)))

    def dir(sinkRoot: String): String = s"$sinkRoot/stream/_fingerprints"

    def read(spark: SparkSession, sinkRoot: String,
        beforeBatch: Long): DataFrame =
      SnapshotStore.read(spark, dir(sinkRoot), schema, beforeBatch)

    def write(merged: DataFrame, sinkRoot: String, batchId: Long): Unit =
      SnapshotStore.write(merged, dir(sinkRoot), batchId)
  }

  /** Production shape: micro-batch = one reference polling cycle.
    * Parse/Enrich/Route are the identical batch operators; per-sink
    * rows append under `<sinkRoot>/stream/<sink>/`. Exactly-once comes
    * from the file source's offset log in `checkpointLocation` plus
    * the deterministic per-batch output dirs.
    *
    * Cross-batch continuity: header propagation (P5) and session ids
    * (P3) are adjusted by the persisted [[Carry]] state, so the
    * streaming output matches the batch pipeline even when a
    * conversation spans triggers (maxFilesPerTrigger). A retried batch
    * reads the previous batch's carry and republishes both the output
    * dir and its own carry snapshot idempotently.
    *
    * `codec` is orthogonal to the trigger, exactly as the reference's
    * codec plugin is orthogonal to its polling loop (s3.rb:35 vs
    * 130-136): json/multiline users get identical parse semantics under
    * AvailableNow and ProcessingTime as under the batch cycle.
    */
  def runForeachBatch(spark: SparkSession, inputPath: String,
      sinkRoot: String, checkpoint: String, excludePattern: String = "",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 64,
      codec: Pipeline.Codec = Pipeline.GrokCodec,
      dedupAcrossBatches: Boolean = false): StreamingQuery = {
    import spark.implicits._
    readTurns(spark, inputPath, maxFilesPerTrigger).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sess = batch.sparkSession
        // cached: the ordering-guard join, the carry-in join and the
        // carry-out anti-join all consume this snapshot — uncached,
        // each action would re-scan the carry parquet
        val prev = Carry.read(sess, sinkRoot, batchId).cache()
        // ordering guard: rows at or below a conversation's committed
        // max turn_idx are out-of-order backfill — quarantine them RAW
        // (their true header/session context predates the carry state;
        // stamping them with the current carry would be silently wrong)
        val isLate = coalesce(col("turn_idx") <= col("carry_max_idx"),
          lit(false))
        // cached: the count, the quarantine write, and the main path all
        // consume this join — without the cache each would re-read the
        // batch's source files
        val flagged = batch.join(
          prev.select(col("conv_id"), col("carry_max_idx")),
          Seq("conv_id"), "left").cache()
        val lateRaw = flagged.filter(isLate).drop("carry_max_idx")
        val nLate = lateRaw.count()
        if (nLate > 0) {
          System.err.println(s"[stream] batch=$batchId: $nLate out-of-order " +
            s"backfill rows quarantined to stream/_violations/batch=$batchId")
          lateRaw.write.mode("overwrite")
            .parquet(s"$sinkRoot/stream/_violations/batch=$batchId")
        }
        val turns = flagged.filter(!isLate).drop("carry_max_idx").as[Turn]
        val routed = Pipeline(turns, excludePattern, codec = codec)
        // the multiline what=next SEAM: that codec's "this row
        // continues" comes from a LAG over the previous row, so the
        // first row of a batch cannot see the last row of the previous
        // one — without the carried flag, every record spanning a
        // micro-batch boundary would split there (and the seam row,
        // re-classified as a record start, could even dead-letter),
        // diverging from the batch pipeline. Only what=next has the
        // lag; grok/json/what=previous use pure per-row predicates.
        val seamBelongs: Option[org.apache.spark.sql.Column] = codec match {
          case Pipeline.MultilineCodec(mc) if mc.what == "next" =>
            val m = col("text").rlike(mc.pattern)
            Some(if (mc.negate) !m else m)
          case _ => None
        }
        // apply carry-in: headers stick across batches; session ids
        // continue from the running record-start count. Both sides hash
        // on conv_id (the carry is one row per conv — at scale this is
        // the same shuffle the batch pipeline's prefix scan already pays)
        val carried = routed
          .join(prev, Seq("conv_id"), "left")
          .withColumn("header",
            coalesce(col("header"), col("carry_header")))
          .withColumn("header_fields_carried",
            coalesce(col("header_fields_carried"), col("carry_fields")))
        val sessioned = seamBelongs match {
          case None => carried
            .withColumn("session_id",
              col("session_id") + coalesce(col("carry_sessions"), lit(0L)))
          case Some(_) =>
            // the conv's first in-order row this batch (computed from
            // the already-cached raw batch — no pipeline re-derivation)
            val firstIdx = flagged.filter(!isLate)
              .groupBy(col("conv_id"))
              .agg(min(col("turn_idx")).as("_first_idx"))
            val seamConv = coalesce(col("carry_prev_belongs"), lit(false))
            val seamRow = seamConv && col("turn_idx") === col("_first_idx")
            carried.join(firstIdx, Seq("conv_id"), "left")
              // the seam row CONTINUES the previous batch's record: it
              // was counted as a start within this batch (its lag saw
              // nothing), so flip it, re-route it under the corrected
              // flag, and shift the conv's session ids down by the one
              // start it no longer contributes
              .withColumn("is_continuation",
                col("is_continuation") || seamRow)
              .withColumn("sink",
                when(seamRow, Route.sinkExpr(excludePattern))
                  .otherwise(col("sink")))
              .withColumn("session_id",
                col("session_id") + coalesce(col("carry_sessions"), lit(0L))
                  - when(seamConv, lit(1L)).otherwise(lit(0L)))
              .drop("_first_idx")
        }
        val adjusted = sessioned
          .drop("carry_header", "carry_fields", "carry_sessions",
            "carry_max_idx", "carry_prev_belongs")
          .cache()
        // cross-batch dedup (opt-in): same invariant as the batch
        // pipeline's dedupAcrossCycles — rows whose fingerprint an
        // EARLIER batch delivered to a content sink re-route to the
        // `duplicate` sink. The strictly-before snapshot read makes a
        // retried batch route identically to its first attempt.
        // ONE strictly-before snapshot read serves both the re-route
        // join and the snapshot-out union (the seen-set grows with
        // corpus cardinality — scanning it twice per batch is waste)
        val seenFps =
          if (dedupAcrossBatches)
            // cached: the re-route join and the snapshot-out union both
            // materialize it, and the seen-set grows with corpus
            // cardinality — two physical scans would double the store's
            // per-batch read cost
            Some(StreamFingerprints.read(sess, sinkRoot, batchId).cache())
          else None
        val published = seenFps match {
          case None => adjusted
          // keepFp: the join's hash column is reused by the
          // snapshot-out below; dropped before the sink write
          case Some(seen) => graft.ops.Dedup.reRouteSeen(
            adjusted, seen, Route.contentSinks, Route.duplicateSink,
            keepFp = true).cache()
        }
        // per-batch dir + overwrite => a retried micro-batch republishes
        // the same directory idempotently (no duplicate rows), the same
        // discipline as the batch pipeline's staged publish (Sinks).
        published.drop(graft.ops.Dedup.fpColName)
          .repartition(col("conv_id"))
          .sortWithinPartitions(col("sink"), col("conv_id"), col("turn_idx"))
          .write.mode("overwrite").partitionBy("sink")
          .parquet(s"$sinkRoot/stream/batch=$batchId")
        // fp snapshot-out: previous seen-set plus THIS batch's content
        // fps (duplicate-sink rows are already in the previous set by
        // construction; distinct bounds the snapshot by corpus
        // cardinality)
        seenFps.foreach { seen =>
          val newFps = published
            .filter(col("sink").isin(Route.contentSinks: _*))
            .select(col(graft.ops.Dedup.fpColName).as("fp"))
          StreamFingerprints.write(
            seen.unionByName(newFps).distinct(), sinkRoot, batchId)
        }
        // carry-out: the conv's state AT ITS LAST ROW of this batch
        // (header/session are running values, so max_by(., turn_idx) is
        // the batch-final state), upserted over the previous snapshot
        val batchCarry = adjusted.groupBy(col("conv_id"))
          .agg(
            max_by(col("header"), col("turn_idx")).as("carry_header"),
            max_by(col("header_fields_carried"), col("turn_idx"))
              .as("carry_fields"),
            max_by(col("session_id"), col("turn_idx")).as("carry_sessions"),
            // the ordering guard's reference point: only in-order rows
            // reach here, so this max strictly advances per conversation
            max(col("turn_idx")).as("carry_max_idx"),
            // the what=next seam flag: did the conv's LAST row belong?
            seamBelongs
              .map(b => max_by(b, col("turn_idx")))
              .getOrElse(lit(false)).as("carry_prev_belongs"))
        val merged = prev.join(batchCarry, Seq("conv_id"), "left_anti")
          .unionByName(batchCarry)
        Carry.write(merged, sinkRoot, batchId)
        if (dedupAcrossBatches) published.unpersist()
        seenFps.foreach(_.unpersist())
        adjusted.unpersist()
        prev.unpersist()
        flagged.unpersist()
        ()
      }
      .start()
  }

  /** Pure-streaming per-sink hourly counts with a 3-second event-time
    * watermark (the CUTOFF analog): late rows within 3s still update
    * their window; older rows are dropped by the engine exactly like
    * the reference's cutoff defers in-flight files (s3.rb:153-154).
    * Routing here uses only stateless column expressions (grok parse +
    * route predicate), which streaming supports natively.
    */
  def streamingAggregates(turns: DataFrame, excludePattern: String = ""): DataFrame = {
    val parsed = Parse.parseColumns(turns)
    val routed = Route(parsed, excludePattern)
    routed
      .withWatermark("ts", "3 seconds")
      .groupBy(col("sink"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("sink"), col("window.start").as("hour_start"),
        col("n_turns"))
  }

  /** Keyed per-conversation state across micro-batches. */
  object StatefulHeaders {

    case class HeaderState(headerVersion: String, maxTurnIdx: Int)

    case class Stamped(conv_id: String, turn_idx: Int, role: String,
        text: String, tool: String, ts: Timestamp, header: String,
        late: Boolean)

    /** P5 as genuine streaming state: the last seen `#Version:` value per
      * conversation is carried in [[GroupState]] and stamped onto every
      * later turn — across micro-batch boundaries, which the batch window
      * cannot see. Within a batch, the group is sorted by turn_idx (the
      * stable-ordering invariant) so propagation order matches the
      * reference's serial file read.
      *
      * ORDERING GUARD (the Carry path's quarantine discipline, applied
      * to keyed state): a row whose turn_idx does not exceed the
      * conversation's committed max is an out-of-order backfill. Its
      * true header context predates the carried state, so it is
      * emitted with `late = true` — the caller routes it to quarantine
      * exactly like the foreachBatch path's stream/_violations — and
      * it NEVER touches the state: a late header row must not regress
      * the carried version for rows that legitimately follow it.
      *
      * The update function is pure (no clocks), so replays after a
      * checkpoint recovery produce identical output.
      */
    def propagate(turns: org.apache.spark.sql.Dataset[Turn]):
        org.apache.spark.sql.Dataset[Stamped] = {
      import turns.sparkSession.implicits._
      val hdrPattern = Parse.grokDictionary("HEADER_VERSION")
      turns
        .groupByKey(_.conv_id)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout())(
          (convId: String, it: Iterator[Turn], state: GroupState[HeaderState]) => {
            val hdrRe = java.util.regex.Pattern.compile(hdrPattern)
            var st = state.getOption.getOrElse(HeaderState(null, -1))
            val committedMax = st.maxTurnIdx // frozen at batch start
            val out = it.toSeq.sortBy(_.turn_idx).map { t =>
              val late = t.turn_idx <= committedMax
              if (!late) {
                val m = hdrRe.matcher(t.text)
                if (m.matches()) st = HeaderState(m.group(1), t.turn_idx)
                else if (t.turn_idx > st.maxTurnIdx)
                  st = st.copy(maxTurnIdx = t.turn_idx)
              }
              Stamped(t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts,
                if (late) null else st.headerVersion, late)
            }
            state.update(st)
            out.iterator
          })
    }
  }
}
