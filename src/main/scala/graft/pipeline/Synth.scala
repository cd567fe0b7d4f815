package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic transcript generator (FIXTURES.md §A).
  *
  * The reference's test inputs are golden fixture files
  * (reference: spec/fixtures/); ours is a seeded generator so any scale
  * can be produced on demand with identical content for a given
  * (seed, nConvs). Generation is distributed — `spark.range` over
  * conversation ids, one deterministic RNG per conversation keyed by
  * (seed, convId) — so the output is invariant to partitioning and
  * parallelism (a correctness requirement for the N-vs-4N scaling bench).
  *
  * Content deliberately exercises every parse path:
  *  - grok-conformant lines `"<ISO8601> <LEVEL> [<role>] <body>"` (P1)
  *  - `#Version:` / `#Fields:` header turns to be consumed + propagated
  *    (P4/P5 analog of spec/fixtures/cloudfront.log)
  *  - continuation lines beginning with whitespace (multiline codec
  *    analog, spec/fixtures/multiline.log)
  *  - ~0.5% non-conformant garbage (dead-letter path, the "skip broken
  *    file without crashing" semantic, s3.rb:292-301)
  *  - ~1% lines carrying U+FFFD replacement chars (invalid-UTF-8 analog,
  *    spec/fixtures/invalid_utf8.gbk.log; s3.rb:230-233)
  *  - Zipf-ish conversation-size skew: a handful of "hot" conversations
  *    are orders of magnitude longer than the median, to exercise salting.
  */
object Synth {

  val baseEpochMs: Long = 1735689600000L // 2025-01-01T00:00:00Z

  private val words: Array[String] = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "the", "a", "of",
    "and", "request", "response", "retry", "latency", "token")

  /** Number of turns in conversation `convIdx` — deterministic,
    * heavy-tailed. Conversation 0 of every 1000-block is "hot".
    */
  def convSize(seed: Long, convIdx: Long): Int = {
    val rng = new java.util.Random(seed * 1000003L + convIdx * 7919L)
    if (convIdx % 1000 == 0) 2000 + rng.nextInt(1000) // hot conversation
    else 2 + rng.nextInt(29)
  }

  def isoTs(ms: Long): String = {
    val i = java.time.Instant.ofEpochMilli(ms)
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(i)
  }

  /** All turns of one conversation. Pure function of (seed, convIdx). */
  def genConversation(seed: Long, convIdx: Long): Seq[Turn] = {
    val rng = new java.util.Random(seed * 998244353L + convIdx)
    val n = convSize(seed, convIdx)
    val convId = f"conv-$convIdx%08d"
    val convStartMs = baseEpochMs + (convIdx % 86400L) * 1000L * 60L
    val hasHeader = rng.nextInt(5) == 0 // ~20% of convs carry headers
    var ts = convStartMs
    (0 until n).map { i =>
      ts += 500L + rng.nextInt(5000)
      val role = {
        val r = rng.nextInt(100)
        if (r < 40) "user" else if (r < 80) "assistant"
        else if (r < 95) "tool" else "system"
      }
      val level = Schema.levels(rng.nextInt(Schema.levels.length))
      val nWords = 3 + rng.nextInt(12)
      val body0 = Seq.fill(nWords)(words(rng.nextInt(words.length)))
        .mkString(" ")
      val toolName =
        if (role == "tool") Schema.toolNames(rng.nextInt(Schema.toolNames.length))
        else null
      val marker =
        if (toolName != null) s" <tool:$toolName arg=k${rng.nextInt(10)}>"
        else if (rng.nextInt(20) == 0) // ~5% non-tool turns also mention one
          s" <tool:${Schema.toolNames(rng.nextInt(Schema.toolNames.length))} arg=x>"
        else ""
      val fuzz = rng.nextInt(1000)
      val text =
        if (hasHeader && i == 0) "#Version: 1.0"
        else if (hasHeader && i == 1) "#Fields: ts level role body"
        else if (fuzz < 5) s"@@garbage ${body0.take(20)}" // dead-letter
        else if (fuzz < 55 && i > 1) s"    continued: $body0" // multiline
        else {
          val repl = if (fuzz >= 55 && fuzz < 65) "�" else ""
          s"${isoTs(ts)} $level [$role] $body0$repl$marker"
        }
      Turn(convId, i, role, text, toolName, new Timestamp(ts))
    }
  }

  /** Distributed generation of `nConvs` conversations. */
  def turns(spark: SparkSession, seed: Long, nConvs: Long): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0L, nConvs, 1L, spark.sparkContext.defaultParallelism)
      .flatMap(convIdx => genConversation(seed, convIdx))
  }

  /** Write a partitioned transcript table (partition column `day` derived
    * from ts — the prefix-pruning analog, SURVEY.md §2.1 S2). Returns the
    * total row count.
    */
  def writeTable(spark: SparkSession, path: String, seed: Long,
      nConvs: Long): Long = {
    import org.apache.spark.sql.functions._
    val ds = turns(spark, seed, nConvs)
    // repartition by day before the partitioned write: without it every
    // generator task writes a sliver into every day dir (days x tasks
    // small files), and scan setup cost dominates downstream reads.
    val df = ds.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("day"))
    df.write.mode("overwrite").partitionBy("day").parquet(path)
    spark.read.parquet(path).count()
  }
}
