package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway stage profiler for the d08 MinHash-LSH hotspot. */
object D08Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = BenchPipeline.session(32)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[d08] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("docs.count")(docs.count())
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
    time("shingleRows.count")(sh.count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8)
    time("sigs.count")(sigs.count())
    val sigsC = sigs.cache()
    time("sigs.cache.count")(sigsC.count())
    val bands = Dedup.lshBands(sigsC, "doc_id", 8, 2)
    time("bands(cached sigs).count")(bands.count())
    val buckets = bands.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("n"))
    time("bucket histogram") {
      buckets.groupBy(col("n")).agg(count(lit(1)).as("k"))
        .orderBy(col("n").desc).show(20, false)
    }
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id")
    time("pairs(cached sigs).count")(pairs.count())
    // now the uncached full path, as d08 actually runs it
    val full = Dedup.lshCandidatePairs(
      Dedup.lshBands(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8),
        "doc_id", 8, 2), "doc_id")
    time("full uncached d08.count")(full.count())
    spark.stop()
  }
}
