package graft

import org.apache.spark.sql.functions._

/** Measures what pair-set materialization buys: the d18/d19-class
  * consumers (cluster resolution; curated-corpus census) timed when
  * each RE-DERIVES the MinHash-LSH pair set (the standalone-query
  * shape round 4 shipped) vs when both consume ONE persisted pair
  * table (`Dedup.writePairs`/`readPairs` — the production shape).
  * Prints one JSON line; run with SPARK_GRAFT_SF_DIR like graft.Bench.
  */
object PairReuseBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchPipeline.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def derivePairs() = Dedup.lshCandidatePairs(
      Dedup.lshBands(
        Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8),
        "doc_id", 8, 2), "doc_id")

    // JIT/codegen warmup on the shared subtree
    derivePairs().count()

    // --- the round-4 shape: each consumer re-derives the pair set ---
    val (_, tResolveDerive) = timed {
      Dedup.resolveClusters(derivePairs()).count()
    }
    val (_, tCuratedDerive) = timed {
      Dedup.dropNearDups(docs, "doc_id", derivePairs())
        .groupBy(col("source")).count().collect()
    }

    // --- the production shape: derive+persist ONCE, consume twice ---
    val root = s"/root/repo/target/pairbench_${System.nanoTime()}"
    val (nPairs, tWrite) = timed {
      Dedup.writePairs(derivePairs(), root, "docs", "b1")
      spark.read.parquet(s"$root/_pairs/docs/batch=b1").count()
    }
    val pairs = Dedup.readPairs(spark, root, "docs", Set("b1")).get
    val (_, tResolveP) = timed { Dedup.resolveClusters(pairs).count() }
    val (_, tCuratedP) = timed {
      Dedup.dropNearDups(docs, "doc_id", pairs)
        .groupBy(col("source")).count().collect()
    }

    println(s"""{"sf":"$sfDir","n_pairs":$nPairs,""" +
      s""""rederive":{"resolve":$tResolveDerive,"curated":$tCuratedDerive,""" +
      s""""total":${tResolveDerive + tCuratedDerive}},""" +
      s""""persisted":{"write_once":$tWrite,"resolve":$tResolveP,""" +
      s""""curated":$tCuratedP,""" +
      s""""total":${tWrite + tResolveP + tCuratedP}}}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
