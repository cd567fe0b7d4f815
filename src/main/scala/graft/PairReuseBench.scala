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

    // --- incremental LSH, production shape vs standalone re-derive ---
    // A new ingest batch (the top 10% of doc ids) arrives against a
    // standing corpus. The d21 STANDALONE query re-shingles both sides
    // by oracle necessity; the production path keeps the corpus's band
    // table persisted (writeBands at index-build time — not on the
    // incremental clock) and pays only: shingle the NEW batch + one
    // (band, sig) join. This measures exactly that delta.
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cut = maxId - maxId / 10
    val oldDocs = docs.filter(col("doc_id") < cut)
    val newDocs = docs.filter(col("doc_id") >= cut)
    def bandsOf(df: org.apache.spark.sql.DataFrame) = Dedup.lshBands(
      Dedup.minhashSignatures(df, "doc_id", "text", 3, 8), "doc_id", 8, 2)
    Dedup.writeBands(bandsOf(oldDocs), root, "docs", "b1", "doc_id")
    // dedupRows = false: the incremental consumer is set-semantic, so
    // the read-side distinct would add a full exchange of the stored
    // band table for nothing (the PlanSpec stored-side pin)
    val stored = Dedup.readBands(spark, root, "docs", Set("b1"),
      dedupRows = false).get
    val (nInc, tIncStored) = timed {
      Dedup.incrementalLshPairs(stored, bandsOf(newDocs), "doc_id").count()
    }
    // the from-scratch equivalent: full-corpus derivation restricted to
    // new-involving pairs (what d21 times standalone)
    val (_, tIncFull) = timed {
      val p = derivePairs()
      val newIds = newDocs.select(col("doc_id").as("id_a"))
      p.join(newIds, Seq("id_a"), "left_semi")
        .unionByName(p.join(newIds.withColumnRenamed("id_a", "id_b"),
          Seq("id_b"), "left_semi").select(col("id_a"), col("id_b")))
        .distinct().count()
    }

    println(s"""{"sf":"$sfDir","n_pairs":$nPairs,""" +
      s""""rederive":{"resolve":$tResolveDerive,"curated":$tCuratedDerive,""" +
      s""""total":${tResolveDerive + tCuratedDerive}},""" +
      s""""persisted":{"write_once":$tWrite,"resolve":$tResolveP,""" +
      s""""curated":$tCuratedP,""" +
      s""""total":${tWrite + tResolveP + tCuratedP}},""" +
      s""""incremental_lsh":{"n_new_pairs":$nInc,""" +
      s""""stored_bands":$tIncStored,"full_rederive":$tIncFull}}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
