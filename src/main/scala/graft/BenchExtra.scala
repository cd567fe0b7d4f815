package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 optimization harness (guide §1.4): noop-sink isolation of
  * individual declared queries plus sub-stage decomposition of the
  * expensive subtrees (MinHash/LSH, cluster resolution, pipeline).
  * NOT part of the frozen driver contract — `graft.Bench` is the
  * measured artifact; this main exists so per-change evidence in
  * OPTIMIZATION_r09.md can cite isolated numbers and captured plans.
  *
  * Usage: runMain graft.BenchExtra [q1,q2,...|all|stages]
  *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as graft.Bench;
  *   SPARK_GRAFT_PLANS_DIR=/root/repo/plans/r09 SPARK_GRAFT_PLANS_SUFFIX=_before
  *     additionally writes `<query><suffix>.txt` explain("formatted").
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = BenchPipeline.session(cpus.toInt)
    val sel = args.lift(0).getOrElse("all")
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val plansSuffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val plansOnly = sys.env.get("SPARK_GRAFT_PLANS_ONLY").contains("1")

    def timeQuery(name: String,
        fn: (SparkSession, String) => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      if (!plansOnly) {
        noop(fn(spark, sfDir)) // warmup (JIT + codegen)
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          noop(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[extra] $name noop_best=${ts.min}%.3f " +
          s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
      plansDir.foreach { d =>
        val df = fn(spark, sfDir)
        df.count() // materialize -> AQE final plan
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/$name$plansSuffix.txt"), txt)
      }
      spark.sparkContext.setJobDescription(null)
    }

    def timeStage(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[stage] $label best=${ts.min}%.3f " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      spark.sparkContext.setJobDescription(null)
    }

    if (sel == "pipeline") {
      val inputPath = BenchPipeline.ensureInput(spark,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toLong)
      BenchPipeline.timePipeline(spark, inputPath) // warmup
      val runs = (1 to 4).map { _ =>
        BenchPipeline.timePipeline(spark, inputPath)
      }
      val (rows, sec) = runs.minBy(_._2)
      System.err.println(f"[stage] pipeline rows=$rows best=$sec%.3f " +
        f"tput=${rows / sec}%.0f " +
        s"runs=${runs.map(r => f"${r._2}%.2f").mkString(",")}")
    } else if (sel == "stages") {
      import graft.ops.Dedup
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      timeStage("docs_scan") { noop(docs) }
      timeStage("shingle_rows") {
        noop(Dedup.shingleRows(docs, "doc_id", "text", 3))
      }
      timeStage("shingle_md5") {
        noop(Dedup.shingleRows(docs, "doc_id", "text", 3)
          .select(col("doc_id"), md5(col("shingle")).as("h")))
      }
      timeStage("minhash_sigs") {
        noop(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8))
      }
      timeStage("lsh_bands") {
        noop(Dedup.lshBands(
          Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8),
          "doc_id", 8, 2))
      }
      timeStage("lsh_pairs") {
        noop(Dedup.lshCandidatePairs(Dedup.lshBands(
          Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8),
          "doc_id", 8, 2), "doc_id"))
      }
      timeStage("resolve_clusters_from_pairs") {
        val pairs = Dedup.lshCandidatePairs(Dedup.lshBands(
          Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8),
          "doc_id", 8, 2), "doc_id")
        noop(Dedup.resolveClusters(pairs))
      }
      locally {
        val pairs = Dedup.lshCandidatePairs(Dedup.lshBands(
          Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8),
          "doc_id", 8, 2), "doc_id")
        val res = Dedup.resolveClustersIter(pairs)
        val n = res.labels.count()
        System.err.println(s"[stage] resolve_iters=${res.iterations} " +
          s"converged=${res.converged} labels=$n")
        res.release()
      }
    } else {
      val names =
        if (sel == "all") SparkEntry.queries.keys.toSeq.sorted
        else sel.split(",").toSeq
      names.foreach { n => timeQuery(n, SparkEntry.queries(n)) }
    }
    spark.stop()
  }
}
