package graft

import org.apache.spark.sql.SparkSession

/** Config-variant experiments for the prefix-scan stage collapse at high
  * parallelism. Usage: runMain graft.ExperimentBench [nConvs]
  */
object ExperimentBench {
  import graft.pipeline._

  def sessionWith(cores: Int, extra: Map[String, String]): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-exp-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-bench-scratch")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toLong).getOrElse(240000L)
    val gen = BenchPipeline.session(32)
    val inputPath = BenchPipeline.ensureInput(gen, nConvs)
    gen.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    val variants: Seq[(String, Map[String, String])] = Seq(
      "hinted_join_aqe_on" -> Map("spark.sql.adaptive.enabled" -> "true"))

    for (pass <- 1 to 4; (name, conf) <- variants; cores <- Seq(2, 8, 32)) {
      val spark = sessionWith(cores, conf)
      BenchPipeline.timePipeline(spark, inputPath) // warmup
      val ts = (1 to 3).map { _ =>
        BenchPipeline.timePipeline(spark, inputPath)._2
      }
      System.err.println(f"[exp] $name pass=$pass cores=$cores best=${ts.min}%.3f " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
