package graft

import org.apache.spark.sql.functions._

/** Stage-cost decomposition at two parallelism levels: where does the
  * pipeline stop scaling? Usage: runMain graft.ProfileBench [nConvs]
  */
object ProfileBench {
  import graft.pipeline._

  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toLong).getOrElse(240000L)
    val gen = BenchPipeline.session(32)
    val inputPath = BenchPipeline.ensureInput(gen, nConvs)
    gen.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    for (cores <- Seq(8, 32)) {
      val spark = BenchPipeline.session(cores)
      import spark.implicits._
      def read() = spark.read.schema(
          Schema.turnSchema.add("day", org.apache.spark.sql.types.StringType))
        .parquet(inputPath)
      def time(label: String)(f: => Unit): Unit = {
        f // warmup
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[profile] cores=$cores $label best=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
      time("scan_count") { read().count() }
      time("scan_parse_agg") {
        Parse.parseColumns(read())
          .select(sum(when(col("parse_ok"), 1L).otherwise(0L)),
            sum(when(col("is_header"), 1L).otherwise(0L)),
            sum(size(col("tool_calls")))).collect()
      }
      time("parse_route_enrich_agg") {
        Enrich(Route(Parse.parseColumns(read()), "token"))
          .groupBy(col("sink"), col("role"), col("tool_category"))
          .agg(count(lit(1))).collect()
      }
      time("full_pipeline") {
        BenchPipeline.timePipeline(spark, inputPath)
      }
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
