package graft

import org.apache.spark.sql.functions._

/** Round-9 equivalence tool: one md5 per declared query over its fully
  * collected, row-formatted output (queries carry their own ORDER BY).
  * Run before and after an optimization on the same SF dir; identical
  * hashes == identical results. Not part of the driver contract.
  *
  * Usage: runMain graft.QueryHash [outFile] [q1,q2,...]
  */
object QueryHash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.lift(0).getOrElse("/tmp/queryhash.json")
    val spark = BenchPipeline.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val md = java.security.MessageDigest.getInstance("MD5")
    val results = names.sorted.map { n =>
      val h = try {
        val rows = SparkEntry.queries(n)(spark, sfDir).collect()
        val s = rows.map(_.toString).mkString("\n")
        md.reset()
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString +
          s":rows=${rows.length}"
      } catch { case e: Throwable => s"ERROR:${e.getMessage}".take(120) }
      System.err.println(s"[qh] $n $h")
      s""""$n":"$h""""
    }
    val w = new java.io.PrintWriter(out)
    try w.println(results.mkString("{", ",", "}")) finally w.close()
    spark.stop()
  }
}
