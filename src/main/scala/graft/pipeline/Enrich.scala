package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Enrichment stage: broadcast-hash-join lookups (SURVEY.md §2.3).
  *
  * The reference has no relational joins; enrichment enters via the
  * north star: role -> actor_class and tool -> category lookups. Both
  * dims are tiny (4 / ~10 rows) so they are ALWAYS broadcast — the
  * `broadcast()` hint makes that explicit rather than relying on the
  * autoBroadcastJoinThreshold, and there is no shuffle on the fact side.
  *
  * Left joins, not inner: an unmapped tool ("mystery_tool" in the
  * fixtures) must yield a null category, never row loss — row loss would
  * break the routed-row set-equality invariant.
  */
object Enrich {

  def roleDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Schema.roleDim.toDF("role", "actor_class")
  }

  def toolDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Schema.toolDim.toDF("tool", "tool_category")
  }

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    df.join(broadcast(roleDim(spark)), Seq("role"), "left")
      .join(broadcast(toolDim(spark)), Seq("tool"), "left")
  }
}
