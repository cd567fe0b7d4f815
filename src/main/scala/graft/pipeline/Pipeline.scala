package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The canonical operator composition for one pipeline pass:
  *
  *   parseColumns -> Route -> Enrich -> fused prefix scan
  *
  * Ordering rationale (plan quality, not semantics — all four stages
  * commute): routing and enrichment are NARROW column expressions /
  * broadcast joins, so running them before the prefix scan's
  * (conv_id, chunk) repartition means the shuffle is the LAST wide step
  * and Catalyst's column pruning can drop any column a given consumer
  * doesn't use from the shuffle itself. An aggregate-only consumer
  * (metrics, Bench) shuffles ~half the bytes because `text`/`body`
  * are pruned; sink writers still see every column.
  */
object Pipeline {

  def apply(ds: Dataset[Turn], excludePattern: String = "",
      chunkSize: Int = 4096): DataFrame = {
    val parsed = Parse.parseColumns(ds.toDF())
    val routed = Route(parsed, excludePattern)
    val enriched = Enrich(routed)
    PrefixOps.scanBoth(enriched,
      col("header_version"), "header",
      when(col("is_continuation"), lit(0)).otherwise(lit(1)), "session_id",
      chunkSize)
  }
}
