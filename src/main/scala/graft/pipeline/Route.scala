package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate routing — the include/exclude key-filtering + fan-out
  * analog (S7, S13-S16; s3.rb:360-374, backup semantics s3.rb:169-183).
  *
  * Every row gets exactly one `sink` label (the routing function is a
  * total function, so the sinks PARTITION the parsed input — the
  * routed-row set-equality invariant is testable with union/exceptAll):
  *
  *  - `consumed`   — header rows (P4): the reference DROPS `#Version:` /
  *    `#Fields:` rows from the output after folding them into per-file
  *    state (s3.rb:234-236, 266-278). We route them to a `consumed` sink
  *    instead of deleting — same visible output, better lineage.
  *  - `deadletter` — non-conformant lines (the "broken file is logged and
  *    skipped without crashing" semantic, s3.rb:292-301): not parseable,
  *    not a header, not a continuation.
  *  - `excluded`   — text matches the configured exclude_pattern
  *    (s3.rb:76; Java regex dialect, documented difference from Ruby).
  *  - role sinks   — `user` / `assistant` / `tool` / `system` (+ `other`
  *    for unknown roles), the per-key routing analog.
  *
  * Precedence: consumed > deadletter > excluded > role — mirrors the
  * reference's order (metadata classification happens before codec
  * output, s3.rb:234-238; exclusion happens at discovery).
  */
object Route {

  val sinkNames: Seq[String] =
    Seq("user", "assistant", "tool", "system", "other",
      "consumed", "deadletter", "excluded")

  /** The sinks that carry actual conversation CONTENT — the rows
    * cross-cycle dedup screens. Metadata/reject sinks (consumed,
    * deadletter, excluded) are exempt: their rows are routing
    * artifacts, not corpus documents.
    */
  val contentSinks: Seq[String] =
    Seq("user", "assistant", "tool", "system", "other")

  /** Where a cross-cycle duplicate lands (PipelineConfig
    * .dedupAcrossCycles) — a first-class sink dir like every other, so
    * duplicates stay visible, auditable and counted by the seal audit's
    * published-keys side (never silently dropped).
    */
  val duplicateSink: String = "duplicate"

  def sinkExpr(excludePattern: String,
      customRules: Seq[(Column, String)] = Nil): Column = {
    val base =
      when(col("is_header"), lit("consumed"))
        .when(!col("parse_ok") && !col("is_continuation"), lit("deadletter"))
    val withExclude =
      if (excludePattern == null || excludePattern.isEmpty) base
      else base.when(col("text").rlike(excludePattern), lit("excluded"))
    // user-configured rules (the reference's config-driven key routing,
    // s3.rb:38-89): evaluated in order, after the built-in precedence,
    // before the role fallback — still a TOTAL function (the `other`
    // fallback guarantees every row a sink).
    val withCustom = customRules.foldLeft(withExclude) {
      case (acc, (pred, sink)) => acc.when(pred, lit(sink))
    }
    // role sink: the parsed-from-content role (grok_role) is authoritative
    // ONLY where the role column is a known placeholder — null, or the
    // `file` sentinel stamped by raw-file ingest (readAsTurns), where no
    // transport metadata exists and the codec output is all there is
    // (s3.rb:250-264). For transcript tables the metadata column stays
    // authoritative: preferring line content there would let user-authored
    // text that happens to parse as a grok line with a different bracketed
    // role silently reroute the row — a content-spoofable routing path.
    val effRole = when(col("role").isNull || col("role") === "file",
      coalesce(col("grok_role"), col("role"))).otherwise(col("role"))
    withCustom
      .when(effRole.isin("user", "assistant", "tool", "system"), effRole)
      .otherwise(lit("other"))
  }

  def apply(df: DataFrame, excludePattern: String = "",
      customRules: Seq[(Column, String)] = Nil): DataFrame =
    df.withColumn("sink", sinkExpr(excludePattern, customRules))
}
