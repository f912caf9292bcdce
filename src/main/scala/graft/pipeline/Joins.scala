package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream-stream stateful joins over the turn stream (north-rule: assistant
  * tool-calls ⋈ tool responses; the reference has no joins at all —
  * SURVEY.md §2.4 "Joins").
  *
  * Spark executes this as a watermarked symmetric hash join: both sides
  * shuffle on the equi-keys (conv_id, tool); the time-range predicate bounds
  * buffered state, and the watermark evicts rows older than
  * (watermark − horizon). The same expression runs in batch for the oracle.
  *
  * Scale: state per key is bounded by the horizon × per-conversation turn
  * rate. Hot conversations spread over the composite key (conv_id, tool).
  * AQE skew-join handles residual imbalance in the batch/backfill path.
  */
object Joins {

  /** Join each assistant tool-call with its tool response(s) in
    * (call.ts, call.ts + horizon]. `watermark` is required for streaming
    * (state eviction); None gives the identical batch semantics.
    */
  def toolCallResponse(turns: DataFrame, horizon: String = "10 minutes",
      watermark: Option[String] = None): DataFrame = {
    def wm(df: DataFrame): DataFrame = watermark.fold(df)(w => df.withWatermark("ts", w))
    val calls = wm(turns.where(col("role") === "assistant" && col("tool").isNotNull))
      .select(col("conv_id"), col("turn_idx").as("call_idx"),
        col("tool"), col("ts").as("call_ts"))
    val resps = wm(turns.where(col("role") === "tool" && col("tool").isNotNull))
      .select(col("conv_id").as("r_conv_id"), col("turn_idx").as("resp_idx"),
        col("tool").as("r_tool"), col("ts").as("resp_ts"))
    calls.join(
      resps,
      col("conv_id") === col("r_conv_id") && col("tool") === col("r_tool") &&
        col("resp_ts") > col("call_ts") &&
        col("resp_ts") <= col("call_ts") + expr(s"interval $horizon"),
      "inner"
    ).select(col("conv_id"), col("tool"), col("call_idx"), col("resp_idx"),
      col("call_ts"), col("resp_ts"),
      (unix_millis(col("resp_ts")) - unix_millis(col("call_ts"))).as("latency_ms"))
  }

  /** As-of join: every `left` row gets the LATEST `right` row (same key)
    * with `right.ts <= left.ts` (`strict=true` → `<`), or null when no such
    * row exists. The operator the reference family expresses as a temporal/
    * lookup join and Spark has no builtin for.
    *
    * NOT a range join: both sides union into one stream tagged by side,
    * shuffle ONCE on the key, sort within each key by (ts, side, tie), and
    * a running `last(_, ignoreNulls)` carries the most recent right payload
    * forward — O(n log n) per key with O(1) running state, the same shape a
    * 1000-executor sort-merge pass executes. A naive
    * `left ⋈ right ON ts ≤ ts` + argmax would be a quadratic range join on
    * hot keys. Hot-key skew: the per-key sort is the data-imposed floor for
    * as-of semantics; pre-bucket by (key, time-range) when one key exceeds
    * a partition.
    *
    * `tieCol` breaks equal-timestamp ties deterministically on BOTH sides
    * (result is engine-reproducible — the DuckDB oracle mirrors it).
    * Output: every left column plus `matchedAlias`: struct of the matched
    * right row's columns (null struct when unmatched).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, matchedAlias: String = "asof",
      strict: Boolean = false): DataFrame = {
    // left sorts at side=1; right sorts before left (side=0) so an
    // equal-ts right row is visible, or after (side=2) under strict <
    val lSide = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      col(tieCol).as("_tie"), lit(1).as("_side"),
      struct(left.columns.map(col): _*).as("_l"),
      lit(null).cast(right.schema).as("_r"))
    val rSide = right.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      col(tieCol).as("_tie"), lit(if (strict) 2 else 0).as("_side"),
      lit(null).cast(left.schema).as("_l"),
      struct(right.columns.map(col): _*).as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn(matchedAlias, last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_l.*") +: Seq(col(matchedAlias)): _*)
  }
}
