package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
