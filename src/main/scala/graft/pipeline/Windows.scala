package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations with watermarks over the turn stream.
  *
  * The reference has no event-time layer at all (processing-time only,
  * `WatermarkStrategy.noWatermarks()` — reference main.scala:335); these are
  * the north-rule additions (BASELINE.json), built purely from Catalyst
  * built-ins: `window`, `session_window`, `withWatermark` — all of which run
  * identically in batch mode, which is what the oracle tests exploit.
  *
  * Scale notes: every aggregation here shuffles on (window, conv_id) — the
  * composite key spreads a hot conv_id over its windows, and Spark's
  * streaming aggregation does partial (map-side) aggregation before the
  * shuffle, so skew pressure is bounded by windows-per-batch, not by raw
  * turn counts. State eviction is watermark-driven.
  */
object Windows {

  /** Turn stream from the routed data events: the after-image of inserts
    * (and snapshot reads). One narrow select — stays in codegen.
    */
  def turnsFromEvents(events: DataFrame, ops: Seq[String] = Seq("r", "c")): DataFrame =
    events
      .where(col("op").isin(ops: _*) && col("after").isNotNull)
      .select(col("after.*"))

  /** Tumbling window: per-window, per-conversation turn counts + role mix. */
  def tumbling(turns: DataFrame, width: String, watermark: Option[String] = None): DataFrame = {
    val t = watermark.fold(turns)(w => turns.withWatermark("ts", w))
    t.groupBy(window(col("ts"), width).as("win"), col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("n_assistant"),
        sum(when(col("role") === "tool", 1L).otherwise(0L)).as("n_tool"),
        sum(length(col("text"))).as("chars")
      )
      .select(col("win.start").as("window_start"), col("conv_id"),
        col("n_turns"), col("n_assistant"), col("n_tool"), col("chars"))
  }

  /** Sliding window over the whole stream keyed by role. */
  def sliding(turns: DataFrame, width: String, slide: String,
      watermark: Option[String] = None): DataFrame = {
    val t = watermark.fold(turns)(w => turns.withWatermark("ts", w))
    t.groupBy(window(col("ts"), width, slide).as("win"), col("role"))
      .agg(count(lit(1)).as("n_turns"), avg(length(col("text"))).as("avg_chars"))
      .select(col("win.start").as("window_start"), col("role"),
        col("n_turns"), col("avg_chars"))
  }

  /** In-stream replay dedup: `dropDuplicatesWithinWatermark` on the event
    * key (SURVEY.md §2.4). The engine's exactly-once is manifest-based (the
    * sink dedups whole batches); this is the per-EVENT alternative for
    * at-least-once upstreams that can redeliver individual records inside
    * the watermark delay — state is evicted once the watermark passes, so
    * it stays bounded at 10^12 turns.
    */
  def dedupWithinWatermark(turns: DataFrame, keys: Seq[String] = Seq("conv_id", "turn_idx"),
      watermark: String = "30 seconds"): DataFrame =
    turns.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)

  /** Session window: turn-gap sessionization per conversation (gap closes a
    * session). Spark merges overlapping/adjacent per-key sessions in the
    * state store; batch mode computes the identical result.
    */
  def session(turns: DataFrame, gap: String, watermark: Option[String] = None): DataFrame = {
    val t = watermark.fold(turns)(w => turns.withWatermark("ts", w))
    t.groupBy(session_window(col("ts"), gap).as("win"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("win.start").as("session_start"), col("win.end").as("session_end"),
        col("conv_id"), col("n_turns"))
  }
}
