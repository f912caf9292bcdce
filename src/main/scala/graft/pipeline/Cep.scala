package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.PatternMatch

/** Per-conversation CEP state machines over the turn stream, via
  * `flatMapGroupsWithState` keyed by conv_id (north-rule: role-sequence
  * detection + tool-call matching; the reference has no keyed state at all —
  * SURVEY.md §2.4 "Streaming").
  *
  * Design for scale:
  *   - State per key is O(1) + the out-of-order buffer: turns are processed
  *     in dense turn_idx order; arrivals ahead of the contiguous frontier
  *     wait in a small pending map that drains as the gap fills (change
  *     files arrive roughly in order, so the buffer stays tiny).
  *   - Turn text is NOT stored in state — only (idx, role, tool, ts) — so a
  *     10^12-turn run keeps per-conversation state in the tens of bytes.
  *   - Hot conversations are a single key by necessity (pattern order is
  *     per-conversation); the stage's parallelism is #conversations, which
  *     at target scale vastly exceeds cores. Event-time timeout flushes
  *     unanswered tool calls when the watermark passes the horizon.
  *
  * Patterns emitted:
  *   - tool_roundtrip:       assistant(tool=T) … next tool-turn with tool=T
  *   - tool_mismatch:        assistant(tool=T) answered by tool-turn with tool≠T
  *   - unanswered_tool_call: a new tool call opens while one is pending, or
  *                           the event-time horizon expires (streaming only)
  *   - user_repeat:          two consecutive user turns (role-sequence)
  */
object Cep {

  /** Compact per-turn record kept in / passed through state. `ts` stays a
    * Timestamp so the event-time watermark column survives the projection
    * into the typed Dataset (EventTimeTimeout requires it).
    */
  final case class TurnLite(conv_id: String, turn_idx: Int, role: String,
      tool: Option[String], ts: Timestamp) {
    def tsMs: Long = ts.getTime
  }

  final case class OpenCall(idx: Int, tool: String, tsMs: Long)

  final case class CepState(
      nextIdx: Int,
      pending: Map[Int, TurnLite],
      openCall: Option[OpenCall],
      prevRole: Option[String],
      prevIdx: Int,
      prevTsMs: Long
  )

  private def emptyState = CepState(0, Map.empty, None, None, -1, 0L)

  private def mk(conv: String, pattern: String, si: Int, ei: Int, st: Long,
      et: Long, detail: String) =
    PatternMatch(conv, pattern, si, ei, new Timestamp(st), new Timestamp(et), detail)

  /** Advance the machine over one turn (called in dense idx order). */
  private def step(conv: String, t: TurnLite, s: CepState,
      out: scala.collection.mutable.Buffer[PatternMatch]): CepState = {
    var open = s.openCall
    // role-sequence: user → user
    if (s.prevRole.contains("user") && t.role == "user")
      out += mk(conv, "user_repeat", s.prevIdx, t.turn_idx, s.prevTsMs, t.tsMs, "")
    t.role match {
      case "assistant" if t.tool.isDefined =>
        open.foreach(o =>
          out += mk(conv, "unanswered_tool_call", o.idx, t.turn_idx, o.tsMs, t.tsMs, o.tool))
        open = Some(OpenCall(t.turn_idx, t.tool.get, t.tsMs))
      case "tool" =>
        open match {
          case Some(o) =>
            val p = if (t.tool.contains(o.tool)) "tool_roundtrip" else "tool_mismatch"
            out += mk(conv, p, o.idx, t.turn_idx, o.tsMs, t.tsMs, o.tool)
            open = None
          case None => // orphan tool response: ignored
        }
      case _ =>
    }
    s.copy(nextIdx = t.turn_idx + 1, openCall = open,
      prevRole = Some(t.role), prevIdx = t.turn_idx, prevTsMs = t.tsMs)
  }

  /** Arm the event-time timeout while anything is left in state: an open
    * tool call waiting for its response, or a pending buffer waiting behind
    * a turn_idx gap. The timeout must sit strictly above the watermark.
    */
  private def armTimeout(state: GroupState[CepState], s: CepState,
      horizonMs: Long): Unit = {
    val cands =
      s.openCall.map(_.tsMs + horizonMs).toSeq ++
        (if (s.pending.nonEmpty) Seq(s.pending.valuesIterator.map(_.tsMs).min + horizonMs)
         else Nil)
    if (cands.nonEmpty) {
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(cands.min, wm + 1))
    }
  }

  /** Drain buffered turns whose grace period has fully passed: once the
    * watermark exceeds a buffered turn's ts + horizon, its missing
    * predecessor can never legally arrive (per-conversation ts is monotone
    * in turn_idx), so the gap is permanent — advance the frontier past it
    * and process the tail in order. Without this, one lost event (malformed
    * → error route, filtered insert) pins the conversation's pending buffer
    * forever: an unbounded state leak at 10^12 turns.
    */
  private def drainRipePending(conv: String, s0: CepState, wmMs: Long,
      horizonMs: Long, out: scala.collection.mutable.Buffer[PatternMatch]): CepState = {
    // one sort for the whole buffer (a re-sort per gap would be quadratic
    // on a large buffer with many holes)
    val ordered = s0.pending.values.toArray.sortBy(_.turn_idx)
    var s = s0
    var i = 0
    var halted = false
    while (i < ordered.length && !halted) {
      val t = ordered(i)
      if (t.turn_idx < s.nextIdx) i += 1 // stale duplicate below the frontier
      else if (t.turn_idx == s.nextIdx) {
        s = step(conv, t, s, out)
        i += 1
      } else if (t.tsMs + horizonMs <= wmMs) {
        // gap whose grace has fully passed: the frontier is FORCED over a
        // hole — role-sequence adjacency is definitionally broken there, so
        // clear prevRole before stepping or a user_repeat could span a
        // known-missing turn (the lost turn may have been an assistant
        // turn). Tool matching intentionally survives the hole: the
        // operator's contract is "first OBSERVED response".
        s = step(conv, t, s.copy(prevRole = None), out)
        i += 1
      } else halted = true
    }
    s.copy(pending = ordered.drop(i).map(t => t.turn_idx -> t).toMap)
  }

  /** Watermark-driven maintenance shared by BOTH invocation paths: drain
    * permanently-gapped pending turns and expire an open call past its
    * horizon. Running this only on the timeout path starves conversations
    * that receive data every trigger — Spark never fires a timeout for a
    * key that has arrivals, so a continuously-active conversation with one
    * lost turn would pin its pending buffer forever and emit nothing.
    */
  private def ripeMaintenance(conv: String, s0: CepState, wmMs: Long,
      horizonMs: Long, out: scala.collection.mutable.Buffer[PatternMatch]): CepState = {
    var s = drainRipePending(conv, s0, wmMs, horizonMs, out)
    if (s.openCall.exists(_.tsMs + horizonMs <= wmMs)) {
      val o = s.openCall.get
      out += mk(conv, "unanswered_tool_call", o.idx, o.idx, o.tsMs,
        o.tsMs + horizonMs, o.tool)
      s = s.copy(openCall = None)
    }
    s
  }

  private def process(conv: String, it: Iterator[TurnLite],
      state: GroupState[CepState], streaming: Boolean,
      horizonMs: Long): Iterator[PatternMatch] = {
    val out = scala.collection.mutable.Buffer[PatternMatch]()
    if (streaming && state.hasTimedOut) {
      var s = state.getOption.getOrElse(emptyState)
      val wm = state.getCurrentWatermarkMs()
      s = ripeMaintenance(conv, s, wm, horizonMs, out)
      state.update(s)
      armTimeout(state, s, horizonMs)
      return out.iterator
    }
    var s = state.getOption.getOrElse(emptyState)
    // Hot-key fast path: sort the arriving turns once; when they form a
    // dense run from the frontier (the common case — and always true for a
    // whole conversation arriving in one batch), no per-event map churn
    // happens at all. A zipf-hot conversation (~10^6 turns in one group)
    // is bounded by this loop, so its constant factor is the engine's
    // per-key ceiling.
    val arr = it.toArray.sortBy(_.turn_idx)
    var i = 0
    var pending = s.pending
    while (i < arr.length || pending.contains(s.nextIdx)) {
      if (i < arr.length && arr(i).turn_idx == s.nextIdx) {
        s = step(conv, arr(i), s, out)
        i += 1
      } else if (pending.contains(s.nextIdx)) {
        val t = pending(s.nextIdx)
        pending -= s.nextIdx
        s = step(conv, t, s, out)
      } else if (i < arr.length && arr(i).turn_idx < s.nextIdx) {
        i += 1 // stale duplicate below the frontier: already processed
      } else {
        // gap: everything still unprocessed waits in the pending buffer
        while (i < arr.length) { pending += (arr(i).turn_idx -> arr(i)); i += 1 }
      }
    }
    s = s.copy(pending = pending)
    if (!streaming && s.pending.nonEmpty) {
      // batch input is complete: a residual gap is permanent by definition —
      // drain the tail in order so a missing turn_idx can't truncate the
      // conversation's pattern stream (mirrors the streaming timeout drain)
      s = drainRipePending(conv, s, Long.MaxValue, 0L, out)
    }
    if (streaming) {
      // run the watermark maintenance on the DATA path too: a key with
      // arrivals every trigger never times out, so without this a
      // continuously-active conversation could pin a gapped pending buffer
      // (and an expired open call) forever
      s = ripeMaintenance(conv, s, state.getCurrentWatermarkMs(), horizonMs, out)
    }
    state.update(s)
    if (streaming) armTimeout(state, s, horizonMs)
    out.iterator
  }

  /** Run the CEP machine. `turns` must be the r/c turn stream (see
    * Windows.turnsFromEvents). In streaming mode an event-time watermark on
    * `ts` must already be set by the caller for timeout-based flushes.
    */
  def detect(turns: DataFrame, streaming: Boolean,
      horizonMs: Long = 10 * 60 * 1000L): Dataset[PatternMatch] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val lite = turns.select(col("conv_id"), col("turn_idx"), col("role"),
      col("tool"), col("ts")).as[TurnLite]
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    lite
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[CepState, PatternMatch](OutputMode.Append, timeoutConf) {
        (conv, it, state) => process(conv, it, state, streaming, horizonMs)
      }
  }

  /** Batch oracle for tool_roundtrip/tool_mismatch via window functions —
    * used by tests to cross-check the state machine on complete data.
    */
  def batchToolOracle(turns: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val evs = turns
      .where((col("role") === "assistant" && col("tool").isNotNull) || col("role") === "tool")
      .withColumn("nxt_role", lead(col("role"), 1).over(w))
      .withColumn("nxt_tool", lead(col("tool"), 1).over(w))
      .withColumn("nxt_idx", lead(col("turn_idx"), 1).over(w))
      .withColumn("nxt_ts", lead(col("ts"), 1).over(w))
    evs
      .where(col("role") === "assistant" && col("nxt_role") === "tool")
      .select(
        col("conv_id"),
        when(col("nxt_tool") === col("tool"), "tool_roundtrip")
          .otherwise("tool_mismatch").as("pattern"),
        col("turn_idx").as("start_turn"), col("nxt_idx").as("end_turn"),
        col("ts").as("start_ts"), col("nxt_ts").as("end_ts"),
        col("tool").as("detail"))
  }
}
