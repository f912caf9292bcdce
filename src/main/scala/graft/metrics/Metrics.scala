package graft.metrics

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-batch streaming metrics (≙ reference CDCMonitor / MetricsCollector,
  * reference monitoring/CDCMonitor.scala:15-85 — but derived from Spark's
  * StreamingQueryProgress instead of a mutable singleton, which the
  * reference itself concedes is wrong under parallelism > 1; SURVEY.md §7.5).
  *
  * Attach once per session; progress events arrive on the listener bus
  * (no data-plane cost). `summary()` gives cumulative counts; `events`
  * retains the per-batch history for lineage-vs-progress audits.
  */
final class GraftQueryListener extends StreamingQueryListener {

  final case class BatchMetrics(queryName: String, batchId: Long, numInputRows: Long,
      inputRowsPerSecond: Double, processedRowsPerSecond: Double,
      durationMs: Long, watermark: String)

  val events = new ConcurrentLinkedQueue[BatchMetrics]()

  @volatile var started = 0
  @volatile var terminated = 0
  @volatile var errors = 0

  override def onQueryStarted(e: QueryStartedEvent): Unit = started += 1

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    events.add(BatchMetrics(
      Option(p.name).getOrElse(""), p.batchId, p.numInputRows,
      p.inputRowsPerSecond, p.processedRowsPerSecond,
      p.batchDuration, Option(p.eventTime.get("watermark")).getOrElse("")))
    ()
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    terminated += 1
    if (e.exception.isDefined) errors += 1
  }

  def totalRows: Long = {
    var s = 0L
    events.forEach(b => s += b.numInputRows)
    s
  }

  def summary(): String = {
    val n = events.size()
    f"batches=$n rows=$totalRows started=$started terminated=$terminated errors=$errors"
  }
}

object Metrics {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): GraftQueryListener = {
    val l = new GraftQueryListener
    spark.streams.addListener(l)
    l
  }
}

/** Per-event source-latency monitor (≙ reference
  * monitoring/CDCMonitor.scala:28-30: warn when now − source.ts_ms exceeds
  * 10 s). The reference logs per event from inside the data plane; here the
  * check is ONE aggregate over the already-cached micro-batch (max / avg
  * latency + late-event count), so the hot path stays codegen'd and the
  * alert cost is independent of batch size.
  */
object LatencyMonitor {

  final case class LatencyStats(batchId: Long, maxLatencyMs: Long,
      avgLatencyMs: Double, lateEvents: Long, events: Long,
      pipeline: String = "default")

  /** Reference threshold: 10 s (CDCMonitor.scala:28). */
  val DefaultAlertMs = 10000L

  /** Historical-replay sanity ceiling: the latency alert exists to flag a
    * LIVE stream falling behind; a replay of historical data (backfill,
    * benchmark, savepoint re-run) makes every event vacuously "late" by
    * months, and a warn per micro-batch drowns the very signal the alert is
    * for (BENCH_r03 carried thousands of meaningless 86-billion-ms warns).
    * Batches whose AVERAGE latency exceeds this ceiling are recorded in
    * `history` but neither alert nor warn — one info line per pipeline
    * notes the suppression.
    *
    * CAVEAT — the heuristic cannot distinguish a backfill from a live
    * pipeline that is genuinely >6 h behind (the worst real incident).
    * The `graft.replayMode` system property overrides it explicitly:
    * "true" always suppresses (set it for known backfills/benchmarks),
    * "false" NEVER suppresses — an on-call rule built on `alerts` should
    * run live pipelines with -Dgraft.replayMode=false so a catastrophic
    * lag still pages.
    */
  val HistoricalCutoffMs: Long = 6L * 3600 * 1000

  /** Effective suppression decision: explicit `graft.replayMode` sysprop
    * wins over the avg-latency heuristic. Parsed case-insensitively and
    * LOUD on garbage — an operator who typo'd the pager-safety flag must
    * find out immediately, not during the incident it was meant to catch.
    */
  def suppressAsHistorical(avgLatencyMs: Double, historicalCutoffMs: Long): Boolean =
    sys.props.get("graft.replayMode").map(_.trim.toLowerCase) match {
      case Some("true") => true
      case Some("false") => false
      case Some(other) => throw new IllegalArgumentException(
        s"graft.replayMode must be true or false, got '$other'")
      case None => avgLatencyMs > historicalCutoffMs
    }

  private val suppressedPipelines =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // JVM-shared queues; every entry is keyed by `pipeline` so concurrent
  // pipelines in one JVM (tests, multi-stream drivers) can audit their own
  // batches — filter on it, and prefer clear(pipeline) over the global one
  val history = new ConcurrentLinkedQueue[LatencyStats]()
  val alerts = new ConcurrentLinkedQueue[LatencyStats]()

  def clear(): Unit = { history.clear(); alerts.clear(); suppressedPipelines.clear() }

  /** Remove one pipeline's entries without erasing a concurrent one's. */
  def clear(pipeline: String): Unit = {
    history.removeIf(_.pipeline == pipeline)
    alerts.removeIf(_.pipeline == pipeline)
    suppressedPipelines.remove(pipeline)
    ()
  }

  /** Record pre-aggregated batch latency stats (the pipeline folds them
    * into the lineage aggregate — no extra pass) and alert past threshold.
    */
  def record(batchId: Long, maxLatencyMs: Long, avgLatencyMs: Double,
      lateEvents: Long, events: Long, alertMs: Long = DefaultAlertMs,
      pipeline: String = "default",
      historicalCutoffMs: Long = HistoricalCutoffMs): LatencyStats = {
    val st = LatencyStats(batchId, maxLatencyMs, avgLatencyMs, lateEvents, events, pipeline)
    history.add(st)
    if (st.lateEvents > 0) {
      if (suppressAsHistorical(st.avgLatencyMs, historicalCutoffMs)) {
        if (suppressedPipelines.add(pipeline))
          org.apache.log4j.Logger.getLogger(getClass).info(
            f"[latency] pipeline=$pipeline replaying historical data " +
              f"(avg=${st.avgLatencyMs}%.0fms > ${historicalCutoffMs}ms ceiling) — " +
              "live-latency alerts suppressed for this pipeline")
      } else {
        alerts.add(st)
        org.apache.log4j.Logger.getLogger(getClass).warn(
          f"[latency] batch=$batchId ${st.lateEvents} of ${st.events} events over ${alertMs}ms " +
            f"(max=${st.maxLatencyMs}ms avg=${st.avgLatencyMs}%.0fms)")
      }
    }
    st
  }

  /** Aggregate batch latency vs `nowMs` and record (standalone form; the
    * CDC pipeline uses `record` fed from its lineage aggregate instead).
    * `batch` must carry `source.ts_ms`.
    */
  def check(batchId: Long, batch: org.apache.spark.sql.DataFrame,
      alertMs: Long = DefaultAlertMs,
      nowMs: Long = System.currentTimeMillis()): LatencyStats = {
    import org.apache.spark.sql.functions._
    val lat = lit(nowMs) - col("source.ts_ms")
    val r = batch.agg(
      coalesce(max(lat), lit(0L)),
      coalesce(avg(lat), lit(0.0)),
      count(when(lat > alertMs, 1)),
      count(lit(1))).first()
    record(batchId, r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), alertMs)
  }
}
