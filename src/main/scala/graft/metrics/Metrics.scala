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
