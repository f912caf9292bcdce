package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

/** Debug/observability taps — the Spark recast of the reference's
  * per-event logging/monitoring mappers (reference
  * mappers/CDCMappers.scala:9-81: S3/GCSLoggingMapper logs every event plus
  * its byte size, S3/GCSMonitoringMapper reformats truncated events for a
  * print sink, AllEventsMonitor logs every processed event,
  * LocalSimulationMapper logs a would-write line per event; wired into the
  * job graph at main.scala:408-442).
  *
  * Differences by design (SURVEY.md §2.2): the reference logs EVERY event
  * in the data plane — at the 10^12-turn target that is ~10^12 log lines
  * per mapper, a self-DoS. Here the tap (a) samples (1 line per `everyN`
  * rows per partition) and truncates, (b) stays OUT of the committed
  * pipeline — it is a pass-through wrapper callers opt into for debugging,
  * never part of `CdcPipeline.start` — and (c) counts every row through a
  * Spark accumulator, so the monitoring signal covers every row even where
  * the logging is sampled. Accumulators updated inside a transformation are
  * at-least-once under task retry/speculation (Spark only dedupes them in
  * actions), so on a cluster the count can over-report after a retry —
  * fine for a debug tap; use `Dataset.observe`/the sink lineage where an
  * exact count matters.
  */
object Taps {

  /** Sampled, truncated, pass-through event logging. Returns a DataFrame
    * row-identical to `df`; one log line per `everyN` rows per partition
    * under logger "graft.tap"; every row counted into `counter` if given.
    */
  def tap(df: DataFrame, prefix: String, truncateTo: Int = 200,
      everyN: Long = 1000L, counter: Option[LongAccumulator] = None): DataFrame = {
    require(truncateTo > 0 && everyN > 0, "tap: truncateTo and everyN must be positive")
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      val log = org.apache.log4j.Logger.getLogger("graft.tap")
      var i = 0L
      it.map { r =>
        counter.foreach(_.add(1L))
        if (i % everyN == 0L) {
          val s = r.toString
          val short = if (s.length > truncateTo) s.take(truncateTo) + "..." else s
          log.info(s"[$prefix] $short (${s.length} bytes)")
        }
        i += 1
        r
      }
    }(enc)
  }

  /** ≙ AllEventsMonitor (CDCMappers.scala:69-81): the all-routes observer. */
  def allEvents(df: DataFrame, envMode: String,
      counter: Option[LongAccumulator] = None): DataFrame =
    tap(df, s"ALL ${envMode.toUpperCase} PROCESSED", truncateTo = 100,
      counter = counter)

  /** ≙ S3/GCSMonitoringMapper (CDCMappers.scala:22-27,60-65): the
    * written-to-sink observer, labeled with the sink it shadows.
    */
  def sinkWritten(df: DataFrame, table: String, envMode: String,
      sinkUri: String, counter: Option[LongAccumulator] = None): DataFrame =
    tap(df, s"[$table] ${envMode.toUpperCase}_WRITTEN: $sinkUri", counter = counter)

  /** ≙ LocalSimulationMapper (CDCMappers.scala:32-41): the local-mode
    * would-write simulation line.
    */
  def simulated(df: DataFrame, table: String,
      counter: Option[LongAccumulator] = None): DataFrame =
    tap(df, s"[$table] LOCAL_SIMULATED", counter = counter)
}
