package graft

import graft.metrics.Metrics
import graft.pipeline.CdcPipeline
import graft.source.{ChangeStreamReader, TranscriptGen}
import graft.source.TranscriptGen.GenConfig

/** Listener-based per-batch metrics (≙ reference CDCMonitor, minus the
  * parallelism-unsafe singleton — SURVEY.md §7.5).
  */
class MetricsSpec extends SparkSpec {

  test("listener observes every batch and row of a replay") {
    val tableDir = tmpDir("mtable")
    val streamDir = tmpDir("mstream")
    val cfg = GenConfig(numConvs = 40, avgTurns = 8)
    TranscriptGen.writeTable(spark, cfg, tableDir)
    ChangeStreamReader.deliverChanges(spark, tableDir, streamDir)
    val listener = Metrics.attach(spark)
    try {
      CdcPipeline.runAvailable(spark, tableDir, streamDir, tmpDir("mout"), tmpDir("mck"),
        maxFilesPerTrigger = 3)
      // listener events are delivered asynchronously on the bus — poll
      val expected = ChangeStreamReader.batch(spark, streamDir).count()
      val deadline = System.nanoTime() + 30e9.toLong
      while (listener.totalRows < expected && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(listener.totalRows == expected, listener.summary())
      assert(listener.events.size() > 1, "multiple micro-batches observed")
      assert(listener.errors == 0)
    } finally spark.streams.removeListener(listener)
  }

  test("latency monitor alerts when events exceed the 10s threshold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.metrics.LatencyMonitor.clear()
    val now = System.currentTimeMillis()
    def batch(tsMs: Long) =
      Seq(tsMs).toDF("v").select(struct(col("v").as("ts_ms")).as("source"))
    // fresh event (1s old): no alert
    val ok = graft.metrics.LatencyMonitor.check(1L, batch(now - 1000), nowMs = now)
    assert(ok.lateEvents == 0 && graft.metrics.LatencyMonitor.alerts.isEmpty)
    // stale event (30s old): alert recorded with correct latency
    val bad = graft.metrics.LatencyMonitor.check(2L, batch(now - 30000), nowMs = now)
    assert(bad.lateEvents == 1 && bad.maxLatencyMs == 30000)
    assert(graft.metrics.LatencyMonitor.alerts.size() == 1)
    assert(graft.metrics.LatencyMonitor.history.size() == 2)
  }

  test("latency monitor suppresses alerts on historical replays (sanity ceiling)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.metrics.LatencyMonitor.clear()
    val now = System.currentTimeMillis()
    def batch(tsMs: Long) =
      Seq(tsMs).toDF("v").select(struct(col("v").as("ts_ms")).as("source"))
    // a replayed 2023-era event is months "late" — vacuous for a live-lag
    // alert: recorded in history, NOT alerted (BENCH_r03 alert-storm fix)
    val replay = graft.metrics.LatencyMonitor.check(1L,
      batch(now - 90L * 24 * 3600 * 1000), nowMs = now)
    assert(replay.lateEvents == 1, "stats still computed for the audit trail")
    assert(graft.metrics.LatencyMonitor.alerts.isEmpty,
      "historical replay must not raise live-latency alerts")
    assert(graft.metrics.LatencyMonitor.history.size() == 1)
    // a genuinely-lagging live batch (30 s) still alerts after a suppression
    graft.metrics.LatencyMonitor.check(2L, batch(now - 30000), nowMs = now)
    assert(graft.metrics.LatencyMonitor.alerts.size() == 1,
      "live lag below the ceiling must still alert")
    // explicit override beats the heuristic both ways: a live pipeline 7h
    // behind (the worst real incident) must still page when the operator
    // declares it NOT a replay…
    try {
      sys.props("graft.replayMode") = "false"
      graft.metrics.LatencyMonitor.check(3L, batch(now - 7L * 3600 * 1000), nowMs = now)
      assert(graft.metrics.LatencyMonitor.alerts.size() == 2,
        "replayMode=false must alert even past the heuristic ceiling")
      // …and a declared replay stays silent even when latencies look live
      sys.props("graft.replayMode") = "true"
      graft.metrics.LatencyMonitor.check(4L, batch(now - 30000), nowMs = now)
      assert(graft.metrics.LatencyMonitor.alerts.size() == 2,
        "replayMode=true must suppress regardless of latency")
      // a typo'd pager-safety flag fails loudly, never silently heuristic
      sys.props("graft.replayMode") = "nope"
      intercept[IllegalArgumentException](
        graft.metrics.LatencyMonitor.record(5L, 30000, 30000.0, 1, 1))
    } finally { sys.props.remove("graft.replayMode"); () }
  }

  test("debug taps are pass-through observers with exact accumulator counts") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"event-$i", "x" * 300))
      .toDF("id", "kind", "payload")
    val acc = spark.sparkContext.longAccumulator("tap-test")
    val tapped = graft.metrics.Taps.tap(df, "test", truncateTo = 50,
      everyN = 100L, counter = Some(acc))
    // pass-through invariant: rows byte-identical, nothing dropped/reordered
    assertSameRows(tapped, df, "tap pass-through")
    assert(acc.value == 500L, "accumulator counts every row exactly")
    // the named recasts (all-events / sink-written / local-simulated) share
    // the invariant
    val acc2 = spark.sparkContext.longAccumulator("tap-all")
    assertSameRows(graft.metrics.Taps.allEvents(df, "local", Some(acc2)), df)
    assertSameRows(graft.metrics.Taps.sinkWritten(df, "conversations", "dev",
      "s3://bucket/path"), df)
    assertSameRows(graft.metrics.Taps.simulated(df, "conversations"), df)
    assert(acc2.value == 500L)
  }
}
