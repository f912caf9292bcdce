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
}
