package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CdcPipeline, Router}
import graft.sink.ExactlyOnceSink
import graft.source.ChangeStreamReader

/** Ad-hoc profiling main: decomposes CDC replay cost into stages over an
  * existing spooled stream dir. Usage:
  *   runMain graft.ProfileCdc <streamDir>
  */
object ProfileCdc {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val streamDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-profile")
    val df = ChangeStreamReader.batch(spark, streamDir)
    val n = time("count(read)")(df.count())
    println(s"[profile] events=$n cpus=$cpus")
    time("route+enrich only (noop sink)") {
      CdcPipeline.routed(df).write.format("noop").mode("overwrite").save()
    }
    time("routed + unpartitioned parquet write") {
      CdcPipeline.routed(df).write.mode("overwrite").parquet("/tmp/prof-flat")
    }
    time("processBatch (cached route+range write+lineage, pipeline path)") {
      val sink = new ExactlyOnceSink(spark, "/tmp/prof-sink-" + System.nanoTime())
      CdcPipeline.processBatch(sink, df, 0L)
    }
    time("full streaming replay (fresh checkpoint)") {
      val q = CdcPipeline.start(spark, streamDir, "/tmp/prof-out-" + System.nanoTime(),
        "/tmp/prof-ck-" + System.nanoTime(), maxFilesPerTrigger = math.max(cpus, 8))
      q.awaitTermination()
    }
    spark.stop()
  }
}
