package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.CdcPipeline
import graft.source.{ChangeStreamReader, TranscriptGen}
import graft.source.TranscriptGen.GenConfig

/** Benchmark main. Prints ONE JSON line:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *    "cdc_turns_per_sec":T,"cdc_events":E,"cpus":C}
  *
  * Two parts:
  *   1. the SparkEntry query battery on SPARK_GRAFT_SF_DIR (judge-visible
  *      per-query seconds),
  *   2. the north-rule metric: sustained turns/sec of the snapshot +
  *      incremental CDC replay on a deterministic transcript table
  *      (seed=42, zipf skew), end-to-end through the exactly-once sink.
  *
  * Scaling-efficiency evidence (local[8] vs local[32]) is produced by
  * graft.ScalingBench → BENCH/BASELINE.md (a fresh JVM per parallelism
  * level so executor-thread counts are honest).
  */
object Bench {

  /** Sustained CDC replay throughput. The table layout (file counts, batch
    * boundaries) is FIXED — independent of core count — so two parallelism
    * levels process byte-identical batches and the comparison isolates
    * compute scaling. The table dir is content-addressed by config and
    * shared across runs/levels.
    */
  def cdcThroughput(spark: SparkSession, numConvs: Int, avgTurns: Int,
      workRoot: String, analytics: Boolean = false,
      zipf: Double = 1.1): (Double, Long) = {
    val cfg = GenConfig(numConvs = numConvs, avgTurns = avgTurns, seed = 42L,
      zipf = zipf, changeFiles = 4, changeEventsPerTurn = 0.3,
      malformedFrac = 0.01, schemaChangeFrac = 0.01)
    val tableDir = s"$workRoot/table-$numConvs-$avgTurns-z$zipf"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$tableDir/_done")
    if (!fs.exists(marker)) {
      TranscriptGen.writeTable(spark, cfg, tableDir, filesPerSegment = 32)
      fs.createNewFile(marker)
    }
    val runId = System.nanoTime()
    val streamDir = s"$workRoot/stream-$runId"
    val outDir = s"$workRoot/out-$runId"
    val ckDir = s"$workRoot/ck-$runId"
    ChangeStreamReader.deliverChanges(spark, tableDir, streamDir)
    ChangeStreamReader.spoolSnapshot(spark, tableDir, streamDir, numFiles = 64)
    val n = ChangeStreamReader.batch(spark, streamDir).count()
    val t0 = System.nanoTime()
    val q = CdcPipeline.start(spark, streamDir, outDir, ckDir, maxFilesPerTrigger = 48)
    q.awaitTermination()
    if (analytics) {
      // the full engine pass over the replayed log: CEP state machines,
      // sessionization, stream-stream-equivalent join, LWW materialization —
      // the compute the engine exists to do, all inside the timed window
      val sink = new graft.sink.ExactlyOnceSink(spark, outDir)
      val turns = graft.pipeline.Windows
        .turnsFromEvents(sink.readCommitted("events").get).cache()
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      noop(graft.pipeline.Cep.detect(turns, streaming = false).toDF())
      noop(graft.pipeline.Windows.session(turns, "30 minutes"))
      noop(graft.pipeline.Windows.tumbling(turns, "1 hour"))
      noop(graft.pipeline.Joins.toolCallResponse(turns))
      noop(CdcPipeline.stableOrdered(CdcPipeline.materialize(spark, outDir)).toDF())
      turns.unpersist()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    fs.delete(new org.apache.hadoop.fs.Path(streamDir), true)
    fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
    fs.delete(new org.apache.hadoop.fs.Path(ckDir), true)
    (n / sec, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-bench")

    // warmup: JIT + parquet footers, not recorded
    SparkEntry.queries("q1_agg")(spark, sfDir).count()

    // A failing query must surface as an error, never as a fast time: its
    // entry is dropped from the timings and recorded under "errors" instead.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
          None
      }
    }

    // 50k convs ≈ 1.7M events: large enough that replay throughput measures
    // work, not micro-batch scheduling overhead (at 20k convs the number was
    // overhead-bound and insensitive to core count)
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "50000").toInt
    val benchTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "20").toInt
    val (tps, nEvents) = cdcThroughput(spark, benchConvs, benchTurns, "/tmp/graft-bench")

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","cdc_turns_per_sec":$tps%.0f,"cdc_events":$nEvents,"cpus":$cpus}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(3)
  }
}
