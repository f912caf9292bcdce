package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings this engine assumes everywhere:
  * UTC, AQE on (skew-join handling at scale), shuffle partitions sized to
  * the core count (not the 200 default, which is wrong for local mode and
  * would be tuned per-cluster in production).
  */
object GraftSession {

  /** Multi-executor local cluster: `numExecutors` SEPARATE executor JVMs
    * (own heap, own GC) × `coresPerExecutor` — the faithful emulation of an
    * N-executor Spark deployment on one box (local[k] shares one JVM and
    * one garbage collector across all "executors"). Requires SPARK_HOME
    * (worker processes launch from the distribution) — /opt/spark here.
    */
  def cluster(numExecutors: Int, coresPerExecutor: Int, memMb: Int,
      appName: String = "graft"): SparkSession = {
    val appCp = getClass.getProtectionDomain.getCodeSource.getLocation.getPath
    val spark = SparkSession
      .builder()
      .master(s"local-cluster[$numExecutors,$coresPerExecutor,$memMb]")
      .appName(appName)
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.executor.extraClassPath", appCp)
      .config("spark.sql.shuffle.partitions", (numExecutors * coresPerExecutor).toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // same join-strategy stance as local() — see the comment there
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark
  }

  /** Parquet codec for everything this engine writes. Overridable via
    * `SPARK_GRAFT_PARQUET_CODEC` (snappy | zstd | lz4 | gzip |
    * uncompressed) — the write stage dominates CDC replay (per-rep stage
    * decomposition: sink_write ≈ 80 % of addBatch), so codec choice is a
    * first-order deployment knob: cheaper codecs buy replay throughput,
    * heavier ones buy storage.
    */
  private def parquetCodec: Option[String] = sys.env.get("SPARK_GRAFT_PARQUET_CODEC")

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val builder0 = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let the planner choose shuffled-hash join when its size conditions
      // are met (guide §3.1/§9): skips the per-partition sorts of
      // sort-merge; parallelism-independent (a per-partition strategy, with
      // the planner's build-side size guard + AQE). A/B at sf0.1 (min-of-4,
      // same window): q11 1.38→1.34, q22 2.31→2.25, q60 1.67→1.56.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      )
      // pairs with the sink's SPARK_GRAFT_SINK_NOSORT A/B: concurrent
      // dynamic-partition writers make the pre-write sort skippable
      .config("spark.sql.maxConcurrentOutputFileWriters",
        if (sys.env.get("SPARK_GRAFT_SINK_NOSORT").contains("1")) "128" else "0")
    val spark = parquetCodec
      .fold(builder0)(c => builder0.config("spark.sql.parquet.compression.codec", c))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // getOrCreate may return a pre-existing session built without the
    // extensions config — the imperative path is idempotent either way
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark
  }
}
