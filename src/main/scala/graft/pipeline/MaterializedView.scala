package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Materialized AGGREGATE-VIEW maintenance: fold a changelog's retraction
  * deltas (`Retractions.retractStream`) into an at-rest per-group
  * aggregate table, exactly-once — the end-to-end "dynamic table" a CDC
  * pipeline exists to keep fresh (the reference's changelog feeds exactly
  * this consumer shape; here the whole loop is one engine: changelog →
  * per-key state → deltas → incrementally-folded view).
  *
  * Layout (the scale design, not a convenience):
  *   workDir/data/bucket=B/gen=N/   parquet rows (grp, n_keys, sum_v) —
  *                                  bucket B's full content as of batch N
  *   workDir/_commits/N             atomic commit marker for batch N,
  *                                  listing "B G" per bucket it rewrote
  *
  * Groups shard into `nBuckets` by xxhash64(grp); a micro-batch rewrites
  * ONLY the buckets its deltas touch — per-batch work is
  * O(|touched groups' buckets|), never O(|view|), so a 10^9-group view
  * absorbs a small batch by reading+rewriting a handful of bucket files.
  * The current view is, per bucket, the gen named by the LATEST committed
  * marker; uncommitted gen dirs are invisible by construction.
  *
  * Exactly-once, in write order:
  *   1. net deltas fold per group (all-zero nets dropped — an untouched
  *      bucket is never rewritten);
  *   2. the touched buckets' CURRENT rows (committed gens only) merge
  *      with the nets; groups folding to n_keys == 0 are dropped (a
  *      bucket can legitimately become empty — its marker entry records
  *      that, so read cannot fall back to an older gen and resurrect
  *      dead groups);
  *   3. new gen dirs land under gen=N (a replay overwrites them
  *      byte-identically — the deltas replay deterministically from the
  *      state checkpoint and the fold reads only gens committed < N);
  *   4. the marker for N is created ATOMICALLY — the commit point;
  *   5. superseded gens of the touched buckets are deleted (crash between
  *      4 and 5 leaves harmless stale gens the marker map ignores).
  * A crash anywhere before 4 leaves the view at batch N−1 exactly; the
  * checkpoint replays batch N and every step is idempotent.
  *
  * The marker chain is one tiny file per batch, folded driver-side on
  * read; long-running views should compact markers the way the sink
  * compacts manifests (the chain is the only per-batch growth — data
  * gens are deleted as they are superseded).
  */
final class MaterializedView(spark: SparkSession, workDir: String,
    nBuckets: Int = 64) {
  require(nBuckets >= 1, "materialized view: nBuckets must be >= 1")

  private val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def commitsDir = new Path(workDir, "_commits")
  private def genDir(bucket: Long, gen: Long) =
    new Path(workDir, s"data/bucket=$bucket/gen=$gen")

  val viewSchema: StructType = StructType(Seq(
    StructField("grp", StringType), StructField("n_keys", LongType),
    StructField("sum_v", LongType)))

  def isCommitted(batchId: Long): Boolean =
    fs.exists(new Path(commitsDir, batchId.toString))

  /** (bucket → gen) as of the latest committed batch: markers fold in
    * batch order, later entries superseding earlier ones.
    */
  private def bucketGens(): Map[Long, Long] = {
    if (!fs.exists(commitsDir)) return Map.empty
    val ids = fs.listStatus(commitsDir).toSeq
      .map(_.getPath.getName).flatMap(n => scala.util.Try(n.toLong).toOption)
      .sorted
    ids.foldLeft(Map.empty[Long, Long]) { (m, id) =>
      val text = graft.util.FsText.readText(fs, new Path(commitsDir, id.toString))
      m ++ text.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(b, g) = line.trim.split(" ")
        b.toLong -> g.toLong
      }
    }
  }

  /** The view as of the latest committed batch (empty, schema-stable,
    * when nothing has committed). A recorded bucket whose gen dir is
    * absent is EMPTY as of that gen — not a fallback to older content.
    */
  def read(): DataFrame = {
    val dirs = bucketGens().toSeq
      .map { case (b, g) => genDir(b, g) }
      .filter(fs.exists(_))
      .map(_.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        viewSchema)
    else spark.read.schema(viewSchema).parquet(dirs: _*)
  }

  /** Fold one batch of deltas (columns grp, d_keys, d_sum) into the view.
    * Idempotent per batchId; see class doc for the crash-window argument.
    */
  def applyDeltas(batchId: Long, deltas: DataFrame): Unit = {
    if (isCommitted(batchId)) return
    val bkt = pmod(xxhash64(col("grp")), lit(nBuckets.toLong))
    val net = deltas.groupBy(col("grp"))
      .agg(sum(col("d_keys")).as("n_keys"), sum(col("d_sum")).as("sum_v"))
      .where(col("n_keys") =!= 0 || col("sum_v") =!= 0)
      .withColumn("bucket", bkt)
      .persist()
    try {
      val touched = net.select(col("bucket")).distinct()
        .collect().map(_.getLong(0)).sorted // ≤ nBuckets by construction
      if (touched.nonEmpty) {
        val gens = bucketGens()
        val curDirs = touched
          .flatMap(b => gens.get(b).map(g => genDir(b, g)))
          .filter(fs.exists(_)).map(_.toString)
        val cur =
          if (curDirs.isEmpty)
            spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](), viewSchema)
          else spark.read.schema(viewSchema).parquet(curDirs.toSeq: _*)
        val merged = cur.select(col("grp"), col("n_keys"), col("sum_v"))
          .unionByName(net.select(col("grp"), col("n_keys"), col("sum_v")))
          .groupBy(col("grp"))
          .agg(sum(col("n_keys")).as("n_keys"), sum(col("sum_v")).as("sum_v"))
          .where(col("n_keys") > 0)
          .withColumn("bucket", bkt)
          .persist()
        try {
          // one write job per touched bucket — a replay overwrites
          // byte-identically; untouched buckets are never opened
          touched.foreach { b =>
            merged.where(col("bucket") === b)
              .select(col("grp"), col("n_keys"), col("sum_v"))
              .write.mode("overwrite").parquet(genDir(b, batchId).toString)
          }
          // a bucket whose merged content is EMPTY still commits an entry
          // (parquet leaves a dir with no rows — read yields 0 rows, which
          // is exactly the truth); the MARKER is the atomic commit point
          graft.util.FsText.writeAtomic(fs, new Path(commitsDir, batchId.toString),
            touched.map(b => s"$b $batchId").mkString("\n"))
          // superseded gens die AFTER the commit (crash here = stale-but-
          // invisible dirs, cleaned by the bucket's next rewrite)
          touched.foreach { b =>
            gens.get(b).filter(_ < batchId)
              .foreach(g => fs.delete(genDir(b, g), true))
          }
        } finally { merged.unpersist(); () }
      } else {
        // no net change — still mark the batch done so a replay after a
        // crash here doesn't re-run the (empty) fold
        graft.util.FsText.writeAtomic(fs, new Path(commitsDir, batchId.toString), "")
      }
    } finally { net.unpersist(); () }
  }
}

object MaterializedView {

  /** Start the end-to-end loop: changelog file stream → watermarked
    * retraction deltas → exactly-once bucket-wise view folds. The
    * changelog schema must carry (`keyCol`, `tsCol`, `tieCol`, `opCol`,
    * `groupCol`, `valueCol`) — the `Retractions.changeEvents` contract.
    */
  def start(spark: SparkSession, changesDir: String, schema: StructType,
      workDir: String, ckDir: String, watermark: String = "60 seconds",
      keyCol: String = "user_id", tsCol: String = "ts", tieCol: String = "event_id",
      opCol: String = "op", groupCol: String = "grp", valueCol: String = "v",
      nBuckets: Int = 64, maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val view = new MaterializedView(spark, workDir, nBuckets)
    // parquet changelogs often carry TIMESTAMP_NTZ (the test tables do);
    // watermarks require TIMESTAMP. The session TZ is pinned UTC
    // everywhere, so the cast is the identity on the microsecond line —
    // and it happens BEFORE the watermark, so the event-time metadata
    // lands on the attribute `changeEvents` selects uncast.
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(changesDir)
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
    val deltas = Retractions.retractStream(
      Retractions.changeEvents(stream, keyCol, tsCol, tieCol, opCol,
        groupCol, valueCol))
    deltas.toDF()
      .writeStream
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        view.applyDeltas(batchId, batch)
      }
      .start()
  }
}
