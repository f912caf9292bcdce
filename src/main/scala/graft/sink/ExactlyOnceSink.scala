package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent exactly-once file sink with per-partition commit lineage
  * (SURVEY.md §7.4).
  *
  * The reference achieves exactly-once with Flink's FileSink two-phase
  * commit driven by checkpoints (reference sink/S3Sink.scala:151
  * `OnCheckpointRollingPolicy`; main.scala:251 EXACTLY_ONCE). The Spark
  * recast: inside `foreachBatch`, each micro-batch writes its output under a
  * `batch=<batchId>` directory with overwrite semantics, then atomically
  * publishes a manifest file `_manifest/batch-<id>.json` (temp + rename).
  * Readers only see manifest-listed directories, so:
  *
  *   - crash BEFORE manifest rename → directory is invisible; on restart
  *     Structured Streaming replays the same batchId with the same input
  *     files (offset WAL) and the overwrite rewrites it byte-equivalently;
  *   - crash AFTER rename → `isCommitted` short-circuits the replay (no
  *     duplicate output).
  *
  * The manifest carries per-partition lineage: row counts and [minLsn,
  * maxLsn] per time-bucket partition — the per-partition offset lineage the
  * north rule requires, and enough to audit gaps/overlaps across batches.
  *
  * Scale: the data write is narrow (no shuffle); the lineage aggregation
  * groups by the handful of output partitions of one micro-batch (bounded
  * by maxFilesPerTrigger), so the driver-side collect is a few rows per
  * batch regardless of total data size.
  */
final class ExactlyOnceSink(spark: SparkSession, outDir: String) extends Serializable {

  private def fs: FileSystem =
    FileSystem.get(new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)

  private def manifestPath(batchId: Long) = new Path(f"$outDir/_manifest/batch-$batchId%09d.json")

  def isCommitted(batchId: Long): Boolean = fs.exists(manifestPath(batchId))

  def committedBatchIds: Seq[Long] = {
    val dir = new Path(s"$outDir/_manifest")
    if (!fs.exists(dir)) Seq.empty
    else
      fs.globStatus(new Path(s"$outDir/_manifest/batch-*.json"))
        .map(_.getPath.getName.stripPrefix("batch-").stripSuffix(".json").toLong)
        .sorted.toSeq
  }

  /** Write one section (events / errors / schema_changes) of a batch.
    * Time-bucketed partition layout mirrors the reference's
    * DateTimeBucketAssigner dirs (sink/S3Sink.scala:108-138).
    */
  def writeSection(section: String, batchId: Long, df: DataFrame,
      timeBucketCol: Option[String] = None): Unit = {
    val dir = s"$outDir/$section/batch=$batchId"
    timeBucketCol match {
      case Some(tsCol) =>
        df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
          .withColumn("p_hour", date_format(col(tsCol), "HH"))
          .write.mode("overwrite").partitionBy("p_date", "p_hour").parquet(dir)
      case None =>
        df.write.mode("overwrite").parquet(dir)
    }
  }

  /** Atomically publish the batch: lineage rows (one per partition) are
    * computed by the caller; rename makes the commit visible.
    */
  def commit(batchId: Long, lineage: Seq[(String, Long, Long, Long)]): Unit = {
    val tmp = new Path(f"$outDir/_manifest/.tmp-batch-$batchId%09d.json")
    val dst = manifestPath(batchId)
    fs.mkdirs(dst.getParent)
    val body = lineage
      .map { case (part, rows, minLsn, maxLsn) =>
        s"""{"batchId":$batchId,"partition":"$part","rowCount":$rows,"minLsn":$minLsn,"maxLsn":$maxLsn}"""
      }
      .mkString("\n")
    val out = fs.create(tmp, true)
    out.write(body.getBytes("UTF-8")); out.close()
    if (!fs.rename(tmp, dst)) throw new java.io.IOException(s"manifest rename failed for batch $batchId")
  }

  /** Per-partition lineage of a batch's events: (partition, rows, minLsn, maxLsn). */
  def lineageOf(df: DataFrame, tsCol: String): Seq[(String, Long, Long, Long)] = {
    df.groupBy(date_format(col(tsCol), "yyyy-MM-dd/HH").as("part"))
      .agg(count(lit(1)).as("rows"),
        coalesce(min(col("source.lsn")), lit(-1L)).as("minLsn"),
        coalesce(max(col("source.lsn")), lit(-1L)).as("maxLsn"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  /** Committed view of a section: only manifest-listed batch dirs. */
  def readCommitted(section: String): Option[DataFrame] = {
    val ids = committedBatchIds
    val dirs = ids.map(id => s"$outDir/$section/batch=$id")
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", s"$outDir/$section").parquet(dirs: _*))
  }

  /** The lineage manifest as a DataFrame (metrics / audits). */
  def readManifest(): Option[DataFrame] = {
    if (committedBatchIds.isEmpty) None
    else Some(spark.read.json(s"$outDir/_manifest/batch-*.json"))
  }
}
