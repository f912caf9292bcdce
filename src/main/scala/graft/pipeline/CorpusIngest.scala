package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.TextAnalysis
import graft.sink.ExactlyOnceSink

/** Streaming corpus ingestion: the engine's exactly-once streaming
  * machinery applied to the training-data domain — documents arrive as a
  * file stream, each micro-batch is scrubbed, quality-gated, deduped
  * against the KNOWN corpus (stream-static anti-join) and within the
  * stream (content-hash dedup), then committed atomically through the
  * manifest sink. The two halves of this engine composed: the corpus
  * operators curate, the CDC sink makes it exactly-once and resumable.
  *
  * Envelope mapping (the sink's lineage made MEANINGFUL for documents):
  * `src_table` = the document's source — so the sink's existing partition
  * fan-out becomes per-source corpus directories and
  * `readCommitted("events", table = Some(src))` is a partition-pruned
  * per-source read; lineage lsn = doc_id — so each manifest row records
  * the exact id RANGE each source contributed per batch (the corpus
  * audit/backfill primitive); `p_date` = a caller-fixed ingest date
  * (crawl date in a real deployment) — a fixed literal keeps replays
  * byte-identical, which the sink's idempotent re-commit depends on.
  *
  * Scale: curation is narrow (scrub/quality/hash compute scan-side); the
  * stream-static known-hash join and the in-stream `dropDuplicates` on
  * the content hash shuffle 16-byte hashes. NOTE the in-stream dedup
  * holds one state row per distinct hash forever — documents carry no
  * event time; when they do, swap in
  * `Windows.dedupWithinWatermark`-style bounded state.
  */
object CorpusIngest {

  /** The curation transform alone (engine-neutral, runs identically in
    * batch — the streaming==batch test exploits this): scrub → quality
    * gate → drop known content → content hash.
    */
  def curate(docs: DataFrame, known: DataFrame,
      minQuality: Double = 0.5): DataFrame = {
    val scrubbed = docs.withColumn("text", TextAnalysis.scrub(col("text")))
    val gated = scrubbed
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .where(col("quality") >= minQuality)
    Joins.streamStaticDedup(gated, known)
      .withColumn("content_md5", md5(col("text")))
  }

  /** Map curated documents into the exactly-once sink's envelope (see
    * class doc for why each column is what it is).
    */
  private def envelope(curated: DataFrame, ingestDate: String): DataFrame =
    curated
      .withColumn("route", lit("data"))
      .withColumn("src_table", col("source"))
      .withColumn("p_date", to_date(lit(ingestDate)))
      .withColumn("ts_ms", col("doc_id"))

  /** Start the streaming ingest. Exactly-once: a batch already in the
    * manifest is skipped whole (replays re-commit byte-identical content),
    * so crash/resume from `ckDir` never duplicates a document.
    */
  def start(spark: SparkSession, docsDir: String, docSchema: StructType,
      known: DataFrame, outDir: String, ckDir: String,
      minQuality: Double = 0.5, ingestDate: String = "1970-01-01",
      maxFilesPerTrigger: Int = 4): StreamingQuery = {
    val sink = new ExactlyOnceSink(spark, outDir)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(docsDir)
    curate(stream, known, minQuality)
      .dropDuplicates("content_md5")
      .writeStream
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!sink.isCommitted(batchId)) {
          val env = envelope(batch, ingestDate).persist()
          try {
            sink.writeBatch(batchId, env)
            val lineage = env.groupBy(col("route"), col("src_table"), col("p_date"))
              .agg(count(lit(1)).as("rows"),
                min(col("doc_id")).as("minLsn"), max(col("doc_id")).as("maxLsn"))
              .collect()
              .map(r => (s"${r.getString(0)}/${r.getString(1)}/${r.getDate(2)}",
                r.getLong(3), r.getLong(4), r.getLong(5)))
              .toSeq
            sink.commit(batchId, lineage)
          } finally { env.unpersist(); () }
        }
      }
      .start()
  }
}
