package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extraction / frame-sampling as partition-local
  * batch transforms.
  *
  * The media codecs themselves are NOT in this container, so the decode step
  * is a clearly-marked deterministic stand-in (`fakeDecode`): it consumes
  * the real bytes and emits a fixed-shape feature vector. Everything
  * Spark-side — schema, binary column handling, partition-local batching,
  * the typed boundary, downstream aggregation — is real and tested; a real
  * deployment swaps `fakeDecode` for the codec call without touching the
  * plan shape. (Scala analog of the mapInPandas pattern: `mapPartitions`
  * over an iterator so per-batch decoder setup amortizes across rows.)
  */
object Multimodal {

  final case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
      features: Array[Float], n_frames: Int, f0_num: Long)

  val FeatureDim = 16

  /** Deterministic stand-in for the codec: folds payload bytes into a
    * fixed-dim feature vector. Replace with the real decoder in production.
    */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f.map(x => x / math.max(1, payload.length / FeatureDim))
  }

  /** Frame sampling stand-in: one "frame" per 64-byte block, stride-sampled. */
  def sampleFrames(payload: Array[Byte], everyNth: Int): Int =
    (payload.length / 64 + everyNth - 1) / everyNth

  /** Integer-exact numerator of the first feature lane: the sum of the
    * unsigned bytes feeding features(0) (positions ≡ 0 mod FeatureDim).
    * Carried alongside the float features so downstream aggregates can be
    * oracle-checked bit-for-bit — float32 accumulation order is not
    * reproducible across engines, exact integers are.
    */
  def f0Numerator(payload: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += payload(i) & 0xff; i += FeatureDim }
    s
  }

  /** Synthesize a media table from the documents fixture (text bytes as the
    * opaque payload) — deterministic, schema-realistic.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"),
      (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  private def pmod(c: org.apache.spark.sql.Column, m: org.apache.spark.sql.Column) =
    ((c % m) + m) % m

  /** Decode + featurize, partition-local (decoder state amortized per
    * partition, mirroring mapInPandas batch shape).
    */
  def extractFeatures(media: DataFrame, frameStride: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { m =>
        MediaFeatures(m.media_id, m.modality, m.payload.length,
          fakeDecode(m.payload), sampleFrames(m.payload, frameStride),
          f0Numerator(m.payload))
      }
    }
  }

  /** Per-modality feature statistics — the downstream agg a pipeline feeds.
    * `avg_f0` is the corpus-weighted first feature lane computed from the
    * integer-exact fold (Σ f0_num / 255 / Σ per-doc normalizer) so the
    * whole row — including the float column — is reproducible in any
    * engine: two exact BIGINT sums, one double division chain, one round.
    */
  def modalityStats(media: DataFrame): DataFrame =
    extractFeatures(media).toDF()
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(col("n_frames").cast("long")).as("total_frames"),
        round(sum(col("f0_num")) / 255.0 /
          sum(greatest(lit(1L), floor(col("n_bytes") / FeatureDim).cast("long"))), 4)
          .as("avg_f0"))
}
