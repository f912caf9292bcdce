package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.pipeline.CorpusIngest
import graft.sink.ExactlyOnceSink

/** Streaming corpus ingestion: the corpus operators composed with the
  * exactly-once sink (curation is engine-neutral, delivery is the CDC
  * machinery's).
  */
class CorpusIngestSpec extends SparkSpec {

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def writeSlice(dir: String, name: String, df: DataFrame): Unit = {
    val tmp = s"$dir/.tmp-$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet"))(0).getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  test("streaming ingest == batch curation; exactly-once across reruns and late files") {
    val dir = tmpDir("ci-docs"); val out = tmpDir("ci-out"); val ck = tmpDir("ci-ck")
    // the known corpus holds already-curated (scrubbed) text
    val known = docs.where(col("doc_id") % 50 === 0)
      .select(TextAnalysis.scrub(col("text")).as("text"))
    val first = docs.where(col("doc_id") < 400)
    writeSlice(dir, "f1", first.where(col("doc_id") < 200))
    writeSlice(dir, "f2", first.where(col("doc_id") >= 200))
    CorpusIngest.start(spark, dir, docs.schema, known, out, ck, minQuality = 0.5)
      .awaitTermination()
    val sink = new ExactlyOnceSink(spark, out)
    val got = sink.readCommitted("events").get.cache()
    // == batch curation over the same input (content-hash sets: which twin
    // of an identical-text pair survives dropDuplicates is tie-arbitrary)
    val want = CorpusIngest.curate(first, known).dropDuplicates("content_md5").cache()
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.select("content_md5").collect().map(_.getString(0)).toSet ==
      want.select("content_md5").collect().map(_.getString(0)).toSet)
    // the gates actually gated: known content absent, quality floor holds,
    // digit runs scrubbed
    val knownSet = known.collect().map(_.getString(0)).toSet
    assert(got.where(col("text").isin(knownSet.toSeq: _*)).count() == 0)
    assert(got.where(col("quality") < 0.5).count() == 0)
    assert(got.where(col("text").rlike("[0-9]")).count() == 0)
    // per-source read is the sink's partition-pruned table view
    assert(sink.readCommitted("events", table = Some("src3")).get.count() ==
      got.where(col("src_table") === "src3").count())
    // exactly-once: a plain rerun adds nothing
    CorpusIngest.start(spark, dir, docs.schema, known, out, ck, minQuality = 0.5)
      .awaitTermination()
    assert(sink.readCommitted("events").get.count() == got.count())
    // a late file appends exactly its own curated survivors, no dups
    writeSlice(dir, "f3", docs.where(col("doc_id") >= 400))
    CorpusIngest.start(spark, dir, docs.schema, known, out, ck, minQuality = 0.5)
      .awaitTermination()
    val after = sink.readCommitted("events").get.cache()
    val wantAll = CorpusIngest.curate(docs, known).dropDuplicates("content_md5")
    assert(after.count() == wantAll.count())
    assert(after.select("content_md5").distinct().count() == after.count(),
      "no content duplicated across the incremental runs")
    // lineage carries per-source doc-id ranges for the audit trail
    val man = sink.readManifest().get
    assert(man.where(col("partition").contains("src")).count() > 0)
    // log compaction works on the ingest envelope too (its lineage lsn is
    // ts_ms = doc_id): content re-reads identically, epoch lineage present
    val before = after.collect().map(_.mkString("|")).sorted.toSeq
    sink.compact()
    val compacted = sink.readCommitted("events").get
    assert(compacted.collect().map(_.mkString("|")).sorted.toSeq == before)
    assert(sink.readManifest().get.where(col("compacted") === true).count() > 0)
    got.unpersist(); want.unpersist(); after.unpersist()
  }

  test("a fully-filtered micro-batch commits empty and does not wedge the stream") {
    import spark.implicits._
    val dir = tmpDir("ci-empty-docs"); val out = tmpDir("ci-empty-out")
    val ck = tmpDir("ci-empty-ck")
    // every doc fails the quality gate (degenerate single-token repeats)
    val junk = (0 until 30).map(i => (i.toLong, s"src${i % 3}", "spam " * 3))
      .toDF("doc_id", "source", "text")
    writeSlice(dir, "junk", junk)
    val known = Seq.empty[String].toDF("text")
    CorpusIngest.start(spark, dir, junk.schema, known, out, ck, minQuality = 0.9)
      .awaitTermination()
    val sink = new ExactlyOnceSink(spark, out)
    assert(sink.committedBatchIds.nonEmpty, "empty batch must still commit")
    assert(sink.readCommitted("events").forall(_.count() == 0))
    // compacting an ALL-EMPTY history still flips the epoch (bounds the
    // manifest) instead of crashing on schema inference
    val epoch = sink.compact()
    assert(sink.epochFloor.contains(epoch))
    assert(sink.readCommitted("events").forall(_.count() == 0))
    // and a follow-up file with a doc engineered past the 0.9 gate (120
    // tokens, 20% stopwords, ~8.7 mean chars, 0.86 diversity → ≈0.96)
    // flows through the same stream
    // letter-only tokens: scrub runs BEFORE the gate, so digit-bearing
    // tokens would all collapse to the same <NUM>-masked string and kill
    // the diversity term
    val goodText = ((0 until 96).map(i =>
      s"wordy${('a' + i / 26).toChar}${('a' + i % 26).toChar}xyz") ++
      Seq.fill(3)(Seq("the", "a", "of", "and", "to", "in", "is", "over")).flatten)
      .mkString(" ")
    writeSlice(dir, "good",
      Seq((100L, "src0", goodText)).toDF("doc_id", "source", "text"))
    CorpusIngest.start(spark, dir, junk.schema, known, out, ck, minQuality = 0.9)
      .awaitTermination()
    assert(sink.readCommitted("events").get.count() == 1)
  }
}
