package graft.sink

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export formats for the committed change log (≙ reference K1 JSON sink,
  * sink/S3Sink.scala:108-138, and K2 Avro sink, S3Sink.scala:143-172 with
  * the hand-rolled GenericDatumWriter encoder at :337-415).
  *
  * The primary storage format is Parquet (the reference's "Parquet" sink is
  * itself an alias for Avro — S3Sink.scala:177-182; SURVEY.md §2.3 K3).
  * These exporters reproduce the reference's interchange formats:
  *
  *   - JSONL: `format("json")` partitioned like the sink dirs — codegen'd.
  *   - Avro: the reference's exact approach — a fixed flat record whose
  *     before/after/source blocks are re-serialized as JSON *strings*
  *     (S3Sink.scala:346-361), written with avro-core's GenericDatumWriter
  *     in a partition-local loop (no spark-avro jar in this sandbox, same
  *     constraint the reference solved the same way).
  */
object Export {

  /** The reference's flat Avro record schema (S3Sink.scala:346-361 fields,
    * minus cloud-specific additions).
    */
  val avroSchemaJson: String =
    """{"type":"record","name":"CDCEvent","namespace":"graft","fields":[
      |{"name":"table_name","type":"string"},
      |{"name":"operation","type":"string"},
      |{"name":"timestamp","type":"long"},
      |{"name":"before","type":["null","string"],"default":null},
      |{"name":"after","type":["null","string"],"default":null},
      |{"name":"source","type":["null","string"],"default":null},
      |{"name":"processing_time","type":"long"},
      |{"name":"pipeline_version","type":"string"},
      |{"name":"data_quality_score","type":"double"}
      |]}""".stripMargin

  /** Output-format / compression whitelist (≙ reference
    * validation/EnvironmentValidator.scala:110-119). `validate` throws on
    * anything outside it — the same fail-fast the reference applies before
    * starting the job.
    */
  val Formats: Set[String] = Set("json", "avro", "parquet")
  val Compressions: Set[String] = Set("none", "gzip", "snappy", "lz4")

  def validateFormat(format: String, compression: String): Unit = {
    require(Formats.contains(format),
      s"unsupported output format '$format' (one of ${Formats.mkString("/")})")
    require(Compressions.contains(compression),
      s"unsupported compression '$compression' (one of ${Compressions.mkString("/")})")
    require(!(format == "avro" && compression == "lz4"),
      "avro supports none/gzip/snappy (lz4 is parquet/json-only here)")
  }

  /** Committed data events → JSONL, time-bucket partitioned.
    * `maxRecordsPerFile` is the size-based rolling control (≙ reference
    * sink/S3Sink.scala:262-293 rolling policy, recast as Spark's native
    * file-rolling option).
    */
  def jsonl(spark: SparkSession, workOut: String, dest: String,
      compression: String = "none", maxRecordsPerFile: Long = 0L): Unit = {
    validateFormat("json", compression)
    val sink = new ExactlyOnceSink(spark, workOut)
    val ev = sink.readCommitted("events")
      .getOrElse(throw new IllegalStateException("no committed batches"))
    ev.drop("batch")
      .repartitionByRange(math.max(2, spark.sparkContext.defaultParallelism),
        col("p_date"), col("ts_ms"))
      .write.mode("overwrite")
      .option("compression", if (compression == "none") "uncompressed" else compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("p_date").json(dest)
  }

  /** Committed data events → Avro (reference-shaped flat record).
    *
    * Write protocol (task-retry/replay safe): every task writes
    * `.staging-parts/part-<partitionId>.avro` with overwrite — a retried or
    * speculative attempt of the same partition lands on the same name — and
    * the driver publishes the staging dir by clearing stale part files and
    * renaming the staged ones in. A crash mid-publish leaves either the old
    * or the new file per partition, never a duplicate record.
    */
  def avro(spark: SparkSession, workOut: String, dest: String,
      compression: String = "none"): Unit = {
    validateFormat("avro", compression)
    val sink = new ExactlyOnceSink(spark, workOut)
    val ev = sink.readCommitted("events")
      .getOrElse(throw new IllegalStateException("no committed batches"))
    val flat = ev.select(
      coalesce(col("source.table"), lit("unknown")).as("table_name"),
      col("op").as("operation"),
      col("ts_ms").as("timestamp"),
      to_json(col("before")).as("before"),
      to_json(col("after")).as("after"),
      to_json(col("source")).as("source"),
      unix_millis(col("processing_timestamp")).as("processing_time"),
      col("pipeline_version"),
      col("data_quality_score"))
    val schemaStr = avroSchemaJson
    val destDir = dest
    val stagingDir = s"$dest/.staging-parts"
    val codec = compression
    flat.repartition(math.max(2, spark.sparkContext.defaultParallelism))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val schema = new Schema.Parser().parse(schemaStr)
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val part = f"part-$pid%05d.avro"
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(destDir), new org.apache.hadoop.conf.Configuration())
          fs.mkdirs(new org.apache.hadoop.fs.Path(stagingDir))
          val out = fs.create(new org.apache.hadoop.fs.Path(s"$stagingDir/$part"), true)
          val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
          codec match {
            case "gzip" => writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
            case "snappy" => writer.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
            case _ =>
          }
          writer.create(schema, out)
          it.foreach { r =>
            val rec = new GenericData.Record(schema)
            rec.put("table_name", r.getAs[String]("table_name"))
            rec.put("operation", r.getAs[String]("operation"))
            rec.put("timestamp", r.getAs[Long]("timestamp"))
            rec.put("before", r.getAs[String]("before"))
            rec.put("after", r.getAs[String]("after"))
            rec.put("source", r.getAs[String]("source"))
            rec.put("processing_time", r.getAs[Long]("processing_time"))
            rec.put("pipeline_version", r.getAs[String]("pipeline_version"))
            rec.put("data_quality_score", r.getAs[Double]("data_quality_score"))
            writer.append(rec)
          }
          writer.close()
        }
      }
    // publish: drop stale part files, then rename the staged ones in
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(destDir), spark.sparkContext.hadoopConfiguration)
    val stPath = new org.apache.hadoop.fs.Path(stagingDir)
    val staged =
      if (fs.exists(stPath)) fs.globStatus(new org.apache.hadoop.fs.Path(s"$stagingDir/part-*.avro"))
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    fs.globStatus(new org.apache.hadoop.fs.Path(s"$destDir/part-*.avro"))
      .foreach(s => fs.delete(s.getPath, false))
    staged.foreach(s =>
      fs.rename(s.getPath, new org.apache.hadoop.fs.Path(s"$destDir/${s.getPath.getName}")))
    if (fs.exists(stPath)) fs.delete(stPath, true)
  }

  /** Dead-letter export: the error route in the reference's wrapper shape
    * (handlers/ErrorHandler.scala:12-26) as JSONL.
    */
  def dlq(spark: SparkSession, workOut: String, dest: String): Unit = {
    val sink = new ExactlyOnceSink(spark, workOut)
    sink.readCommitted("errors").foreach { err =>
      graft.pipeline.Router.errorRecord(err.drop("route"))
        .coalesce(1).write.mode("overwrite").json(dest)
    }
  }
}
