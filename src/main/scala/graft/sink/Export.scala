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

  /** Committed data events → JSONL, time-bucket partitioned. */
  def jsonl(spark: SparkSession, workOut: String, dest: String): Unit = {
    val sink = new ExactlyOnceSink(spark, workOut)
    val ev = sink.readCommitted("events")
      .getOrElse(throw new IllegalStateException("no committed batches"))
    ev.drop("batch")
      .repartitionByRange(math.max(2, spark.sparkContext.defaultParallelism),
        col("p_date"), col("ts_ms"))
      .write.mode("overwrite").partitionBy("p_date").json(dest)
  }

  /** Committed data events → Avro (reference-shaped flat record). */
  def avro(spark: SparkSession, workOut: String, dest: String): Unit = {
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
    flat.repartition(math.max(2, spark.sparkContext.defaultParallelism))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val schema = new Schema.Parser().parse(schemaStr)
          val part = f"part-${java.util.UUID.randomUUID()}.avro"
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(destDir), new org.apache.hadoop.conf.Configuration())
          fs.mkdirs(new org.apache.hadoop.fs.Path(destDir))
          val out = fs.create(new org.apache.hadoop.fs.Path(s"$destDir/$part"), true)
          val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
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
