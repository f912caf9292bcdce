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

  /** "5min"/"30sec"/"500ms" → millis (≙ reference parseTimeToMillis,
    * sink/S3Sink.scala:262-275: same units, same 5-minute default on
    * anything unparseable; whitespace additionally tolerated).
    */
  def parseTimeToMillis(timeStr: String): Long = {
    val p = """(\d+)\s*(min|sec|ms)""".r
    timeStr.toLowerCase.trim match {
      case p(v, "min") => v.toLong * 60000L
      case p(v, "sec") => v.toLong * 1000L
      case p(v, "ms") => v.toLong
      // bare "0" = disabled — falling through to the 5-minute default here
      // would silently RE-ENABLE the policy the user just turned off
      case "0" => 0L
      case _ => 5L * 60000L
    }
  }

  /** "128MB"/"2GB"/"64KB" → bytes (≙ reference parseMemorySize,
    * S3Sink.scala:280-293: same units, same 128 MB default).
    */
  def parseSizeBytes(sizeStr: String): Long = {
    val p = """(\d+)\s*(MB|GB|KB)""".r
    sizeStr.toUpperCase.trim match {
      case p(v, "MB") => v.toLong << 20
      case p(v, "GB") => v.toLong << 30
      case p(v, "KB") => v.toLong << 10
      // bare "0" = disabled (same rationale as parseTimeToMillis)
      case "0" => 0L
      case _ => 128L << 20
    }
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

  /** Write one partition's rows as a staged Avro file; records that fail to
    * encode fall back to a raw-JSON sidecar instead of failing the task
    * (≙ reference S3Sink.scala:408-415, which drops the raw JSON bytes into
    * the output stream on encode failure — recast to a sidecar file so the
    * Avro container itself stays well-formed). Returns (encoded, fellBack).
    */
  private[graft] def writeAvroPart(rows: Iterator[org.apache.spark.sql.Row],
      schemaStr: String, fs: org.apache.hadoop.fs.FileSystem,
      avroPath: org.apache.hadoop.fs.Path,
      fallbackPath: org.apache.hadoop.fs.Path, codec: String): (Long, Long) = {
    val schema = new Schema.Parser().parse(schemaStr)
    val out = fs.create(avroPath, true)
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    codec match {
      case "gzip" => writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      case "snappy" => writer.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      case _ =>
    }
    writer.create(schema, out)
    var fallback: java.io.OutputStream = null
    var nOk = 0L
    var nFb = 0L
    rows.foreach { r =>
      try {
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
        nOk += 1
      } catch {
        case scala.util.control.NonFatal(_) =>
          if (fallback == null) fallback = fs.create(fallbackPath, true)
          val raw = Option(r.getAs[String]("_raw_json")).getOrElse(r.toString)
          fallback.write((raw + "\n").getBytes("UTF-8"))
          nFb += 1
      }
    }
    writer.close()
    if (fallback != null) fallback.close()
    (nOk, nFb)
  }

  /** Committed data events → Avro (reference-shaped flat record).
    *
    * Write protocol (task-retry/speculation/replay safe): every task
    * attempt writes `.staging-parts/part-<pid>-a<attemptId>.avro` —
    * attempt-unique names, so concurrent speculative attempts never share a
    * file — and the driver promotes ONE winning attempt per partition,
    * publishing per partition as delete+rename of that partition's file
    * only. A crash mid-publish leaves every partition with either its old
    * or its new file, never neither and never a duplicate. Stale partitions
    * from a previous wider run are swept only after all renames land.
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
      // raw-JSON twin of the record, used only by the encode-failure path
      .withColumn("_raw_json", to_json(struct(
        col("table_name"), col("operation"), col("timestamp"), col("before"),
        col("after"), col("source"), col("processing_time"),
        col("pipeline_version"), col("data_quality_score"))))
    val schemaStr = avroSchemaJson
    val destDir = dest
    val stagingDir = s"$dest/.staging-parts"
    val codec = compression
    // executor tasks must see the SESSION Hadoop conf (spark.hadoop.* —
    // credentials, endpoints), not a bare new Configuration(); ship the
    // entries and rebuild per task
    val hadoopEntries: Array[(String, String)] = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toArray
    }
    // clear stale staging BEFORE the job: leftovers from a crashed prior
    // run carry attempt ids from that application and could out-rank (and
    // out-date) this run's files in the max-attempt promotion
    val fsDriver = new org.apache.hadoop.fs.Path(destDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsDriver.delete(new org.apache.hadoop.fs.Path(stagingDir), true)
    flat.repartition(math.max(2, spark.sparkContext.defaultParallelism))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val att = tc.taskAttemptId()
          val conf = new org.apache.hadoop.conf.Configuration()
          hadoopEntries.foreach { case (k, v) => conf.set(k, v) }
          val fs = new org.apache.hadoop.fs.Path(destDir).getFileSystem(conf)
          fs.mkdirs(new org.apache.hadoop.fs.Path(stagingDir))
          writeAvroPart(it, schemaStr, fs,
            new org.apache.hadoop.fs.Path(f"$stagingDir/part-$pid%05d-a$att.avro"),
            new org.apache.hadoop.fs.Path(f"$stagingDir/part-$pid%05d-a$att.fallback.jsonl"),
            codec)
          // completion marker: a killed speculative attempt leaves a
          // truncated container with a HIGHER attempt id — promotion only
          // considers attempts that reached this line
          fs.createNewFile(new org.apache.hadoop.fs.Path(f"$stagingDir/part-$pid%05d-a$att.ok"))
          ()
        }
      }
    // promote one winning attempt per partition, publish per partition
    val fs = new org.apache.hadoop.fs.Path(destDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stPath = new org.apache.hadoop.fs.Path(stagingDir)
    val stagedName = """part-(\d+)-a(\d+)\.avro""".r
    val staged =
      if (fs.exists(stPath)) fs.globStatus(new org.apache.hadoop.fs.Path(s"$stagingDir/part-*.avro"))
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val winners = staged.flatMap { s =>
      s.getPath.getName match {
        case stagedName(pid, att)
            // only completed attempts compete (see the .ok marker above)
            if fs.exists(new org.apache.hadoop.fs.Path(
              s"$stagingDir/part-$pid-a$att.ok")) =>
          Some((pid.toInt, att.toLong, s.getPath))
        case _ => None
      }
    }.groupBy(_._1).map { case (pid, as) => pid -> as.maxBy(_._2) }
    // heal first: a crash inside a previous publish can leave the old file
    // parked under .old with its replacement missing — restore it so no
    // partition is ever silently absent after recovery
    def healAside(suffix: String): Unit =
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$destDir/part-*$suffix.old")).foreach { s =>
        val cur = new org.apache.hadoop.fs.Path(s.getPath.toString.stripSuffix(".old"))
        if (!fs.exists(cur)) { fs.rename(s.getPath, cur); () }
        else fs.delete(s.getPath, false)
      }
    healAside(".avro")
    healAside(".fallback.jsonl")
    // per-file publish: park the old file aside (atomic rename), land the
    // new one, then drop the parked copy — every rename result is checked,
    // so a failure never passes through the delete-then-hope window
    def publish(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit = {
      val aside = new org.apache.hadoop.fs.Path(dst.toString + ".old")
      if (fs.exists(aside)) fs.delete(aside, false)
      if (fs.exists(dst) && !fs.rename(dst, aside))
        throw new java.io.IOException(s"aside rename failed for $dst")
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"publish rename failed for $dst")
      fs.delete(aside, false)
      ()
    }
    winners.foreach { case (pid, (_, att, path)) =>
      publish(path, new org.apache.hadoop.fs.Path(f"$destDir/part-$pid%05d.avro"))
      val fb = new org.apache.hadoop.fs.Path(f"$stagingDir/part-$pid%05d-a$att.fallback.jsonl")
      val fbDst = new org.apache.hadoop.fs.Path(f"$destDir/part-$pid%05d.fallback.jsonl")
      if (fs.exists(fb)) publish(fb, fbDst)
      // this attempt had no encode failures → retire the stale sidecar, or
      // its raw-JSON rows would double the fixed records in the new avro
      else if (fs.exists(fbDst)) fs.delete(fbDst, false)
    }
    // sweep partitions that no longer exist (previous wider run) — BOTH the
    // avro container and any fallback sidecar
    def sweep(pattern: scala.util.matching.Regex, glob: String): Unit =
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$destDir/$glob")).foreach { s =>
        s.getPath.getName match {
          case pattern(pid) if !winners.contains(pid.toInt) => fs.delete(s.getPath, false)
          case _ =>
        }
      }
    sweep("""part-(\d+)\.avro""".r, "part-*.avro")
    sweep("""part-(\d+)\.fallback\.jsonl""".r, "part-*.fallback.jsonl")
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

  /** Schema-change export: the schema route in the reference's wrapper
    * shape (handlers/SchemaChangeHandler.scala:12-26; shipped through the
    * same cloud sink in reference main.scala:485-493) as JSONL.
    */
  def schemaChanges(spark: SparkSession, workOut: String, dest: String): Unit = {
    val sink = new ExactlyOnceSink(spark, workOut)
    sink.readCommitted("schema_changes").foreach { sc =>
      graft.pipeline.Router.schemaChangeRecord(sc.drop("route"))
        .coalesce(1).write.mode("overwrite").json(dest)
    }
  }
}
