package graft
import org.apache.spark.sql.functions._
object SparkScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val spark = GraftSession.local(cpus, "probe")
    import spark.implicits._
    def time(l: String)(f: => Unit) = { val t0=System.nanoTime(); f; println(f"[probe] $l cpus=$cpus: ${(System.nanoTime()-t0)/1e9}%.2fs") }
    // pure compute, plenty of partitions
    time("warm")(spark.range(0, 1000000, 1, cpus).agg(sum(pmod(xxhash64($"id"), lit(1000000007L)))).collect())
    time("cpu range-hash")(spark.range(0, 2000000000L, 1, 128).agg(sum(pmod(xxhash64($"id"), lit(1000000007L)))).collect())
    // parquet read of the stream dir
    val df = spark.read.schema(source.ChangeStreamReader.envelopeSchema).parquet("/tmp/prof8/stream")
    time("parquet noop run1")(pipeline.CdcPipeline.routed(df).write.format("noop").mode("overwrite").save())
    time("parquet noop run2")(pipeline.CdcPipeline.routed(df).write.format("noop").mode("overwrite").save())
    time("parquet noop run3")(pipeline.CdcPipeline.routed(df).write.format("noop").mode("overwrite").save())
    time("plain read noop")(df.write.format("noop").mode("overwrite").save())
    time("plain read noop2")(df.write.format("noop").mode("overwrite").save())
    println("[probe] input partitions=" + df.rdd.getNumPartitions)
    spark.stop()
  }
}
