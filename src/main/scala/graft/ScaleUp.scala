package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic bench-scale synthesizer: replicate the sf0.1 fixture
  * `factor`× with key-space offsets so the battery can be timed at sf1+
  * (the driver generates fixtures only up to sf0.1). BENCH-ONLY — the
  * correctness gate always runs on the driver's own tables.
  *
  * Replication rules (replica 0 is the original, bit-unchanged):
  *   - dimension tables (region, nation) are shared, not replicated;
  *   - every synthetic key domain is offset by `replica × (max_key + 1)`
  *     CONSISTENTLY across fact/dim references, so join fan-outs and group
  *     cardinalities scale linearly (orders still hit their customer,
  *     lineitems their order/part/supplier);
  *   - document TEXT is perturbed per replica with a pure function of
  *     (token, replica) — each replica rewrites ~half its distinct tokens
  *     to a replica-tagged variant. Within a replica the rewrite is
  *     consistent, so the planted near-dup structure replicates linearly;
  *     across replicas two copies of a doc share only ~25% of tokens
  *     (~1.6% of 3-grams), far below every near-dup threshold — pair
  *     volume scales ~linearly instead of quadratically in the factor;
  *   - embeddings replicate with offset ids and unperturbed vectors (ANN
  *     queries are top-k over 10× candidates; ties across replicas are
  *     timing-irrelevant).
  *
  * `usage: ScaleUp <srcSfDir> <destDir> [factor=10]`
  */
object ScaleUp {

  private def replicate(spark: SparkSession, src: DataFrame, factor: Int)
      (per: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => per(src, r)).reduce(_ unionByName _)

  /** token -> replica-tagged variant for ~half the tokens (pure in (t, r)). */
  private def perturbText(text: org.apache.spark.sql.Column, r: Int) =
    if (r == 0) text
    else array_join(
      transform(split(text, " "),
        t => when(pmod(xxhash64(t, lit(r)), lit(2)) === 0, t)
          .otherwise(concat(t, lit(s"~$r")))), " ")

  def run(spark: SparkSession, srcDir: String, destDir: String, factor: Int): Unit = {
    def tbl(name: String) = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$destDir/$name.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).first().getLong(0) + 1L
    def off(c: String, s: Long, r: Int) = (col(c) + lit(s * r)).as(c)

    // shared dimensions
    write(tbl("region"), "region")
    write(tbl("nation"), "nation")

    val custS = stride(tbl("customer"), "c_custkey")
    val suppS = stride(tbl("supplier"), "s_suppkey")
    val partS = stride(tbl("part"), "p_partkey")
    val ordS = stride(tbl("orders"), "o_orderkey")
    val evtS = stride(tbl("events"), "event_id")
    val usrS = stride(tbl("events"), "user_id")
    val docS = stride(tbl("documents"), "doc_id")
    val vecS = stride(tbl("embeddings"), "vec_id")

    write(replicate(spark, tbl("customer"), factor)((d, r) =>
      d.select(off("c_custkey", custS, r), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))), "customer")
    write(replicate(spark, tbl("supplier"), factor)((d, r) =>
      d.select(off("s_suppkey", suppS, r), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))), "supplier")
    write(replicate(spark, tbl("part"), factor)((d, r) =>
      d.select(off("p_partkey", partS, r), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))), "part")
    write(replicate(spark, tbl("orders"), factor)((d, r) =>
      d.select(off("o_orderkey", ordS, r), off("o_custkey", custS, r),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))), "orders")
    write(replicate(spark, tbl("lineitem"), factor)((d, r) =>
      d.select(off("l_orderkey", ordS, r), off("l_partkey", partS, r),
        off("l_suppkey", suppS, r), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))), "lineitem")
    write(replicate(spark, tbl("events"), factor)((d, r) =>
      d.select(off("event_id", evtS, r), col("ts"), off("user_id", usrS, r),
        col("event_type"), col("value"), col("props"))), "events")
    write(replicate(spark, tbl("documents"), factor)((d, r) =>
      d.select(off("doc_id", docS, r), perturbText(col("text"), r).as("text"),
        col("lang"), col("source"), col("n_chars"))), "documents")
    write(replicate(spark, tbl("embeddings"), factor)((d, r) =>
      d.select(off("vec_id", vecS, r), col("embedding"), col("label"))), "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val destDir = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scaleup")
    run(spark, srcDir, destDir, factor)
    Seq("lineitem", "events", "documents", "embeddings").foreach { t =>
      println(s"[scaleup] $t rows=${spark.read.parquet(s"$destDir/$t.parquet").count()}")
    }
    spark.stop()
  }
}
