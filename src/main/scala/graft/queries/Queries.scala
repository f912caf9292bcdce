package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch analytics queries over the driver test tables, each paired with a
  * DuckDB oracle in SparkEntry.oracleSql. These exercise the engine's
  * operator surface (aggregation, joins, windows, sessionization, pattern
  * matching, dedup, text analysis, similarity) in oracle-checkable form;
  * the streaming semantics of the same operators are covered by the
  * ScalaTest suites.
  */
object Queries {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Order-independent exact sum of a 2-decimal double column: scale to
    * integer cents, sum as long (exact), descale. Floating sums are
    * order-dependent across engines; this makes Spark and DuckDB agree
    * bit-for-bit.
    */
  def sumCents(c: Column): Column = (sum(round(c * 100).cast("long")) / 100.0)

  /** Same for a product of two 2-decimal columns (price * (1-discount)). */
  def sumCentsProd(a: Column, b: Column): Column =
    (sum(round(a * 100).cast("long") * round(b * 100).cast("long")) / 10000.0)

  /** q1: pricing-summary aggregation (TPC-H Q1 shape) over lineitem.
    * Map-side partial agg + final agg; one shuffle on the 6-value group key.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sumCents(col("l_extendedprice")).as("sum_base_price"),
        sumCentsProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        (sum(round(col("l_quantity") * 100).cast("long")) / count(lit(1)) / 100.0).as("avg_qty"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
