package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Plan-capture tool for the optimization rounds: writes every declared
  * query's `.explain("formatted")` output to a file, so plan-shape claims
  * (Exchange count, join strategy, PushedFilters/ReadSchema) are auditable
  * without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...]
  * Not part of the bench contract — a diagnostic main only.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val outDir = if (args.length > 1) args(1) else "plans/r07"
    val only = if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
          System.err.println(s"[plandump] $name ok (${plan.length} chars)")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
            Files.writeString(Paths.get(s"$outDir/$name.txt"),
              s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}\n")
        } finally spark.catalog.clearCache()
      }
    spark.stop()
  }
}
