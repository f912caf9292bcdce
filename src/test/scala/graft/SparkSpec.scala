package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one local session per suite, temp dirs, row-exact
  * DataFrame comparison (sorted canonical string form — the per-row
  * invariant is exact equality, so no tolerance).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(4, getClass.getSimpleName)

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(s"graft-$prefix").toString

  def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  def assertSameRows(got: DataFrame, want: DataFrame, hint: String = ""): Unit = {
    val g = canon(got)
    val w = canon(want)
    if (g != w) {
      val gOnly = g.diff(w).take(5)
      val wOnly = w.diff(g).take(5)
      fail(
        s"$hint row mismatch: got=${g.size} want=${w.size}\n" +
          s"  only-in-got: ${gOnly.mkString(" | ")}\n" +
          s"  only-in-want: ${wOnly.mkString(" | ")}")
    }
  }

  override def afterAll(): Unit = {
    // session is shared across suites in one JVM (getOrCreate) — do not stop.
    super.afterAll()
  }
}
