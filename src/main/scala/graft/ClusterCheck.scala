package graft

/** Multi-executor-JVM equality check: run a kernel- and shuffle-heavy
  * subset of the battery under `local-cluster[2,2,...]` — SEPARATE
  * executor JVMs, real serialization boundaries, extension resolution in
  * executors — and compare row-for-row against the local-mode outputs a
  * prior `graft.Verify` run wrote. local[32] hides whole failure classes
  * (closure capture, kernel registration via SparkSessionExtensions in
  * fresh executor JVMs, codegen class shipping); this is the cheap hard
  * signal that the plans run beyond one JVM.
  *
  * Usage:
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *     sbt -batch "runMain graft.ClusterCheck <sfDir> <verifyOutDir>"
  * (both env vars are required: local-cluster workers launch executor
  * JVMs from the distribution's scripts). Exits 3 on any mismatch.
  */
object ClusterCheck {

  /** Chosen to cover every custom-kernel family (word_ngrams, simhash60,
    * hash_embed/lsh_band_keys/dot_i64, fingerprint-windows, dot_f64 +
    * centroid_dists, top_bigram_frac), the window/shuffle shapes, and the
    * eager driver-aggregate operators (union-find clustering, mixture
    * counts, budget bins).
    */
  val Subset: Seq[String] = Seq(
    "q1_agg", "q4_topk", "q12_minhash_lsh", "q13_simhash", "q22_emb_dedup",
    "q26_dedup_clusters", "q29_repetition", "q39_substring_dedup",
    "q43_knn_bucketed", "q44_pack_shards", "q45_mixture_balance",
    "q48_length_outliers", "q49_token_budget", "q51_centroid_classify",
    "q52_assembly")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    val ordered = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    ordered.collect().map(_.mkString("|")).toSeq.sorted
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, localOut) = args
    val spark = GraftSession.cluster(2, 2, 3072, "graft-clustercheck")
    var failed = 0
    Subset.foreach { name =>
      try {
        val got = canon(SparkEntry.queries(name)(spark, sfDir))
        val want = canon(spark.read.parquet(s"$localOut/$name"))
        if (got == want) println(s"[clustercheck] $name OK rows=${got.size}")
        else {
          failed += 1
          println(s"[clustercheck] $name MISMATCH got=${got.size} want=${want.size} " +
            s"firstDiff=${got.diff(want).headOption.orElse(want.diff(got).headOption).getOrElse("")}")
        }
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"[clustercheck] $name FAILED ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(160)}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
    println(s"[clustercheck] ${Subset.size - failed}/${Subset.size} equal to local-mode outputs")
    if (failed > 0) sys.exit(3)
  }
}
