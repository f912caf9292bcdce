package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic sub-stage timings (guide §1.4): noop-sink timing of the
  * COMPONENT subtrees of the most expensive battery queries, so a regression
  * or an optimization can be attributed to a stage without touching the
  * frozen `Bench` protocol. Not part of the driver contract — numbers land
  * in BENCH/last_extra.json and are cited in OPTIMIZATION_r*.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=… sbt "runMain graft.BenchExtra"
  * Optional SPARK_GRAFT_EXTRA_ONLY=label1,label2 filters the stage list;
  * SPARK_GRAFT_QUERY_REPS (default 3) controls the per-stage min-of-N.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "3").toInt)
    val only = sys.env.get("SPARK_GRAFT_EXTRA_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.local(cpus, "graft-bench-extra")
    def docs = queries.Queries.table(spark, sfDir, "documents")
    def embs = queries.Queries.table(spark, sfDir, "embeddings")

    // each entry recomputes from the parquet inputs; caches internal to the
    // operators are released between stages (the Bench convention)
    val stages: Seq[(String, () => DataFrame)] = Seq(
      // ---- q22 decomposition ----
      "q22_embed" -> (() => ops.Dedup.hashedEmbeddings(docs)),
      "q22_bandkeys" -> (() => ops.Dedup.hashedEmbeddings(docs)
        .select(col("id"), posexplode(call_function(
          "lsh_band_keys", col("v"), lit(105), lit(12))))),
      "q22_cand" -> (() => ops.Dedup.signLshCandidates(
        ops.Dedup.hashedEmbeddings(docs).cache(), bands = 105, bitsPerBand = 12)),
      "q22_cand_nodistinct" -> (() => {
        val keys = ops.Dedup.hashedEmbeddings(docs).select(col("id"),
            posexplode(call_function("lsh_band_keys", col("v"), lit(105), lit(12))))
          .toDF("id", "band", "key")
        keys.as("x").join(keys.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id1"), col("y.id").as("id2"))
      }),
      "q22_full" -> (() => queries.Queries.q22EmbDedup(spark, sfDir)),
      // ---- q54 decomposition ----
      "q54_dupspans" -> (() => ops.Dedup.duplicateSpans(docs, k = 8, minDocs = 2)),
      "q54_removal" -> (() => ops.Dedup.removeDuplicateSpans(docs, k = 8, minDocs = 2)),
      "q54_full" -> (() => queries.Queries.q54SpanRemoval(spark, sfDir)),
      // ---- q59 decomposition ----
      "q59_pairs" -> (() => ops.Similarity.cosineSelfJoin(embs, threshold = 0.40, nlist = 16)),
      "q59_join_noverify" -> (() => {
        // the home×replica join WITHOUT the cosine verify: isolates
        // candidate volume cost from the per-pair dot products
        val clean = embs.where(col("embedding").isNotNull &&
          ops.Similarity.norm(col("embedding")) > 0)
        val cents = ops.Similarity.kmeansCentroids(clean, 16)
        val twoR = 2.0 * math.sqrt(math.max(0.0, 2.0 - 2.0 * 0.40))
        val cidSeq = sequence(lit(0), lit(cents.length - 1))
        val assigned = clean.select(col("vec_id"), col("embedding"))
          .withColumn("_cd", graft.functions.VectorFunctions.centroidDists(
            col("embedding"), cents, isFloat = true))
          .withColumn("_hd", array_min(col("_cd")))
        val home = assigned
          .withColumn("cid", (array_position(col("_cd"), col("_hd")) - 1).cast("int"))
          .select(col("vec_id").as("_ida"), col("cid"))
        val replicas = assigned
          .withColumn("cid", explode(filter(cidSeq, j =>
            element_at(col("_cd"), j + 1) <= col("_hd") + lit(twoR))))
          .select(col("vec_id").as("_idb"), col("cid"))
        home.join(replicas, "cid").where(col("_ida") < col("_idb"))
          .select(col("_ida"), col("_idb"))
      }),
      "q59_full" -> (() => queries.Queries.q59SemanticDedup(spark, sfDir)),
      // ---- q60 decomposition ----
      "q60_inter" -> (() => {
        val gh = ops.Dedup.grams(docs, 3).select(col("id"), xxhash64(col("gram")).as("gh")).cache()
        gh.as("a").join(gh.as("b"),
            col("a.gh") === col("b.gh") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
          .agg(count(lit(1)).as("inter"))
      }),
      "q60_full" -> (() => queries.Queries.q60Containment(spark, sfDir)),
      // ---- q11 reference (shares q60's inter shape) ----
      "q11_full" -> (() => queries.Queries.q11NgramJaccard(spark, sfDir)),
      // ---- q55/q70 persisted-index probes ----
      "q55_full" -> (() => queries.Queries.q55IncrementalIndexed(spark, sfDir)),
      "q70_full" -> (() => queries.Queries.q70KnnPersisted(spark, sfDir)),
      "q73_full" -> (() => queries.Queries.q73LeakSafeSplit(spark, sfDir)),
      // ---- q34 shape A/B (same-window): lead-window vs legacy self-join ----
      "q34_lead" -> (() => queries.Queries.q34Retention(spark, sfDir)),
      "q34_selfjoin" -> (() => {
        val ud = queries.Queries.table(spark, sfDir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct().cache()
        val act = ud.groupBy(col("d")).agg(count(lit(1)).as("n_active"))
        val ret = ud.as("a").join(ud.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("b.d") === date_add(col("a.d"), 1))
          .groupBy(col("a.d").as("d")).agg(count(lit(1)).as("n_retained"))
        act.join(ret, Seq("d"), "left")
          .select(col("d"), col("n_active"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"))
      })
    )

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    stages.filter { case (n, _) => only.forall(_.contains(n)) }.foreach { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"extra:$name")
        val t0 = System.nanoTime()
        try fn().write.format("noop").mode("overwrite").save()
        finally spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      results(name) = ts.min
      System.err.println(f"[extra] $name min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val line = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{\"metric\":\"extra\",\"stages\":{", ",", s"},\"sf\":\"$sfDir\",\"reps\":$reps,\"cpus\":$cpus}")
    println(line)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH/last_extra.json"),
        (line + "\n").getBytes("UTF-8"))
      ()
    } catch { case _: java.io.IOException => () }
    spark.stop()
  }
}
