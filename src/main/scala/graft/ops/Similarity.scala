package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — one narrow pass over the vectors
  * (the query vector is a literal broadcast into codegen), no shuffle except
  * the final top-k. Scale path: IVF — vectors are bucketed by nearest
  * centroid once (a small broadcast join), and queries probe only the
  * nProbe nearest buckets, cutting the scan by ~nlist/nProbe; partition
  * pruning on the centroid column makes the probe a selective parquet read
  * at rest.
  *
  * All arithmetic is sequential-fold double (`aggregate` over zip_with), so
  * a DuckDB oracle using list_dot_product reproduces scores bit-for-bit.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float vector (cast to double first). */
  def norm(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    sqrt(dot(d, d))
  }

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Cosine of every vector against one literal query vector. */
  def cosineToQuery(embs: DataFrame, query: Array[Float],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(x => lit(x.toDouble)): _*)
    val qn = math.sqrt(query.map(x => x.toDouble * x.toDouble).sum)
    embs.select(
      col(idCol),
      (dot(asDouble(col(vecCol)), q) / (norm(col(vecCol)) * lit(qn))).as("cosine"))
  }

  /** Brute-force cosine top-k for one query vector (excludes exact id match
    * when `excludeId` is set). Deterministic tiebreak on id.
    */
  def bruteForceTopK(embs: DataFrame, query: Array[Float], k: Int,
      excludeId: Option[Long] = None, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val scored = cosineToQuery(embs, query, idCol, vecCol)
    val base = excludeId.fold(scored)(i => scored.where(col(idCol) =!= i))
    base.orderBy(col("cosine").desc, col(idCol)).limit(k)
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic centroid pick: the nlist lowest-id vectors. (A k-means
    * refinement would drop in here; determinism matters more than centroid
    * quality for correctness tests.)
    */
  def centroids(embs: DataFrame, nlist: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[(Long, Array[Double])] =
    embs.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol), asDouble(col(vecCol)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** IVF assignment: each vector's nearest centroid id (broadcast argmax —
    * centroids are a local literal array, so this is a narrow map).
    */
  def ivfAssign(embs: DataFrame, cents: Array[(Long, Array[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    // argmin over squared L2 distance, built as a fold over literal centroids
    val scored = cents.map { case (cid, c) =>
      val cl = array(c.map(lit): _*)
      struct(
        aggregate(zip_with(v, cl, (x, y) => (x - y) * (x - y)), lit(0.0), (a, d) => a + d)
          .as("dist"),
        lit(cid).as("cid"))
    }
    embs.withColumn("centroid", array_min(array(scored: _*)).getField("cid"))
  }

  /** IVF top-k: probe the nProbe centroids nearest to the query, exact
    * cosine rerank inside those buckets only.
    */
  def ivfTopK(embs: DataFrame, query: Array[Float], k: Int, nlist: Int = 16,
      nProbe: Int = 4, excludeId: Option[Long] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids(embs, nlist, idCol, vecCol)
    val qd = query.map(_.toDouble)
    val probed = cents
      .map { case (cid, c) =>
        (cid, c.zip(qd).map { case (x, y) => (x - y) * (x - y) }.sum)
      }
      .sortBy(_._2).take(nProbe).map(_._1).toSet
    val assigned = ivfAssign(embs, cents, idCol, vecCol)
      .where(col("centroid").isin(probed.toSeq: _*))
    bruteForceTopK(assigned, query, k, excludeId, idCol, vecCol)
  }
}
