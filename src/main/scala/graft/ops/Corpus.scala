package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the steps BETWEEN curation (Dedup/
  * TextAnalysis) and the training job: packing documents into token-budget
  * shards, re-weighting sources to a target mixture, and measuring
  * cross-source overlap. Like everything in `ops`, each operator is
  * engine-neutral integer arithmetic over the same salted 60-bit md5 hash
  * as `Dedup.hashSample`, so a DuckDB oracle replicates it bit-for-bit.
  */
object Corpus {

  /** Deterministic writer-bucket assignment: content-addressed on the doc
    * id (NOT partitioning- or run-dependent like `spark_partition_id`), so
    * a re-run, a different cluster size, or a different input ordering
    * produces the SAME shard layout — the property that makes training
    * shards reproducible and resumable.
    */
  def writerBucket(id: Column, numWriters: Int, salt: String = "w0"): Column =
    pmod(TextAnalysis.tokenHash60(concat(lit(salt), lit(":"), id.cast("string"))),
      lit(numWriters.toLong))

  /** Training-shard packing: assign every document to a (writer, shard)
    * slot under a per-shard token budget — the GPT-style "concatenate then
    * chunk" layout (each writer streams its documents in id order into a
    * token tape; shard k holds tape offsets [k·budget, (k+1)·budget); a
    * document lives in the shard containing its FIRST token, so a doc
    * longer than the budget still gets exactly one slot).
    *
    * Scale: one narrow projection computes (writer, tokens) scan-side —
    * the TEXT column never leaves the scan; the only shuffle moves
    * (id, writer, tokens) — ~24 bytes/doc — to `numWriters` partitions,
    * and the per-writer running sum is the packing requirement itself
    * (a deterministic order within each writer). Size `numWriters` to the
    * cluster: 10k writers over 100 TB puts ~10 GB of doc-metadata per
    * writer through each sort, and writers are independent — the layout
    * is identical at ANY parallelism because the bucket is content-
    * addressed.
    */
  def packShards(docs: DataFrame, tokenBudget: Long, numWriters: Int,
      idCol: String = "doc_id", textCol: String = "text",
      salt: String = "w0"): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    require(numWriters > 0, s"numWriters must be positive, got $numWriters")
    val w = Window.partitionBy(col("writer")).orderBy(col(idCol))
    docs.select(col(idCol),
        writerBucket(col(idCol), numWriters, salt).as("writer"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      // tape offset of the doc's first token within its writer; `div` keeps
      // the shard index in exact long arithmetic (Spark's `/` on longs is a
      // double divide — a float floor would drift from the integer oracle
      // once offsets pass 2^53)
      .withColumn("_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard", expr(s"_offset div ${tokenBudget}L"))
      .drop("_offset")
  }

  /** Mixture balancing: compute per-stratum acceptance rates that reshape
    * the corpus to TARGET proportions (relative weights as exact rationals)
    * while keeping as much data as possible, then apply them through the
    * deterministic content hash (`Dedup.stratifiedSample` semantics — this
    * operator COMPUTES the rates that q35-style static mixing takes as
    * input; the data-mixture step of corpus building, cf. GPT-3 §2.2 /
    * The Pile §1's weighted source sampling, public).
    *
    * With stratum counts n_s and weights w_s = num_s/den_s, the largest
    * total T satisfying T·w_s ≤ n_s for all listed strata is
    * T = min_s ⌊n_s·den_s/num_s⌋; each stratum then keeps
    * m_s = ⌊T·num_s/den_s⌋ ≤ n_s docs — i.e. the binding (most
    * over-demanded) source is kept whole and every other source
    * down-samples to match the target ratios. Strata not in `targets` are
    * dropped (weight 0); a TARGET stratum with no corpus rows fails loud
    * (T = 0 would silently vanish the whole mixture, and the likely cause
    * is a typo'd name). All arithmetic is exact integers (BigInteger for
    * the 2^60-scaled thresholds), so the kept set is reproducible
    * bit-for-bit in any engine.
    *
    * Scale: one count aggregate collected to the driver — bounded by the
    * number of STRATA (sources, ~tens), never rows — then a narrow
    * content-hash filter identical to `hashSample`: no joins, no text
    * shuffle, one corpus scan.
    */
  def balanceMixture(docs: DataFrame, strataCol: String,
      targets: Map[String, (Long, Long)], salt: String = "m0",
      idCol: String = "doc_id"): DataFrame = {
    require(targets.nonEmpty, "balanceMixture: targets must be non-empty")
    targets.foreach { case (s, (num, den)) =>
      require(num > 0 && den > 0, s"weight for '$s' must be positive, got $num/$den") }
    val counts = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = targets.map { case (s, _) => s -> counts.getOrElse(s, 0L) }
    // loud beats wrong: an empty target stratum makes T = 0 — the whole
    // mixture silently vanishes, and the most likely cause is a typo'd
    // stratum name, not a deliberate zero
    n.find(_._2 == 0L).foreach { case (s, _) =>
      throw new IllegalArgumentException(
        s"balanceMixture: target stratum '$s' has no rows in the corpus — " +
          s"no total can satisfy its share (present strata: " +
          s"${counts.keys.toSeq.sorted.take(20).mkString(", ")})")
    }
    val total = targets.map { case (s, (num, den)) => n(s) * den / num }.min
    val thresholds = targets.map { case (s, (num, den)) =>
      val kept = total * num / den // ≤ n(s) by construction of `total`
      s -> java.math.BigInteger.valueOf(kept).shiftLeft(60)
        .divide(java.math.BigInteger.valueOf(n(s))).longValueExact()
    }
    val thrCol = thresholds.toSeq.sortBy(_._1).foldRight(lit(-1L): Column) {
      case ((s, thr), acc) => when(col(strataCol) === s, lit(thr)).otherwise(acc)
    }
    docs.where(TextAnalysis.tokenHash60(
      concat(lit(salt), lit(":"), col(idCol).cast("string"))) < thrCol)
  }

  /** Token-budget subsampling: the deterministic prefix of the corpus in
    * content-hash order whose cumulative token count stays ≤ `budget` —
    * "give me reproducibly ~10B tokens of this corpus" (the sizing step of
    * every training run; hash order makes the subset independent of
    * partitioning AND monotone: a bigger budget only ADDS documents).
    *
    * Semantically: sort by (hash60(salt:id), id), keep while the running
    * token total (inclusive) fits the budget. A 100 TB corpus cannot
    * global-sort for a prefix scan, so the implementation is two passes,
    * neither of which sorts the corpus:
    *   1. bucket the hash space into 2^binBits bins (default 65k); ONE
    *      aggregate gives per-bin token sums (bin-many rows to the
    *      driver); a prefix scan over bins finds the boundary bin where
    *      the budget crosses;
    *   2. keep every doc in bins BELOW the boundary with a narrow filter;
    *      docs IN the boundary bin (~corpus/65k of the data) alone pay a
    *      hash-ordered running sum — a window over one bin-sized group.
    * The result equals the global-sort definition exactly (the oracle IS
    * the global-sort definition).
    */
  def tokenBudgetSample(docs: DataFrame, budget: Long, salt: String = "b0",
      binBits: Int = 16, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(binBits >= 1 && binBits <= 30, s"binBits must be in [1,30], got $binBits")
    val h = TextAnalysis.tokenHash60(
      concat(lit(salt), lit(":"), col(idCol).cast("string")))
    val withH = docs.withColumn("_h", h)
      .withColumn("_bin", shiftright(col("_h"), 60 - binBits))
      .withColumn("_tk", TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val binSums = withH.groupBy(col("_bin"))
      .agg(sum(col("_tk")).as("tk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // prefix over ≤ 2^16 driver rows: first bin whose cumulative total
    // exceeds the budget; bins before it are kept whole
    var acc = 0L
    var boundary = -1L
    var before = 0L
    binSums.foreach { case (bin, tk) =>
      if (boundary < 0) {
        if (acc + tk > budget) { boundary = bin; before = acc }
        else acc += tk
      }
    }
    if (boundary < 0) return docs // whole corpus fits the budget
    val w = Window.orderBy(col("_h"), col(idCol))
    val boundaryKeep = withH.where(col("_bin") === boundary)
      .withColumn("_cum", sum(col("_tk")).over(w))
      .where(col("_cum") <= budget - before)
    withH.where(col("_bin") < boundary).unionByName(boundaryKeep.drop("_cum"))
      .drop("_h", "_bin", "_tk")
  }

  /** LENGTH-DISTRIBUTION FLATTENING: resample the corpus so each token-
    * length quartile contributes equally — the de-biasing step that stops
    * short-doc floods (or a long-doc tail) from dominating a training
    * mix. Everything is exact integers:
    *   - quartile boundaries are DISCRETE: b_q = the smallest length v
    *     with cum_count(≤v)·4 ≥ q·total (no interpolation, no floats);
    *   - bucket(doc) = how many boundaries its length exceeds (ties at a
    *     boundary collapse buckets — degenerate distributions just keep
    *     more data);
    *   - each bucket hash-samples at rate min_bucket/count_b via the
    *     q45 2^60-scaled BigInteger threshold on the salted content
    *     hash — deterministic, partitioning-independent, and
    *     reproducible bit-for-bit in any engine.
    *
    * Scale: one value-count aggregate over the token-length DOMAIN
    * (bounded by the max doc length, not rows) + a 4-row bucket count,
    * both driver-side prefix scans; then one narrow content-hash filter.
    * No joins, no text shuffle, one corpus scan (two until the length
    * projection is cached).
    */
  def lengthBalance(docs: DataFrame, salt: String = "L0",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = docs.withColumn("_n",
      TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val vc = t.groupBy(col("_n")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(vc.nonEmpty, "lengthBalance: empty corpus")
    val total = vc.map(_._2).sum
    def boundary(num: Long): Long = {
      var cum = 0L
      var res = vc.last._1
      var found = false
      vc.foreach { case (v, c) =>
        cum += c
        if (!found && cum * 4L >= num * total) { res = v; found = true }
      }
      res
    }
    val bs = Seq(boundary(1L), boundary(2L), boundary(3L))
    val bucketCol = bs.map(v => when(col("_n") > v, 1L).otherwise(0L))
      .reduce(_ + _)
    val withB = t.withColumn("bucket", bucketCol)
    val cnts = withB.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val m = cnts.values.min
    val thr = cnts.map { case (bk, c) =>
      bk -> java.math.BigInteger.valueOf(m).shiftLeft(60)
        .divide(java.math.BigInteger.valueOf(c)).longValueExact()
    }
    val thrCol = thr.toSeq.sortBy(_._1).foldRight(lit(-1L): Column) {
      case ((bk, th), acc) => when(col("bucket") === bk, lit(th)).otherwise(acc)
    }
    withB.where(TextAnalysis.tokenHash60(
        concat(lit(salt), lit(":"), col(idCol).cast("string"))) < thrCol)
      .select(col(idCol), col("bucket"))
  }

  /** Fixed-size token CHUNKING with overlap — the RAG/embedding prep op:
    * each document becomes chunks of `chunkTokens` tokens starting every
    * `chunkTokens − overlap` tokens (the final chunk holds the remaining
    * ≤ chunkTokens; a tail shorter than `overlap` is still emitted — the
    * contract is positional, not containment-pruned). Emits exact token
    * offsets and the chunk-text md5 so the oracle verifies the REWRITE,
    * not just counts (q40/q54 convention).
    *
    * Scale: fully narrow — one projection, a bounded per-doc explode
    * (n/step chunks), no shuffle, no join; the chunk text never leaves
    * the row it was cut from.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    docs.withColumn("_w", split(col(textCol), " "))
      .withColumn("_n", size(col("_w")))
      .where(col("_n") > 0)
      .withColumn("_start", explode(sequence(lit(0), col("_n") - 1, lit(step))))
      .select(col(idCol),
        expr(s"_start DIV $step").cast("long").as("chunk_idx"),
        col("_start").cast("long").as("start_tok"),
        least(lit(chunkTokens), col("_n") - col("_start")).cast("long").as("n_tok"),
        md5(array_join(slice(col("_w"), col("_start") + 1, lit(chunkTokens)), " ")
          .cast("binary")).as("chunk_md5"))
  }

  /** SEQUENCE PACKING — the pretraining prep op: concatenate the corpus
    * token stream in `idCol` order and cut it into fixed `seqLen`-token
    * training sequences, documents spanning boundaries (the GPT-style
    * pack; no padding, the final sequence alone is short). Emits one row
    * per sequence: how many docs it draws from, its exact token count,
    * and its first/last doc — the manifest a sequence-loader needs.
    *
    * A 100 TB corpus cannot global-sort for the running offset, so the
    * cumsum is q49's two-pass shape on the ID AXIS (ids are monotone in
    * pack order, so id-range bins are contiguous prefix segments):
    *   1. bins = id >> s (s sized so bins ≤ 2^binBits); ONE aggregate
    *      gives per-bin token sums; a driver prefix over ≤ 2^binBits rows
    *      yields each bin's global start offset, joined back broadcast;
    *   2. within-bin running sums are a window PARTITIONED BY bin — no
    *      global ordering anywhere; each doc's global offset is
    *      bin_offset + within_bin_cum − n.
    * The (first_seq..last_seq) span explode is bounded by n/seqLen + 1
    * per doc; the per-sequence aggregate shuffles a few longs.
    */
  def packSequences(docs: DataFrame, seqLen: Int, binBits: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    packSequencesFrom(docs, seqLen, baseOffset = 0L, binBits, idCol, textCol)._1

  /** `packSequences` continued from a running token cursor: offsets start
    * at `baseOffset` (so a CONTINUOUS packer can thread batches through
    * one global tape — `StreamPack`), and the input's total token count
    * returns alongside the manifest for the caller to advance its cursor.
    */
  def packSequencesFrom(docs: DataFrame, seqLen: Int, baseOffset: Long,
      binBits: Int = 16, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, Long) = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(binBits >= 1 && binBits <= 30, s"binBits must be in [1,30], got $binBits")
    val spark = docs.sparkSession
    require(baseOffset >= 0, s"baseOffset must be >= 0, got $baseOffset")
    val maxId = docs.agg(max(col(idCol))).first() match {
      case r if r.isNullAt(0) => return (spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("seq_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_docs",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_tokens",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("first_doc",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("last_doc",
            org.apache.spark.sql.types.LongType)))), 0L)
      case r => r.getLong(0)
    }
    require(maxId >= 0, s"packSequences expects non-negative ids, max was $maxId")
    // shift so the bin count stays ≤ 2^binBits over the observed id range
    var shift = 0
    while ((maxId >> shift) >= (1L << binBits)) shift += 1
    val withB = docs
      .withColumn("_tk", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .where(col("_tk") > 0)
      .withColumn("_bin", shiftright(col(idCol), shift))
    val binSums = withB.groupBy(col("_bin"))
      .agg(sum(col("_tk")).as("tk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = baseOffset
    val offsets = binSums.map { case (bin, tk) =>
      val o = acc; acc += tk; (bin, o)
    }
    val totalTokens = acc - baseOffset
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("_bin", "_binOff"))
    val w = Window.partitionBy(col("_bin")).orderBy(col(idCol))
    val L = seqLen.toLong
    val spanned = withB
      .withColumn("_cum", sum(col("_tk")).over(w))
      .join(offDf, "_bin")
      .withColumn("_off", col("_binOff") + col("_cum") - col("_tk"))
      .withColumn("seq_id", explode(sequence(
        expr(s"_off DIV $L"),
        expr(s"(_off + _tk - 1) DIV $L"))))
      // this doc's token overlap with this sequence's [seq·L, (seq+1)·L)
      .withColumn("_ov",
        least(((col("seq_id") + 1) * L), col("_off") + col("_tk")) -
          greatest(col("seq_id") * L, col("_off")))
    (spanned.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_ov")).as("n_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc")),
      totalTokens)
  }

  /** Nearest-centroid classification over hashed n-gram embeddings: each
    * document is assigned to the stratum whose embedding CENTROID it
    * projects onto most strongly — the cheap semantic-routing /
    * source-attribution primitive (which source does this doc READ like?),
    * and the integer-exact stand-in for embedding-model classification.
    *
    * Mechanics: per-stratum centroid = elementwise sum of the sparse
    * integer `hash_embed` vectors (EXACT integers — no float mean);
    * per-(doc, stratum) scores are integer dots, scaled only at the end by
    * the centroid norm (score = dot/√|C|² — the doc's own norm is constant
    * across strata so argmax is unaffected but the emitted score stays
    * q22-convention comparable); argmax ties break on stratum name. Docs
    * whose embedding is all-zero (< n tokens) are unclassifiable and
    * dropped, like every hashed-embedding operator here. CONTRACT: the
    * dot join is INNER on dim, so a stratum sharing NO nonzero dimension
    * with the doc is excluded from that doc's argmax (it has zero evidence
    * either way — it does not enter as score 0, which would otherwise win
    * over all-negative present scores); a doc sharing no dimension with
    * ANY stratum is dropped entirely. OpsSpec's model and the DuckDB
    * mirror both encode these semantics.
    *
    * Scale: the sparse explode is narrow; centroids are (strata × dims)
    * rows — broadcast back; scores shuffle (id, stratum, partial-dot)
    * with map-side combine; never a row wider than a few longs. One
    * corpus scan for centroids, one for scores (cache the sparse
    * projection to make it one).
    */
  def centroidClassify(docs: DataFrame, strataCol: String = "source",
      dims: Int = 256, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // r7 rewrite, semantics UNCHANGED (OpsSpec model + DuckDB mirror pin
    // them): the former plan exploded every (doc, dim), joined centroids on
    // `dim` with a ×strata row fan-out (docs·dims·strata rows through an
    // exchange), re-aggregated by (id, stratum) and ran a window argmax —
    // four shuffles and the battery's single most expensive plan. Centroids
    // are a (strata × dims)-BOUNDED aggregate, so they collect to the
    // driver (the balanceMixture precedent) and ride back into ONE narrow
    // codegen'd pass (`centroid_argmax`) that computes every stratum's dot,
    // the shared-dim evidence mask, Spark-Round-exact scores and the
    // (score desc, name asc) argmax per row — no dim join, no window, and
    // the only remaining shuffle is the tiny centroid aggregate itself.
    // The base projection is cached: the centroid aggregate and the scoring
    // pass both consume it, so text is read and hash-embedded ONCE (the
    // q11/q12 convention; callers release via spark.catalog.clearCache).
    val base = docs.select(col(idCol).as("id"), col(strataCol).as("s"),
        call_function("hash_embed", col(textCol), lit(dims), lit(n)).as("v"))
      .withColumn("n2", call_function("dot_i64", col("v"), col("v")))
      .where(col("n2") > 0)
      .select(col("id"), col("s"), col("v"))
      .cache()
    val centRows = base
      .select(col("s"), posexplode(col("v")).as(Seq("dim", "x")))
      .where(col("x") =!= 0)
      .groupBy(col("s"), col("dim")).agg(sum(col("x")).as("c"))
      .collect()
    val byStratum = centRows.groupBy(_.getString(0))
    // a degenerate all-zero centroid (every dim's signs cancel — possible
    // for a tiny stratum) would score 0/√0 = NaN, and NaN orders FIRST in
    // a descending sort — excluding it (cn2 > 0, as before) keeps the
    // argmax well-defined and engine-neutral
    val strata = byStratum.toSeq
      .map { case (s, rows) =>
        val cvec = new Array[Long](dims)
        val present = new Array[Boolean](dims)
        var cn2 = 0L
        rows.foreach { r =>
          val d = r.getInt(1); val c = r.getLong(2)
          cvec(d) = c; present(d) = true; cn2 += c * c
        }
        (s, cvec, present, cn2)
      }
      .filter(_._4 > 0L)
      .sortBy(_._1)
    val model = new graft.functions.VectorKernels.StrataCentroids(
      strata.map(_._1).toArray, strata.map(_._2).toArray,
      strata.map(_._3).toArray,
      strata.map(t => math.sqrt(t._4.toDouble)).toArray)
    base.select(col("id"),
        graft.functions.VectorFunctions.centroidArgmax(col("v"), model).as("_am"))
      .where(col("_am.pred").isNotNull)
      .select(col("id").as(idCol), col("_am.pred").as("pred"),
        col("_am.score").as("score"))
  }

  /** Cross-source n-gram overlap matrix: for every source pair, how many
    * distinct word n-grams they share — the corpus-forensics report that
    * finds mirrored / syndicated content BETWEEN sources before doc-level
    * dedup runs within them (the cross-split cousin of `decontaminate`).
    *
    * Scale: grams explode scan-side and immediately collapse to distinct
    * (source, gram-HASH) — after the projection the text never moves; the
    * self-join shuffles 8-byte hashes keyed by gram, and the output is
    * sources² rows (tiny). A 64-bit xxhash64 fingerprint stands in for
    * the gram text — internal join key only, so the cheap codegen'd hash
    * applies (the q11/q12 re-key convention; a collision could over-count
    * one shared gram, ~grams²/2^64, and the oracle joining on gram TEXT
    * would catch it).
    */
  def sourceOverlap(docs: DataFrame, n: Int = 8,
      strataCol: String = "source", textCol: String = "text"): DataFrame = {
    // r7b (one exchange, no self-join): aggregate each gram's DISTINCT
    // source set (collect_set dedups, so the former (s, h)-distinct
    // exchange is subsumed), then expand the ordered source pairs
    // NARROWLY per gram and count. Identical output: a (a, b) row per
    // gram with a < b both present ⟺ the old self-join row; counts are
    // distinct-shared-gram counts either way. The set is bounded by the
    // strata domain (sources), so per-gram state is tiny at any corpus
    // size — one shuffle on the 8-byte gram hash replaces the old
    // distinct exchange + both self-join exchanges. array_sort on
    // strings uses the same binary ordering as the old a.s < b.s
    // predicate.
    val g = docs.select(col(strataCol).as("s"),
        explode(call_function("word_ngrams", col(textCol), lit(n))).as("gram"))
      .select(col("s"), xxhash64(col("gram")).as("h"))
    val perGram = g.groupBy(col("h")).agg(collect_set(col("s")).as("ss"))
    val sorted = array_sort(col("ss"))
    val pairs = flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)),
        y => struct(x.as("a"), y.as("b")))))
    perGram.where(size(col("ss")) >= 2)
      .select(explode(pairs).as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
