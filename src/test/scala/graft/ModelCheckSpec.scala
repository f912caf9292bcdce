package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.pipeline.Joins

/** Seeded randomized model checks: each operator is compared against a
  * direct in-memory reference implementation over many generated cases —
  * the fixture corpora can't reach every tie/edge regime, generated inputs
  * do (deterministic seeds, so failures reproduce).
  */
class ModelCheckSpec extends SparkSpec {

  test("as-of join == per-key reference model over random ties and gaps") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (round <- 0 until 5) {
      val nL = 40 + rnd.nextInt(40)
      val nR = 40 + rnd.nextInt(40)
      // few keys + tiny ts range → dense equal-ts collisions
      val left = (0 until nL).map(i =>
        (s"k${rnd.nextInt(4)}", rnd.nextInt(12).toLong, 1000L + i))
      val right = (0 until nR).map(i =>
        (s"k${rnd.nextInt(5)}", rnd.nextInt(12).toLong, 2000L + i))
      val strict = round % 2 == 1
      val got = Joins.asOfJoin(
        left.toDF("k", "t", "id"), right.toDF("k", "t", "id"),
        "k", "t", "id", strict = strict)
        .select(col("id"), col("asof.id"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val want = left.map { case (k, t, id) =>
        val cand = right.filter(r => r._1 == k && (if (strict) r._2 < t else r._2 <= t))
        id -> (if (cand.isEmpty) -1L else cand.maxBy(r => (r._2, r._3))._3)
      }.toMap
      assert(got == want, s"round=$round strict=$strict")
    }
  }

  test("dedup clustering == union-find reference on random graphs (both paths)") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    for (round <- 0 until 4) {
      val nodes = 5 + rnd.nextInt(25)
      val edges = (0 until nodes * 2).map { _ =>
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong)
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        // reference union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        // driver union-find path AND the distributed propagation path
        for (cap <- Seq(Long.MaxValue, 0L)) {
          val got = Dedup.dedupClusters(edges.toDF("id1", "id2"), driverMaxEdges = cap)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == want, s"round=$round cap=$cap")
        }
      }
    }
  }

  test("top_bigram_frac kernel == direct count model on random token strings") {
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 50) {
      val n = 1 + rnd.nextInt(30)
      val words = (0 until n).map(_ => s"w${rnd.nextInt(4)}")
      val text = words.mkString(" ")
      val got = graft.functions.HashingKernels.topBigramFrac(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val want =
        if (n < 2) 0.0
        else {
          val bi = words.sliding(2).map(_.mkString(" ")).toSeq
          bi.groupBy(identity).values.map(_.size).max.toDouble / bi.size
        }
      assert(got == want, s"text='$text'")
    }
  }

  test("duplicateSpans == brute-force window model on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(3131)
    for (round <- 0 until 4) {
      val nDocs = 4 + rnd.nextInt(6)
      val k = 2 + rnd.nextInt(3) // window 2..4 tokens
      // tiny vocab → dense window collisions across and within docs
      val corpus = (0 until nDocs).map { d =>
        val n = rnd.nextInt(12) // may be < k (no windows)
        (d.toLong, (0 until n).map(_ => s"t${rnd.nextInt(3)}").mkString(" "))
      }
      val (minDocs, minOcc) = if (round % 2 == 0) (2, 2) else (1, 2)
      val got = Dedup.duplicateSpans(corpus.toDF("doc_id", "text"),
          k = k, minDocs = minDocs, minOcc = minOcc)
        .select("id", "pos").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      // reference model: every window occurrence, grouped by window text
      val occ = corpus.flatMap { case (id, text) =>
        val w = text.split(" ", -1)
        if (w.length < k) Seq.empty
        else w.sliding(k).zipWithIndex.map { case (win, i) => (win.mkString(" "), id, i) }.toSeq
      }
      val want = occ.groupBy(_._1).values.filter { os =>
        os.map(_._2).distinct.size >= minDocs && os.size >= minOcc
      }.flatten.map(o => (o._2, o._3)).toSet
      assert(got == want, s"round=$round k=$k minDocs=$minDocs corpus=$corpus")
    }
  }

  test("knnJoinBucketed == in-memory top-k model on random clustered corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(5151)
    for (round <- 0 until 3) {
      // clustered Gaussian corpus (IVF's favorable regime) + pure-noise
      // probes (its adversarial one) so both prune-heavy and expand-heavy
      // probe plans occur; dims small → dense cosine ties near 0
      val dim = 8
      val nClusters = 3 + rnd.nextInt(3)
      val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 3))
      val corpus = (0 until 120 + rnd.nextInt(80)).map { i =>
        val c = centers(rnd.nextInt(nClusters))
        (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat).toSeq)
      }
      val probes = (0 until 10).map(i =>
        (1000L + i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
      val k = 1 + rnd.nextInt(5)
      val nlist = 2 + rnd.nextInt(6)
      val nProbe = 1 + rnd.nextInt(2)
      val got = graft.ops.Similarity.knnJoinBucketed(
          corpus.toDF("vec_id", "embedding"),
          probes.toDF("qid", "qvec"), k = k, nlist = nlist, nProbe = nProbe)
        .select("qid", "vec_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // reference model: exact per-probe cosine ranking in plain Scala
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
        dot / (na * nb)
      }
      val want = probes.flatMap { case (qid, qv) =>
        corpus.map { case (id, v) => (id, cos(v, qv)) }
          .sortBy { case (id, c) => (-c, id) }
          .take(k).zipWithIndex
          .map { case ((id, _), i) => (qid, id, i + 1) }
      }.toSet
      assert(got == want, s"round=$round k=$k nlist=$nlist nProbe=$nProbe")
      spark.catalog.clearCache()
    }
  }

  test("containmentPairs == brute-force model; catches snippets jaccard misses") {
    import spark.implicits._
    val rnd = new scala.util.Random(6060)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (round <- 0 until 3) {
      val base = (0 until 30).map { i =>
        (i.toLong, Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // inject true containments: short docs that are substrings of longer ones
      val snippets = (0 until 6).map { j =>
        val (_, t) = base(rnd.nextInt(base.size))
        val w = t.split(" ")
        val s = rnd.nextInt(math.max(1, w.length - 5))
        (100L + j, w.slice(s, s + 5 + rnd.nextInt(w.length - s)).mkString(" "))
      }
      val docs = base ++ snippets
      val (tN, tD) = (1L + rnd.nextInt(4).toLong, 5L)
      val got = graft.ops.Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          n = 3, tNum = tN, tDen = tD)
        .select("contained", "container").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def gs(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val want = (for {
        (i, ti) <- docs; (j, tj) <- docs if i != j
        gi = gs(ti); inter = (gi & gs(tj)).size
        if gi.nonEmpty && inter * tD >= tN * gi.size
      } yield (i, j)).toSet
      assert(got == want, s"round=$round t=$tN/$tD got=${got.size} want=${want.size}")
      // the asymmetry is load-bearing: at a high threshold some contained
      // snippet must appear whose REVERSE orientation does not
      val high = graft.ops.Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          n = 3, tNum = 9L, tDen = 10L)
        .select("contained", "container").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(high.exists { case (a, b) => a >= 100L && !high.contains((b, a)) },
        s"round=$round: expected an asymmetric containment among the snippets")
    }
  }

  test("winnowFingerprints == brute-force rightmost-min model; match guarantee holds") {
    import spark.implicits._
    val rnd = new scala.util.Random(6161)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    def hash60(s: String): Long =
      java.lang.Long.parseLong(graft.functions.HashingKernels.md5hex(s).substring(0, 15), 16)
    for (round <- 0 until 3) {
      val k = 2 + rnd.nextInt(3)
      val w = 2 + rnd.nextInt(4)
      // random docs + one pair sharing a planted run of exactly w+k-1 tokens
      val run = Seq.fill(w + k - 1)(vocab(rnd.nextInt(vocab.size)))
      def doc(): Seq[String] = Seq.fill(6 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.size)))
      val docs = (0 until 20).map(i => (i.toLong, doc().mkString(" "))) ++
        Seq((50L, (doc() ++ run ++ doc()).mkString(" ")),
            (51L, (doc() ++ run ++ doc()).mkString(" ")))
      val got = graft.ops.Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), k, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val want = docs.flatMap { case (id, t) =>
        val wd = t.split(" ")
        val fps = wd.sliding(k).filter(_.length == k).zipWithIndex
          .map { case (g, i) => (i, hash60(g.mkString(" "))) }.toVector
        (0 to fps.length - w).map { j =>
          val win = fps.slice(j, j + w)
          val m = win.map(_._2).min
          val (p, f) = win.filter(_._2 == m).last  // rightmost min
          (id, p, f)
        }
      }.toSet
      assert(got == want, s"round=$round k=$k w=$w got=${got.size} want=${want.size}")
      // winnowing guarantee: the planted w+k-1-token run forces >= 1 shared fp
      val f50 = got.collect { case (50L, _, f) => f }
      val f51 = got.collect { case (51L, _, f) => f }
      assert((f50 & f51).nonEmpty, s"round=$round: planted run must share a fingerprint")
    }
  }

  test("gramNovelty == exact-rational reference model on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(6262)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (round <- 0 until 3) {
      val docs = (0 until 40).map(i =>
        (i.toLong, Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val (rN, rD) = (1L + rnd.nextInt(3).toLong, 2L + rnd.nextInt(3).toLong)
      val (bN, bD) = (2L + rnd.nextInt(3).toLong, 1L + rnd.nextInt(2).toLong)
      val got = graft.ops.TextAnalysis.gramNovelty(docs.toDF("doc_id", "text"),
          n = 3, rareNum = rN, rareDen = rD, boilNum = bN, boilDen = bD)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3), r.getBoolean(4))).toSet
      def gs(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val sets = docs.map { case (i, t) => i -> gs(t) }.filter(_._2.nonEmpty)
      val df = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val per = sets.map { case (i, g) => (i, g.size.toLong, g.iterator.map(df).sum) }
      val tng = per.map(_._2).sum
      val tdf = per.map(_._3).sum
      val want = per.map { case (i, ng, sdf) =>
        (i, ng, BigInt(sdf) * tng * rD < BigInt(ng) * tdf * rN,
          BigInt(sdf) * tng * bD > BigInt(ng) * tdf * bN)
      }.toSet
      assert(got == want, s"round=$round rare=$rN/$rD boil=$bN/$bD")
    }
  }

  test("cosineSelfJoin == brute-force pair model on clustered and uniform corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(5959)
    for (round <- 0 until 3) {
      val dim = 8
      // half clustered (pairs abound inside cells), half uniform noise
      // (pairs straddle cell boundaries — the replication path must catch
      // them); tiny nlist forces heavy replication, large nlist forces
      // cross-cell meetings
      val nClusters = 2 + rnd.nextInt(3)
      val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 2))
      val vecs = (0 until 80 + rnd.nextInt(60)).map { i =>
        if (i % 2 == 0) {
          val c = centers(rnd.nextInt(nClusters))
          (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.6).toFloat).toSeq)
        } else (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
      }
      val threshold = 0.3 + rnd.nextDouble() * 0.5
      val nlist = 2 + rnd.nextInt(10)
      val got = graft.ops.Similarity.cosineSelfJoin(
          vecs.toDF("vec_id", "embedding"), threshold, nlist = nlist)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
          math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
      }
      val want = (for {
        (i, vi) <- vecs; (j, vj) <- vecs if i < j && cos(vi, vj) >= threshold
      } yield (i, j)).toSet
      assert(got == want,
        s"round=$round t=$threshold nlist=$nlist got=${got.size} want=${want.size}")
    }
  }

  test("corpus assembly ops == reference models on random corpora and budgets") {
    import spark.implicits._
    import graft.ops.Corpus
    def hash60(s: String): Long =
      java.lang.Long.parseLong(graft.functions.HashingKernels.md5hex(s).substring(0, 15), 16)
    val rnd = new scala.util.Random(31337)
    for (round <- 0 until 4) {
      // random corpus: variable token counts (incl. 1-token docs), skewed
      // strata (incl. singleton strata), sparse ids
      val n = 50 + rnd.nextInt(100)
      val rows = (0 until n).map { i =>
        val id = i.toLong * (1 + rnd.nextInt(3))
        val toks = 1 + rnd.nextInt(40)
        val s = s"s${rnd.nextInt(1 + rnd.nextInt(6))}"
        (id, s, Seq.fill(toks)(s"w${rnd.nextInt(50)}").mkString(" "))
      }.distinctBy(_._1)
      val df = rows.toDF("doc_id", "source", "text")
      val tk = rows.map(r => r._1 -> r._3.split(" ").length.toLong).toMap

      // packShards vs cumulative model (random budget + writer count incl. 1)
      val budget = 1L + rnd.nextInt(200)
      val writers = 1 + rnd.nextInt(6)
      val gotPack = Corpus.packShards(df, budget, writers)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
      val wantPack = rows.map(_._1).groupBy(id => hash60(s"w0:$id") % writers)
        .flatMap { case (w, ids) =>
          var acc = 0L
          ids.sorted.map { id =>
            val off = acc; acc += tk(id); id -> (w, off / budget)
          }
        }
      assert(gotPack == wantPack, s"packShards round=$round budget=$budget writers=$writers")

      // tokenBudgetSample vs sort-prefix model, budget hitting an EXACT
      // prefix-sum boundary (the <= edge) plus a random one
      val order = rows.map(_._1).sortBy(id => (hash60(s"b0:$id"), id))
      val prefix = order.scanLeft(0L)((a, id) => a + tk(id)).drop(1)
      val exactBoundary = prefix(rnd.nextInt(order.length))
      for (b <- Seq(exactBoundary, rnd.nextLong(prefix.last + 10).abs)) {
        val got = Corpus.tokenBudgetSample(df, b, binBits = 2 + rnd.nextInt(6))
          .collect().map(_.getLong(0)).toSet
        val want = order.zip(prefix).takeWhile(_._2 <= b).map(_._1).toSet
        assert(got == want, s"tokenBudget round=$round budget=$b")
      }

      // balanceMixture vs exact integer model; an ABSENT target stratum
      // must fail loud (T = 0 would silently vanish the mixture — the
      // likely cause is a typo'd name)
      if (round == 0) {
        val e = intercept[IllegalArgumentException] {
          Corpus.balanceMixture(df, "source",
            Map("s0" -> ((1L, 2L)), "sAbsent" -> ((1L, 2L))))
        }
        assert(e.getMessage.contains("sAbsent"))
      }
      // target only strata the generated corpus actually contains
      val targets = rows.map(_._2).distinct.sorted.take(3).map(s =>
        s -> ((1L + rnd.nextInt(5), 1L + rnd.nextInt(9) + 1L))).toMap
      val bySrc = rows.groupBy(_._2)
      val nS = targets.map { case (s, _) => s -> bySrc.get(s).map(_.size.toLong).getOrElse(0L) }
      val total = targets.map { case (s, (num, den)) => nS(s) * den / num }.min
      val wantMix = targets.toSeq.flatMap { case (s, (num, den)) =>
        val kept = total * num / den
        val thr = if (nS(s) == 0) 0L
          else java.math.BigInteger.valueOf(kept).shiftLeft(60)
            .divide(java.math.BigInteger.valueOf(nS(s))).longValueExact()
        bySrc.getOrElse(s, Seq.empty).map(_._1).filter(id => hash60(s"m0:$id") < thr)
      }.toSet
      val gotMix = Corpus.balanceMixture(df, "source", targets)
        .collect().map(_.getLong(0)).toSet
      assert(gotMix == wantMix, s"balanceMixture round=$round (total=$total)")
    }
  }

  test("stratified sampling: monotone nesting across random rational rates") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rnd = new scala.util.Random(2026)
    val rates = (0 until 5).map(_ => (1L + rnd.nextInt(7), 8L)).sortBy(r => r._1)
    val idSets = rates.map { r =>
      Dedup.stratifiedSample(docs, "source", Map.empty, defaultRate = r)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    idSets.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo.subsetOf(hi), "rate increase must only add docs")
      case _ =>
    }
  }
}
