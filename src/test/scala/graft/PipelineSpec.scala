package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup
import graft.sim.Ann
import graft.text.TextOps

class PipelineSpec extends SparkSpec {

  private def docs: DataFrame = Tables.load(spark, sfDir, "documents")
  private def emb: DataFrame = Tables.load(spark, sfDir, "embeddings")

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("verdict operators ignore phantom empty tokens from irregular whitespace") {
    import spark.implicits._
    import graft.text.TextOps
    // "the  cat" (doubled space) splits to ["the", "", "cat"]: the
    // phantom "" must not count as a word anywhere a RATIO or VERDICT
    // is computed (r11 corpus-blind fix — the registered corpora are
    // single-spaced, so only this payload sees it)
    val d = Seq((1L, "the  dog and  the cat is  here of it"),
        (2L, " the dog ")).toDF("doc_id", "text")
    val q = TextOps.quality(d).where(col("doc_id") === 1).collect().head
    assert(q.getAs[Long]("n_tokens") == 9L, q.toString) // not 11
    val lid = TextOps.langId(d).where(col("doc_id") === 2).collect().head
    // 2 real words, 1 marker -> 0.5, not 1/4
    assert(lid.getAs[Double]("en_ratio") == 0.5, lid.toString)
    val g = graft.text.TextOps.gopherRules(d, minWords = 1L, minStopHits = 1L)
      .where(col("doc_id") === 2).collect().head
    assert(g.getAs[Long]("n_words") == 2L, g.toString)
    // mean word length over REAL words: (3 + 3) / 2
    assert(g.getAs[Long]("mean_len_micro") == 3000000L, g.toString)
    // bigramLogProb: every doc gets a row — a one-word doc reports
    // zero bigrams and a NULL mean instead of vanishing
    val one = Seq((1L, "word"), (2L, "two words here")).toDF("doc_id", "text")
    val bl = TextOps.bigramLogProb(one).orderBy("doc_id").collect()
    assert(bl.length == 2, bl.mkString(","))
    assert(bl.head.getAs[Long]("n_bigrams") == 0L &&
      bl.head.isNullAt(bl.head.fieldIndex("avg_neg_log10p")), bl.head.toString)
    assert(bl(1).getAs[Long]("n_bigrams") == 2L, bl(1).toString)
  }

  test("langId: zero-token documents score 0.0 / 'other', never NULL") {
    import spark.implicits._
    // empty and whitespace-only text give size(words) = 0 — the
    // unguarded 0/0 was NULL in Spark vs inf/NaN-class in DuckDB (the
    // r12 ADVICE divergence); the greatest(n, 1) guard pins BOTH
    // engines to the documented verdict: no tokens = no evidence of
    // English = 0.0 / 'other'
    val d = Seq((1L, ""), (2L, "   "), (3L, "the of and")).toDF("doc_id", "text")
    val got = TextOps.langId(d).orderBy("doc_id")
      .select("doc_id", "en_ratio", "pred_lang")
      .as[(Long, Double, String)].collect().toSeq
    assert(got == Seq((1L, 0.0, "other"), (2L, 0.0, "other"),
      (3L, 1.0, "en")), got.mkString(","))
  }

  test("curate: every document gets an audit row, zero-token docs included") {
    import spark.implicits._
    // TextOps.quality emits no row for zero-token docs (stats come
    // from exploded tokens) — the audit's inner join silently dropped
    // them (r12 review): a "why was this page dropped" lookup found
    // NOTHING. Now left-joined: n_tokens 0 / quality 0.0 / kept false.
    val d = Seq(
      (1L, "the a of and in to is the a of and in to is"), // en, keeper
      (7L, "   "),                                          // zero tokens
      (9L, "")                                              // empty
    ).toDF("doc_id", "text")
    // doc 1 scores quality 0.07 (14 tokens, 7 distinct) — gate below it
    val audit = graft.pipeline.Curation.curate(d, minQuality = 0.05, minTokens = 5)
      .orderBy("doc_id").collect()
    assert(audit.length == 3, s"audit rows ${audit.length} != 3 (docs)")
    val empty = audit.filter(r => Set(7L, 9L)(r.getAs[Long]("doc_id")))
    assert(empty.forall(r => r.getAs[Long]("n_tokens") == 0L &&
      r.getAs[Double]("quality") == 0.0 && !r.getAs[Boolean]("kept")),
      empty.mkString(","))
    assert(audit.head.getAs[Boolean]("kept"), audit.head.toString)
  }

  test("salted samplers decorrelate composed stages; salt 0 is the unsalted hash") {
    import spark.implicits._
    import graft.pipeline.DataPrep
    val d = (0L until 4000L).map(i => (i, "s")).toDF("doc_id", "src")
    // salt = 0 must reproduce the historical unsalted selection
    val s0 = DataPrep.sampleStratified(d, "doc_id", "src", Map("s" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    val s0b = DataPrep.sampleStratified(d, "doc_id", "src", Map("s" -> 0.3), salt = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(s0 == s0b)
    // same salt composed: stage 2 at 0.5 over stage-1 survivors keeps
    // ~ALL of them (full correlation — the r12 review's skew); a
    // distinct salt restores ~half
    val stage1 = DataPrep.sampleStratified(d, "doc_id", "src", Map("s" -> 0.3))
    val sameSalt = DataPrep.sampleStratified(stage1, "doc_id", "src",
      Map("s" -> 0.5)).count().toDouble
    val newSalt = DataPrep.sampleStratified(stage1, "doc_id", "src",
      Map("s" -> 0.5), salt = 7L).count().toDouble
    val n1 = stage1.count().toDouble
    assert(sameSalt / n1 > 0.95, s"same-salt kept ${sameSalt / n1} (expected ~1: correlated)")
    assert(newSalt / n1 > 0.35 && newSalt / n1 < 0.65,
      s"salted kept ${newSalt / n1} (expected ~0.5: decorrelated)")
  }

  test("NULL keys never conflate: exact/urlDedup/incremental treat missing content as unique") {
    import spark.implicits._
    import graft.dedup.Dedup
    // three NULL-text docs are NOT copies of each other (r12 review:
    // md5(NULL) grouped them under one keeper)
    val d = Seq((1L, Some("same")), (2L, Some("same")),
      (3L, None), (4L, None), (5L, None)).toDF("doc_id", "text")
    val ex = Dedup.exact(d).orderBy("keeper")
      .as[(Long, Long)].collect().toSeq
    assert(ex == Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)), ex.mkString(","))
    // urlDedup: NULL-url captures each their own keeper
    val u = Seq((1L, Some("https://a.com/x")), (2L, Some("https://a.com/x")),
      (3L, None), (4L, None)).toDF("doc_id", "url")
    val ud = Dedup.urlDedup(u).orderBy("keeper")
      .select("keeper", "n_copies").as[(Long, Long)].collect().toSeq
    assert(ud == Seq((1L, 2L), (3L, 1L), (4L, 1L)), ud.mkString(","))
    // incremental: NULL-text shard docs all report kept, never
    // dup_in_batch of each other
    val corpus = Seq((100L, "kept text")).toDF("doc_id", "text")
    val shard = Seq((10L, null.asInstanceOf[String]),
      (11L, null.asInstanceOf[String]), (12L, "kept text")).toDF("doc_id", "text")
    val inc = Dedup.incremental(corpus, shard)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(inc(10L) == "kept" && inc(11L) == "kept" &&
      inc(12L) == "dup_in_corpus", inc.toString)
  }

  test("non-finite vectors are excluded from search; NULL labels mine as their own class") {
    import spark.implicits._
    import graft.sim.Ann
    val nan = Array(Double.NaN, 1.0, 0.0)
    val v = Seq((1L, Array(1.0, 0.0, 0.0), Some(0L)),
      (2L, Array(0.9, 0.1, 0.0), Some(1L)),
      (9L, nan, Some(1L))).toDF("vec_id", "embedding", "label")
    val q = v.where(col("vec_id") === 1L)
    // without the allFinite guard the NaN vector ranked FIRST (Spark
    // orders NaN above every number) — it must not appear at all
    val bf = Ann.bruteForce(v, q, 2).select("nn_id").as[Long].collect().toSet
    assert(!bf.contains(9L), s"NaN vector surfaced: $bf")
    val rs = Ann.rangeSearch(v, q, 0.5).select("nn_id").as[Long].collect().toSet
    assert(!rs.contains(9L), s"NaN vector passed the threshold: $rs")
    // NULL label = its own class (null-safe <=>): the NULL-labeled
    // query still mines labeled vectors; plain =!= vanished it
    val vl = Seq((1L, Array(1.0, 0.0), Some(0L)), (2L, Array(0.9, 0.1), Some(1L)),
      (3L, Array(0.8, 0.2), None)).toDF("vec_id", "embedding", "label")
    val hn = Ann.hardNegatives(vl, vl.where(col("vec_id") === 3L), 2)
      .select("nn_id").as[Long].collect().toSet
    assert(hn == Set(1L, 2L), s"NULL-labeled query mined $hn")
  }

  test("eval_pass_at_k matches an exact BigInt re-implementation; boundary arms correct") {
    import spark.implicits._
    // independent oracle: per-task pass@k recomputed driver-side with
    // BigInt falling factorials (no shared expression with the query)
    val got = SparkEntry.queries("eval_pass_at_k")(spark, sfDir)
      .as[(Long, Long, Long, Int, Long)].collect()
    assert(got.nonEmpty)
    def passAtK(n: Long, c: Long, k: Int): Long =
      if (n - c < k) 1000000L
      else {
        val num = (0 until k).map(i => BigInt(n - c - i)).product
        val den = (0 until k).map(i => BigInt(n - i)).product
        (BigInt(1000000) - (num * 1000000 / den)).toLong
      }
    got.foreach { case (task, n, c, k, ppm) =>
      assert(ppm == passAtK(n, c, k), s"task $task n=$n c=$c k=$k: $ppm")
    }
    // hand arithmetic pins the estimator itself: n=10, c=3 →
    // pass@1 = 1 − 7/10 = 0.3; pass@5 = 1 − C(7,5)/C(10,5) = 11/12
    assert(passAtK(10, 3, 1) == 300000L)
    assert(passAtK(10, 3, 5) == 916667L) // 1e6 − 2520e6 div 30240
    assert(passAtK(10, 0, 5) == 0L)      // no correct samples
    assert(passAtK(10, 7, 5) == 1000000L) // n − c < k: certain

    // the decimal(38) widening stays exact PAST the old int64 bound:
    // sf1 lands n=1000 per task (the first cut raise_error'd on it),
    // and the contract holds to n=1e6 — both pinned against the
    // BigInt oracle through the SAME shared expression the query runs
    val wide = Seq((0L, 1000L, 250L, 1), (1L, 1000L, 250L, 5),
        (2L, 1000L, 998L, 5), (3L, 1000000L, 123456L, 5))
      .toDF("task", "n", "c", "k")
      .withColumn("pass_at_k_ppm", expr(graft.pipeline.PipelineQueries.passAtKPpm))
      .select("n", "c", "k", "pass_at_k_ppm")
      .as[(Long, Long, Int, Long)].collect()
    wide.foreach { case (n, c, k, ppm) =>
      assert(ppm == passAtK(n, c, k), s"wide n=$n c=$c k=$k: $ppm")
    }

    // the k-guard is LOUD for any k without a hard-coded arm —
    // INCLUDING NULL, whose three-valued logic previously made both
    // guard arms and the k=1 arm UNKNOWN and fell through to silently
    // compute the k=5 value (r13 review)
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => String.valueOf(e.getMessage)).mkString(" | ")
    def guardRaises(kDf: DataFrame): Unit = {
      val e = intercept[Throwable] {
        kDf.withColumn("ppm", expr(graft.pipeline.PipelineQueries.passAtKPpm))
          .collect()
      }
      assert(chain(e).contains("eval_pass_at_k"), chain(e))
    }
    guardRaises(Seq((0L, 10L, 3L, 3)).toDF("task", "n", "c", "k"))
    guardRaises(Seq((0L, 10L, 3L, Option.empty[Int]))
      .toDF("task", "n", "c", "k"))
    // ...and the symmetric NULL-n / NULL-c holes (r13 review): the
    // widening guard goes UNKNOWN and every value arm yields NULL ppm
    guardRaises(Seq((0L, Option.empty[Long], 3L, 1))
      .toDF("task", "n", "c", "k"))
    guardRaises(Seq((0L, 10L, Option.empty[Long], 5))
      .toDF("task", "n", "c", "k"))
  }

  test("eval_rouge_n matches a Scala set re-implementation on the corpus") {
    import spark.implicits._
    val got = SparkEntry.queries("eval_rouge_n")(spark, sfDir)
      .select("cand_id", "ref_id", "n_common", "recall_ppm", "f1_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val texts = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    def bigrams(t: String): Set[String] = {
      val w = t.split(" ", -1) // keep empties: the shingle tokenizer's raw split
      if (w.length < 2) Set.empty
      else w.sliding(2).map(_.mkString(" ")).toSet
    }
    got.foreach { case (cand, ref, common, recall, f1) =>
      val cs = bigrams(texts(cand)); val rs = bigrams(texts(ref))
      val inter = (cs & rs).size.toLong
      assert(common == inter, s"pair ($cand,$ref): $common != $inter")
      assert(recall == inter * 1000000L / rs.size, s"recall of ($cand,$ref)")
      if (inter == 0) assert(f1 == 0L)
    }
  }

  test("eval_bleu matches a Scala multiset re-implementation; identical texts score 0") {
    import spark.implicits._
    // independent oracle: clipped counts via Scala multiset min, the
    // micro-log identity recomputed with strict math — no shared
    // expression with the query
    def mlog(x: Long): Long = math.floor(math.log10(x.toDouble) * 1e6).toLong
    def bleuRef(cand: String, ref: String): (Seq[Long], Long) = {
      val ct = cand.split(" ", -1); val rt = ref.split(" ", -1)
      def grams(t: Array[String], n: Int): Seq[String] =
        if (t.length < n) Seq.empty
        else t.sliding(n).map(_.mkString(" ")).toSeq
      val mt = (1 to 4).map { n =>
        val cg = grams(ct, n).groupBy(identity).map { case (k, v) => k -> v.size }
        val rg = grams(rt, n).groupBy(identity).map { case (k, v) => k -> v.size }
        val m = cg.map { case (gr, c) => math.min(c, rg.getOrElse(gr, 0)) }.sum.toLong
        (m, math.max(ct.length - n + 1, 0).toLong)
      }
      val bp = if (ct.length >= rt.length) 0L
        else math.floor(((1.0 - rt.length.toDouble / ct.length)
          * 0.43429448190325176) * 1000000).toLong
      val slog = mt.map { case (m, t) => mlog(m + 1) - mlog(t + 1) }.sum
      (mt.map { case (m, t) => m * 1000000L / math.max(t, 1L) }, bp + slog / 4)
    }
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("eval_bleu")(spark, sfDir)
      .select("cand_id", "ref_id", "p1_ppm", "p2_ppm", "p3_ppm", "p4_ppm",
        "bleu_mlog_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (cand, ref, p1, p2, p3, p4, bleu) =>
      val (ps, b) = bleuRef(texts(cand), texts(ref))
      assert(Seq(p1, p2, p3, p4) == ps, s"pair ($cand,$ref) precisions")
      assert(bleu == b, s"pair ($cand,$ref) bleu: $bleu != $b")
    }
    // the estimator's fixed points, hand-derived: identical texts →
    // every m_n = t_n and c = r, so log-BLEU is exactly 0 (BLEU = 1);
    // a short candidate against a longer reference pays a NEGATIVE
    // brevity term even at perfect precision
    assert(bleuRef("a b c d e", "a b c d e")._2 == 0L)
    val (pShort, bShort) = bleuRef("a b c d", "a b c d e")
    assert(pShort.head == 1000000L && bShort < 0L, s"($pShort, $bShort)")
  }

  test("eval_chrf matches a Scala re-implementation; identity and disjoint fixed points") {
    import spark.implicits._
    def chrfRef(cand: String, ref: String): (Long, Long, Long) = {
      val cc = cand.filterNot(_ == ' ').map(_.toString).toArray
      val rc = ref.filterNot(_ == ' ').map(_.toString).toArray
      def grams(t: Array[String], n: Int): Seq[String] =
        if (t.length < n) Seq.empty
        else t.sliding(n).map(_.mkString("")).toSeq
      val pr = (1 to 6).map { n =>
        val cg = grams(cc, n).groupBy(identity).map { case (k, v) => k -> v.size }
        val rg = grams(rc, n).groupBy(identity).map { case (k, v) => k -> v.size }
        val m = cg.map { case (g, c) => math.min(c, rg.getOrElse(g, 0)) }.sum.toLong
        val tc = math.max(cc.length - n + 1, 0).toLong
        val tr = math.max(rc.length - n + 1, 0).toLong
        (m * 1000000L / math.max(tc, 1L), m * 1000000L / math.max(tr, 1L))
      }
      val p = pr.map(_._1).sum / 6
      val r = pr.map(_._2).sum / 6
      val f = if (p + r == 0) 0L else 5 * p * r / (4 * p + r)
      (p, r, f)
    }
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("eval_chrf")(spark, sfDir)
      .select("cand_id", "ref_id", "chrp_ppm", "chrr_ppm", "chrf2_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (cand, ref, p, r, f) =>
      val (ep, er, ef) = chrfRef(texts(cand), texts(ref))
      assert((p, r, f) == ((ep, er, ef)), s"pair ($cand,$ref): ($p,$r,$f) != ($ep,$er,$ef)")
    }
    // fixed points: identical texts ≥ 6 chars → P = R = F2 = 10⁶
    // exactly, and whitespace differences are invisible — chrF's
    // point; fully disjoint alphabets → all zeros. A SHORT identical
    // pair scores below 10⁶ by the documented contract (an order with
    // no grams contributes 0 to the uniform average, not a skip):
    // 4 chars → (4·10⁶ + 0 + 0)/6.
    assert(chrfRef("abc defgh", "abcdefgh") == ((1000000L, 1000000L, 1000000L)))
    assert(chrfRef("aaaa aaaa", "bbbb bbbb") == ((0L, 0L, 0L)))
    assert(chrfRef("ab cd", "abcd") == ((666666L, 666666L, 666666L)))
  }

  test("eval_edit_ratio matches an independent DP re-implementation on sampled pairs") {
    import spark.implicits._
    // classic Levenshtein DP, written fresh (two-row rolling) — no
    // shared code with either engine's native implementation
    def lev(a: String, b: String): Long = {
      var prev = (0 to b.length).toArray
      var cur = new Array[Int](b.length + 1)
      var i = 1
      while (i <= a.length) {
        cur(0) = i
        var j = 1
        while (j <= b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
          j += 1
        }
        val t = prev; prev = cur; cur = t
        i += 1
      }
      prev(b.length).toLong
    }
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("eval_edit_ratio")(spark, sfDir)
      .select("cand_id", "ref_id", "edit_dist", "edit_ratio_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // DP on every pair is O(pairs · len²) — sample every 10th pair,
    // plus the ratio identity on all rows
    got.zipWithIndex.foreach { case ((cand, ref, d, ppm), k) =>
      if (k % 10 == 0) {
        val e = lev(texts(cand), texts(ref))
        assert(d == e, s"pair ($cand,$ref): $d != $e")
      }
      assert(ppm == d * 1000000L / math.max(texts(ref).length, 1),
        s"ratio of ($cand,$ref)")
    }
    // hand pins: the textbook triple, identity = 0, empty-side = length
    assert(lev("kitten", "sitting") == 3L)
    assert(lev("abc", "abc") == 0L && lev("", "abc") == 3L && lev("abc", "") == 3L)
  }

  test("eval_distinct_n matches a Scala re-implementation; repetition collapses the ratio") {
    import spark.implicits._
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("eval_distinct_n")(spark, sfDir)
      .select("doc_id", "n", "n_grams", "n_distinct")
      .as[(Long, Int, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, n, total, distinct) =>
      val t = texts(id).split(" ", -1)
      val gs = if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
      assert(total == gs.size.toLong, s"doc $id n=$n total")
      assert(distinct == gs.distinct.size.toLong, s"doc $id n=$n distinct")
    }
    // the metric's point, pinned on the corpus: ratios live in (0, 1]
    // ppm and unigram diversity can only shrink as n_grams grows
    val ratios = got.map { case (_, _, total, distinct) =>
      distinct * 1000000L / total }
    assert(ratios.forall(r => r > 0L && r <= 1000000L), "ppm out of range")
  }

  test("GenerationEval.evalPairs: a caller-built pair table drives every pair metric") {
    import spark.implicits._
    import graft.text.GenerationEval
    // the public pairing surface (r12 verdict item 4): an explicit
    // (cand_id, ref_id) table against two DIFFERENT payload relations
    // — the real-harness contract the registered queries' synthetic
    // adjacent-id pairing stands in for. Values are hand arithmetic.
    val pairTable = Seq((10L, 20L), (11L, 21L)).toDF("cand_id", "ref_id")
    val cand = Seq((10L, "abc"), (11L, "kitten")).toDF("id", "gen")
    val ref = Seq((20L, "abd"), (21L, "sitting")).toDF("id", "gen")
    val er = GenerationEval.editRatio(
        GenerationEval.evalPairs(pairTable, cand, ref,
          idCol = "id", payloadCol = "gen"))
      .select("cand_id", "edit_dist", "edit_ratio_ppm")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(er(10L) == ((1L, 333333L)), s"abc~abd: ${er(10L)}")   // 1e6 div 3
    assert(er(11L) == ((3L, 428571L)), s"kitten~sitting: ${er(11L)}") // 3e6 div 7

    // chrf: identical texts hit the 3-of-6-orders fixed point
    // (P = R = F2 = 500000 ppm for a 3-char string); whitespace is
    // stripped BEFORE gramming; disjoint texts score 0
    val ch = GenerationEval.chrf(GenerationEval.evalPairs(
        Seq((1L, 1L), (2L, 2L)).toDF("cand_id", "ref_id"),
        Seq((1L, "a b c"), (2L, "aaa")).toDF("doc_id", "text"),
        Seq((1L, "abc"), (2L, "xyz")).toDF("doc_id", "text")))
      .select("cand_id", "c_chars", "chrp_ppm", "chrr_ppm", "chrf2_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(ch(1L) == ((3L, 500000L, 500000L, 500000L)), s"identity: ${ch(1L)}")
    assert(ch(2L) == ((3L, 0L, 0L, 0L)), s"disjoint: ${ch(2L)}")

    // bleu via the one-reference-per-task overload (id-match pairing):
    // identical 3-token texts — p1..p3 full, p4 has no grams, micro-log
    // BLEU exactly 0 (BLEU = 1)
    val gens = Seq((1L, Seq("x", "y", "z"))).toDF("doc_id", "text")
    val bl = GenerationEval.bleu(GenerationEval.evalPairs(gens, gens))
      .select("p1_ppm", "p3_ppm", "p4_ppm", "bleu_mlog_micro")
      .as[(Long, Long, Long, Long)].collect().head
    assert(bl == ((1000000L, 1000000L, 0L, 0L)), s"bleu identity: $bl")

    // rougeN over pre-built gram sets: 1 common of 2 each side
    val rg = GenerationEval.rougeN(GenerationEval.evalPairs(
        Seq((1L, 2L)).toDF("cand_id", "ref_id"),
        Seq((1L, Seq("a b", "b c"))).toDF("doc_id", "text"),
        Seq((2L, Seq("b c", "c d"))).toDF("doc_id", "text")))
      .select("n_common", "recall_ppm", "precision_ppm", "f1_ppm")
      .as[(Long, Long, Long, Long)].collect().head
    assert(rg == ((1L, 500000L, 500000L, 500000L)), s"rouge: $rg")

    // an EMPTY gram array scores 0, never a silent NULL (r13 review:
    // the public surface takes caller payloads the registered corpus
    // never produces)
    val rgEmpty = GenerationEval.rougeN(GenerationEval.evalPairs(
        Seq((1L, 2L)).toDF("cand_id", "ref_id"),
        Seq((1L, Seq.empty[String])).toDF("doc_id", "text"),
        Seq((2L, Seq("b c"))).toDF("doc_id", "text")))
      .select("recall_ppm", "precision_ppm", "f1_ppm")
      .as[(Long, Long, Long)].collect().head
    assert(rgEmpty == ((0L, 0L, 0L)), s"empty-cand rouge: $rgEmpty")

    // an EMPTY candidate must score a deep FINITE brevity penalty,
    // never a silent NULL / ANSI divide-by-zero (r15 review — bleu's
    // sibling of the rougeN guard above): c_len treated as 1, so
    // bp = (1 − r_len)·log10(e)·10⁶ = floor(−434294.48) at r_len = 2
    val blEmpty = GenerationEval.bleu(GenerationEval.evalPairs(
        Seq((1L, 2L)).toDF("cand_id", "ref_id"),
        Seq((1L, Seq.empty[String])).toDF("doc_id", "text"),
        Seq((2L, Seq("b", "c"))).toDF("doc_id", "text")))
      .select("p1_ppm", "bleu_mlog_micro")
      .as[(Long, Long)].collect().head
    assert(blEmpty == ((0L, -434295L)), s"empty-cand bleu: $blEmpty")

    // unmatched pairs DROP by default (documented inner-join contract)
    // and refuse loudly under strict (r13 review: a failed sampling
    // run's missing generation must not silently shrink the report)
    val holey = Seq((10L, 20L), (42L, 20L)).toDF("cand_id", "ref_id")
    assert(GenerationEval.evalPairs(holey, cand, ref,
      idCol = "id", payloadCol = "gen").count() == 1L)
    val e = intercept[IllegalArgumentException] {
      GenerationEval.evalPairs(holey, cand, ref,
        idCol = "id", payloadCol = "gen", strict = true)
    }
    assert(e.getMessage.contains("silently drop"), e.getMessage)

    // the id-match (2-relation) overload can opt into the same strict
    // probe (r13 advice: without it, a reference table missing some
    // cand doc_ids silently shrank the report via the inner join —
    // the exact silent-vanish shape strict was added to refuse)
    val cands = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val refsHoley = Seq((1L, "aa")).toDF("doc_id", "text")
    assert(GenerationEval.evalPairs(cands, refsHoley).count() == 1L)
    val e2 = intercept[IllegalArgumentException] {
      GenerationEval.evalPairs(cands, refsHoley, strict = true).count()
    }
    assert(e2.getMessage.contains("silently drop"), e2.getMessage)
    // and a fully-matched strict id-match pairing sails through
    assert(GenerationEval.evalPairs(cands, cands, strict = true)
      .count() == 2L)
  }

  test("text gates cover EVERY doc: zero-token payloads get verdicts, never vanish or crash") {
    import spark.implicits._
    // the r12 text review's silent-vanish class: a zero-token doc had
    // NO row in four gate outputs (absent from keep AND drop sets),
    // and bigramLogProb's slice(ws, 1, size-1) CRASHED the whole scan
    // on it (length -1)
    val dirty = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val all = Set(1L, 2L, 3L)
    val bl = TextOps.bigramLogProb(dirty).select("doc_id").as[Long].collect().toSet
    assert(bl == all, s"bigramLogProb covered $bl")
    val ul = TextOps.unigramLogProb(dirty)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(ul.keySet == all && ul(2L) == 0L && ul(3L) == 0L, s"unigram: $ul")
    val ce = TextOps.charEntropy(dirty)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(ce.keySet == all && ce(2L) == 0L, s"entropy: $ce")
    val gr = TextOps.gopherRules(dirty)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(gr.keySet == all && !gr(2L) && !gr(3L), s"gopher: $gr")
    val qc = TextOps.qualityClassifier(dirty)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(qc.keySet == all && !qc(2L) && !qc(3L), s"classifier: $qc")
  }

  test("mlogLong mirrors the Column micro-log formula exactly") {
    import spark.implicits._
    // the driver-side trainer mirror MUST stay formula-identical to
    // floor(log10(c) * 1e6) (TextOps.mlog's documented ONE copy)
    val counts = (Seq(1L, 2L, 3L, 9L, 10L, 11L, 99L, 100L, 999983L) ++
      (1 to 50).map(i => i * 37L + 1)).distinct
    val viaSql = counts.toDF("c")
      .select(col("c"), expr("cast(floor(log10(c) * 1e6) as bigint)").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { c =>
      assert(graft.text.TextOps.mlogLong(c) == viaSql(c),
        s"mlogLong($c) = ${graft.text.TextOps.mlogLong(c)} != SQL ${viaSql(c)}")
    }
  }

  test("piiScrub counts only phones it actually redacts (post-email text)") {
    import spark.implicits._
    // the phone digits are consumed by the email match: the audit must
    // NOT report a phone redaction that never happened
    val d = Seq(
      (1L, "call 555-123-4567 or mail a@b.com"),
      (2L, "overlap 555-123-4567x@y.com end")).toDF("doc_id", "text")
    val got = graft.text.TextOps.piiScrub(d).orderBy("doc_id")
      .select("doc_id", "n_emails", "n_phones")
      .as[(Long, Long, Long)].collect()
    assert(got(0) == ((1L, 1L, 1L)), got(0).toString)
    // the email regex eats "4567x@y.com"; what remains ("555-123-")
    // is no longer a phone — count 0, matching the scrubbed output
    assert(got(1) == ((2L, 1L, 0L)), got(1).toString)
  }

  test("sharedMemoConsumers names registered queries only") {
    // the Bench memo_setup gate reads this set; a renamed/removed
    // query silently un-gating the prewarm must fail here
    val unknown = graft.pipeline.PipelineQueries.sharedMemoConsumers
      .diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"stale sharedMemoConsumers entries: $unknown")
    assert(graft.pipeline.PipelineQueries.sharedMemoConsumers.nonEmpty)
  }

  test("dedup candidate generation is bucket-join shaped: no cartesian product") {
    for (df <- Seq(
        Dedup.ngramJaccard(docs, 0.5),
        Dedup.minhashLsh(docs, 0.5),
        Dedup.simhash(docs))) {
      val plan = physicalPlan(df)
      assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$plan")
    }
  }

  test("ann_ivf candidate join is equi-join shaped: no cartesian product") {
    val q = emb.where(col("vec_id") < 10)
    val plan = physicalPlan(Ann.ivf(emb, q, 5))
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    // the only nested-loop joins allowed are the intended tiny-broadcast
    // centroid scorings; the corpus-side candidate join must be an
    // equi-join on the probed cell
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), s"no equi-join on cell in:\n$plan")
  }

  test("ngram df-ceiling: capped pairs are a subset carrying exact full-set jaccard") {
    import spark.implicits._
    val exact = Dedup.ngramJaccard(docs, 0.3)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val capped = Dedup.ngramJaccard(docs, 0.3, maxDf = Some(8), minShared = 2)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(capped.keySet.subsetOf(exact.keySet),
      "df-capped candidates produced a pair the exact path does not have")
    capped.foreach { case (k, j) =>
      assert(exact(k) == j, s"pair $k: capped jaccard $j != exact ${exact(k)}")
    }
  }

  test("qualityClassifier: integer micro features, capped length credit, gate fires") {
    import spark.implicits._
    val d = Seq(
      (1L, "the the x y"),                         // stopword-rich, diverse
      (2L, Seq.fill(128)("z").mkString(" "))).toDF("doc_id", "text")
    val got = TextOps.qualityClassifier(d)
      .select("doc_id", "f_len_micro", "f_stop_micro", "f_dist_micro",
        "score_micro", "keep")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // doc 1: n=4 nd=3 ns=2 -> 62500 / 500000 / 750000; score 62500+2000000+750000
    assert(got(0) == ((1L, 62500L, 500000L, 750000L, 2812500L, true)), got(0))
    // doc 2: length credit CAPS at 64 tokens = exactly 10^6; one
    // distinct token over 128 -> 7812 micro; repetitive wall drops
    assert(got(1) == ((2L, 1000000L, 0L, 7812L, 1007812L, false)), got(1))
  }

  test("semanticDedup: planted copies group with their original, one keeper per group") {
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("embedding")).where(col("vec_id") < 200)
    val planted = base.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, j) -> " +
          "CAST(x * 1.01D + 0.001D * pmod(vec_id + j, 7) AS FLOAT))").as("embedding"))
    val rows = Ann.semanticDedup(base.unionByName(planted), k = 8, iters = 2,
        threshold = 0.95)
      .select("vec_id", "sem_group", "cos_to_centroid", "keep")
      .as[(Long, Long, Double, Boolean)].collect()
    val group = rows.map(r => r._1 -> r._2).toMap
    (0L until 200L by 10).foreach { o =>
      assert(group(o + 1000000L) == group(o), s"copy of $o not in its group") }
    rows.groupBy(_._2).foreach { case (g, ms) =>
      assert(ms.count(_._4) == 1, s"group $g must have exactly one keeper")
      // the keeper is the paper's exemplar: argmin (cos_to_centroid, id)
      val keeper = ms.filter(_._4).head
      assert((keeper._3, keeper._1) == ms.map(m => (m._3, m._1)).min,
        s"group $g kept ${keeper._1}, not the low-centroid-cos exemplar")
    }
    // no planted copy survives: every group holding a copy keeps ONE row
    assert(rows.count(_._4) == rows.map(_._2).distinct.length)
  }

  test("lineDedup: shared spans vanish from every copy, unique remainder survives in order") {
    import spark.implicits._
    // spans of 2 words; docs 1/2 share "a b" and "c d"; doc 1 keeps
    // its unique tail in original order; doc 3 is all-shared -> empty
    val d = Seq(
      (1L, "a b c d x y z w"),
      (2L, "a b c d"),
      (3L, "a b")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(d, spanWords = 2, maxDf = 1)
      .select("doc_id", "n_lines", "n_kept", "clean_digest")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, 4L, 2L), (2L, 2L, 0L), (3L, 1L, 0L)), s"got ${got.toSeq}")
    // doc 1's cleaned text is exactly "x y z w", reconstructed in span order
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("x y z w".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0)._4 == want, s"digest ${got(0)._4} != $want")
    val empty = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    assert(got(1)._4 == empty && got(2)._4 == empty)
  }

  test("sampleTemperature: tail keeps the largest fraction, tiny source caps at keep-all") {
    import spark.implicits._
    import graft.pipeline.DataPrep
    // 400 / 100 / 4 rows; at pct=50: integer targets 157 / 78 / 15 —
    // the tiny source's target exceeds its size, so it must keep ALL
    // 4 rows (threshold capped), never resample past 1
    val src = ((1L to 400L).map((_, "big")) ++ (1001L to 1100L).map((_, "mid")) ++
      (2001L to 2004L).map((_, "tiny"))).toDF("doc_id", "source")
    val by = DataPrep.sampleTemperature(src, "doc_id", "source", 50)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(by("tiny") == 4L, s"tiny source must cap at keep-all: $by")
    val (fBig, fMid) = (by("big") / 400.0, by("mid") / 100.0)
    assert(fBig < fMid && fMid < 1.0,
      s"keep fractions must rise as sources shrink: big=$fBig mid=$fMid")
  }

  test("canonicalizeUrl: noise variants collapse, genuinely different pages do not") {
    import spark.implicits._
    val got = Seq(
      "https://WWW.Example.com:443/a/b?utm_source=x&id=1#sec",
      "http://example.com/a/b?id=1",
      "https://example.com/a/b/",          // trailing slash, no query
      "https://example.com:8443/a/b",      // NON-default port must survive
      "https://sub.example.com/a/b",       // different host
      "https://example.com/a/b?id=2&utm_campaign=y&utm_medium=z")
      .toDF("url")
      .select(Dedup.canonicalizeUrl(col("url")).as("c")).as[String].collect()
    assert(got(0) == "example.com/a/b?id=1", got(0))
    assert(got(1) == got(0), s"${got(1)} != ${got(0)}")
    assert(got(2) == "example.com/a/b", got(2))
    assert(got(3) == "example.com:8443/a/b", got(3))
    assert(got(4) == "sub.example.com/a/b", got(4))
    assert(got(5) == "example.com/a/b?id=2", got(5))
  }

  test("canonicalizeUrl: path case is SIGNIFICANT, host case is not; GA4 utm params strip") {
    import spark.implicits._
    val got = Seq(
      "https://EXAMPLE.com/About",         // host folds, path case kept
      "https://example.com/about",         // a DIFFERENT page than /About
      "https://example.com/p?q=Foo",       // query value case kept
      "https://example.com/p?utm_source_platform=x&id=3") // GA4 multi-underscore
      .toDF("url")
      .select(Dedup.canonicalizeUrl(col("url")).as("c")).as[String].collect()
    assert(got(0) == "example.com/About", got(0))
    assert(got(1) == "example.com/about", got(1))
    assert(got(0) != got(1), "case-distinct pages conflated")
    assert(got(2) == "example.com/p?q=Foo", got(2))
    assert(got(3) == "example.com/p?id=3", got(3))
  }

  test("canonicalizeUrl: a trailing slash in a QUERY VALUE is significant") {
    import spark.implicits._
    val got = Seq(
      "https://site.com/cb?next=/home/",   // slash belongs to the value
      "https://site.com/cb?next=/home",    // a DIFFERENT target
      "https://site.com/cb/?next=/x",      // path slash before ? strips
      "https://site.com/cb/?utm_source=a") // query strips away entirely
      .toDF("url")
      .select(Dedup.canonicalizeUrl(col("url")).as("c")).as[String].collect()
    assert(got(0) == "site.com/cb?next=/home/", got(0))
    assert(got(1) == "site.com/cb?next=/home", got(1))
    assert(got(0) != got(1), "query-value slash conflated distinct resources")
    assert(got(2) == "site.com/cb?next=/x", got(2))
    assert(got(3) == "site.com/cb", got(3))
  }

  test("cdcChunks: an empty doc keeps its report row (zeroed, dup_frac NULL)") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over a lazy dog repeatedly"),
      (2L, "")).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(docs).orderBy("doc_id").collect()
    assert(got.length == 2, got.mkString(","))
    val empty = got(1)
    assert(empty.getAs[Long]("n_chunks") == 0L && empty.getAs[Long]("n_bytes") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("dup_frac")),
      "0 of 0 bytes has no honest dup ratio")
  }

  test("repetition: a 2-word doc reports its 2-gram stats with zero 3-gram repeats") {
    import spark.implicits._
    val docs = Seq((1L, "foo foo"), (2L, "a b c a b c")).toDF("doc_id", "text")
    val got = graft.text.TextOps.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 'foo foo': one 2-gram, max frequency 1 of 1 -> top frac 1.0; a
    // >= 3-word gate would have silently omitted (passed) this doc
    assert(got.contains(1L), "2-word doc missing from the repetition report")
    assert(got(1L).getAs[Double]("top_2gram_frac") == 1.0, got(1L).toString)
    assert(got(1L).getAs[Double]("dup_3gram_frac") == 0.0, got(1L).toString)
    assert(!got(1L).getAs[Boolean]("rep_pass"))
    assert(got(2L).getAs[Double]("dup_2gram_frac") > 0, got(2L).toString)
  }

  test("repetition: a sub-2-token doc gets a verdict row (pass, zero grams)") {
    import spark.implicits._
    // a gate must judge EVERY doc: a 1-token doc has no 2-grams — no
    // repetition evidence — so it passes with zeroed stats instead of
    // vanishing from both the pass and fail sets
    val docs = Seq((1L, "supercalifragilistic"), (2L, "x y x y")).toDF("doc_id", "text")
    val got = graft.text.TextOps.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.contains(1L), "1-token doc missing from the repetition report")
    assert(got(1L).getAs[Long]("n_2grams") == 0L)
    assert(got(1L).isNullAt(got(1L).fieldIndex("top_2gram_frac")))
    assert(got(1L).getAs[Double]("dup_3gram_frac") == 0.0)
    assert(got(1L).getAs[Boolean]("rep_pass"))
    assert(!got(2L).getAs[Boolean]("rep_pass"))
  }

  test("ngramContainment: finds the quote-in-longer-doc pair Jaccard misses") {
    import spark.implicits._
    // doc 2 is doc 1's first 5 words: contained whole (containment 1.0)
    // but jaccard = 3/18 — no useful jaccard threshold reaches it
    val quoteDocs = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "a b c d e"),
      (3L, "z y x w v u t9 s9 r9 q9")).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(quoteDocs, 0.9, maxDf = 8, minShared = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont == Set((1L, 2L, 1.0)), s"got $cont")
    val jac = Dedup.ngramJaccard(quoteDocs, 0.5, maxDf = Some(8), minShared = 2)
      .as[(Long, Long, Double)].collect()
    assert(jac.isEmpty, s"jaccard unexpectedly scored the pair: ${jac.toSeq}")
    // plan shape: candidates off postings lists, never a self cross
    val plan = Dedup.ngramContainment(docs, 0.9).queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad join shape:\n$plan")
  }

  test("ngram df-ceiling: high-df shingles stay out of the join, rare-shingle dups found") {
    import spark.implicits._
    // docs 1/2 are near-dups sharing RARE shingles (df=2); docs 10..13
    // share only an ultra-common shingle (df=4 > cap) — the blow-up mode
    // the ceiling exists for. With maxDf=3 the spam quartet must
    // produce no candidates while the true pair survives with its exact
    // full-set jaccard.
    val planted = Seq(
      (1L, "rare one two three four five six"),
      (2L, "rare one two three four five seven"),
      (10L, "the quick fox aa bb cc"),
      (11L, "the quick fox dd ee ff"),
      (12L, "the quick fox gg hh ii"),
      (13L, "the quick fox jj kk ll")).toDF("doc_id", "text")
    val got = Dedup.ngramJaccard(planted, 0.5, maxDf = Some(3), minShared = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.6667)), s"got $got")
  }

  test("dedup_embedding_ivf: cell-join shape, no all-pairs, agrees with exact report") {
    import spark.implicits._
    val ivfDf = Ann.nearestNeighborReportIvf(emb, 0.45)
    val plan = physicalPlan(ivfDf)
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    // candidates must flow through the probed-cell equi-join (the exact
    // report's all-pairs broadcast shape must NOT appear here)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), s"no equi-join on cell in:\n$plan")
    val exact = Ann.nearestNeighborReport(emb, 0.45).select("vec_id", "nn_id")
      .as[(Long, Long)].collect().toMap
    val got = ivfDf.select("vec_id", "nn_id").as[(Long, Long)].collect().toMap
    assert(got.size * 10 >= exact.size * 9,
      s"IVF report covers ${got.size}/${exact.size} vectors")
    val agree = exact.count { case (k, v) => got.get(k).contains(v) }
    assert(agree * 2 >= exact.size, s"IVF NN agreement $agree/${exact.size}")
  }

  test("nearestNeighborReport: a NaN vector neither poisons ranks nor shifts the denominator") {
    import spark.implicits._
    // 1 and 2 are near-identical; 3 is orthogonal-ish; 4 is corrupt.
    // Unguarded, 4 is EVERY row's argmax (struct max orders NaN above
    // all doubles) and NaN >= t passes — the all-is_dup poisoning the
    // r12 sim review fixed on the other search surfaces.
    val vs = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.999, 0.04, 0.0)),
      (3L, Array(0.0, 1.0, 0.0)), (4L, Array(Double.NaN, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val rows = Ann.nearestNeighborReport(vs, 0.45)
      .select("vec_id", "nn_id", "is_dup").collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2)))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L), s"one row per vector: $rows")
    assert(rows(1L) == ((2L, true)) && rows(2L) == ((1L, true)), s"true pair: $rows")
    assert(rows(3L)._1 != 4L && !rows(3L)._2, s"3's verdict rode the NaN vector: $rows")
    assert(rows(4L) == ((-1L, false)), s"corrupt vector got a verdict: $rows")
  }

  test("mm decode: metadata comes from the payload bytes and matches the synthesis") {
    val rows = graft.multimodal.MM.meta(docs.where(col("doc_id") < 9))
      .orderBy("doc_id").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val id = r.getLong(0)
      val fmt = r.getString(2)
      (id % 3) match {
        case 0 =>
          assert(fmt == "jpeg", s"doc $id: $fmt")
          assert(r.getLong(3) == 64 + id % 512 && r.getLong(4) == 64 + (id * 7) % 512)
        case 1 =>
          assert(fmt == "png", s"doc $id: $fmt")
          assert(r.getLong(3) == 64 + id % 512 && r.getLong(4) == 64 + (id * 7) % 512)
        case _ =>
          assert(fmt == "wav", s"doc $id: $fmt")
          assert(r.getLong(5) == 8000 + ((id / 3) % 3) * 8000)
      }
      assert(r.getBoolean(6), s"doc $id: decode_ok false")
    }
  }

  test("mm resize: header surgery produces payloads that re-decode to the new dims") {
    import graft.multimodal.MM
    val rows = MM.resizeToFit(MM.synthesizePayload(docs.where(col("doc_id") < 30)), 128)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"doc ${r.getLong(0)}: patched payload did not re-parse to the new dims")
      if (!r.isNullAt(3)) {
        val (nw, nh) = (r.getLong(3), r.getLong(4))
        assert(nw <= 128 && nh <= 128 && nw >= 1 && nh >= 1,
          s"doc ${r.getLong(0)}: resized dims ($nw, $nh) out of bounds")
        // aspect preserved under integer floor: the larger side hits 128
        val (w, h) = (r.getLong(1), r.getLong(2))
        if (math.max(w, h) > 128) assert(math.max(nw, nh) == 128)
      }
    }
  }

  test("mm audio info: duration math from the parsed chunks") {
    import graft.multimodal.MM
    val rows = MM.audioInfo(MM.synthesizePayload(docs.where(col("doc_id") < 30)))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sr, n, ms) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(Set(8000L, 16000L, 24000L)(sr))
      assert(ms == math.floor(n * 1000.0 / sr).toLong)
    }
  }

  test("mm frame sample: geometry from the header, stride honored, fp from the frame bytes") {
    import graft.multimodal.MM
    import spark.implicits._
    val rows = MM.frameSample(MM.synthesizeVideo(docs.where(col("doc_id") < 20)))
      .orderBy("doc_id", "frame_idx").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, fs) =>
      val nf = 4 + id % 13
      assert(fs.forall(_.getLong(1) == nf), s"doc $id: n_frames mismatch")
      val idxs = fs.map(_.getLong(2)).toSeq
      assert(idxs == (0L until nf by 3L), s"doc $id: sampled $idxs")
      val frameSize = 16 + id % 32
      fs.foreach(r => assert(r.getLong(3) == 9 + r.getLong(2) * frameSize))
    }
    // non-video payloads are rejected by magic, not parsed
    val junk = Seq((1L, "GVIX junk not a container".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    assert(MM.frameSample(junk).isEmpty)
    // a legal container with frame count 0 yields zero rows — it must
    // not throw (sequence(0, -1) is an error, ANSI or not)
    val zeroFrames = Seq((2L,
      "GVID".getBytes("UTF-8") ++ Array[Byte](0, 0, 0, 16) ++ "body".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    assert(MM.frameSample(zeroFrames).isEmpty)
  }

  test("mm feature extract: fixed shape, exact stub output, partition-preserving") {
    import graft.multimodal.MM
    import spark.implicits._
    // bytes [0,1,2,...,15] at dim 4: stride k sees {k, k+4, k+8, k+12},
    // mean = k + 6
    val payload = Array.tabulate[Byte](16)(_.toByte)
    val tiny = Seq((1L, payload)).toDF("doc_id", "payload")
    val got = MM.featureExtract(tiny, dim = 4).collect().head
    assert(got.getLong(0) == 1L && got.getInt(2) == 4)
    assert(got.getSeq[Float](1) == Seq(6f, 7f, 8f, 9f), s"stub features $got")
    // real payloads: fixed dim, deterministic, iterator plumbing keeps
    // the partitioning (no hidden shuffle/coalesce)
    val pays = MM.synthesizePayload(docs.where(col("doc_id") < 50)).repartition(5)
    val f1 = MM.featureExtract(pays)
    assert(f1.rdd.getNumPartitions == 5, "mapPartitions must preserve partitioning")
    assert(f1.collect().forall(_.getSeq[Float](1).length == 8))
    assert(f1.exceptAll(MM.featureExtract(pays)).count() == 0, "stub must be deterministic")
  }

  test("mm decode: headerless payloads parse as unknown, not garbage") {
    import spark.implicits._
    val raw = Seq((7L, "just plain text".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = graft.multimodal.MM.decode(raw).collect()(0)
    assert(out.getString(2) == "unknown")
    assert(out.isNullAt(3) && out.isNullAt(4) && out.isNullAt(5))
    assert(!out.getBoolean(6))
  }

  test("connected components: transitive closure over the pair list, min-id keeper") {
    import spark.implicits._
    // A~B, B~C but never A~C (the transitivity case), plus a disjoint
    // pair and an untouched id space
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("i", "j")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L), s"got $got")
  }

  test("connected components: a diameter-32 chain converges (pointer jumping)") {
    import spark.implicits._
    // worst-case shape for plain propagation; pointer jumping must close
    // it well inside the iteration cap
    val chain = (0L until 32L).map(k => (k, k + 1)).toDF("i", "j")
    val got = Dedup.connectedComponents(chain, maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 33 && got.values.forall(_ == 0L),
      s"chain did not collapse to label 0: $got")
  }

  test("connected components on an empty pair list is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Dedup.connectedComponents(empty).isEmpty)
  }

  test("curation: each gate drops exactly what its standalone operator says") {
    import graft.pipeline.Curation
    val audit = Curation.curate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(audit.size == docs.count())
    // exact_keeper agrees with Dedup.exact's keeper set
    val keepers = Dedup.exact(docs).select("keeper")
      .collect().map(_.getLong(0)).toSet
    audit.foreach { case (id, r) =>
      assert(r.getBoolean(4) == keepers(id), s"doc $id exact_keeper mismatch")
    }
    // cluster column agrees with connectedComponents over the same pairs
    val cl = Dedup.connectedComponents(
        Dedup.ngramJaccard(docs, 0.5, pruneUnique = false, maxDf = Some(8), minShared = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    audit.foreach { case (id, r) =>
      val got = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(got == cl.get(id), s"doc $id cluster mismatch: $got vs ${cl.get(id)}")
    }
    // kept == conjunction of the row's own audit columns
    audit.values.foreach { r =>
      val expect = r.getString(1) == "en" && r.getDouble(3) >= 0.3 &&
        r.getLong(2) >= 10 && r.getBoolean(4) &&
        (r.isNullAt(5) || r.getLong(5) == r.getLong(0))
      assert(r.getBoolean(6) == expect, s"doc ${r.getLong(0)} kept flag inconsistent")
    }
    // and the pipeline must actually curate: some docs kept, some dropped
    assert(audit.values.exists(_.getBoolean(6)) && audit.values.exists(!_.getBoolean(6)))
  }

  test("minhash LSH finds the exact-jaccard pairs on planted near-dups") {
    val exact = Dedup.ngramJaccard(docs, 0.5).select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, 0.5).select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH verify stage must not emit sub-threshold pairs")
    assert(exact.nonEmpty && lsh.size >= exact.size * 9 / 10,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("LSH star emission bounds giant buckets, clustering still recovers components") {
    import spark.implicits._
    import graft.dedup.Dedup
    // 12 identical docs (one giant bucket in every band) + 2 unrelated
    val dup = (0L until 12L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val other = Seq(
      (100L, "completely different words fill this document top to bottom here"),
      (101L, "yet another unrelated text with its own vocabulary entirely now"))
    val docs = (dup ++ other).toDF("doc_id", "text")
    val all = Dedup.minhashLsh(docs, 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val star = Dedup.minhashLsh(docs, 0.5, starAbove = 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // all-pairs: 12*11/2 = 66 pairs; star: exactly K-1 = 11 edges to doc 0
    assert(all.size == 66, s"all-pairs emitted ${all.size}")
    assert(star == (1L until 12L).map(j => (0L, j)).toSet, s"star emitted $star")
    // the clustering consumer reaches the same answer either way
    val ccAll = Dedup.connectedComponents(all.toSeq.toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    val ccStar = Dedup.connectedComponents(star.toSeq.toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    assert(ccAll == ccStar && ccAll.values.toSet == Set(0L))
    Dedup.releaseLabels(docs)  // no-op guard: safe on unpinned frames
  }

  test("SRP star emission: an identical-vector flood emits O(K) edges, components survive") {
    import spark.implicits._
    import graft.dedup.Dedup
    import graft.sim.Ann
    // 30 identical embeddings: every band bucket holds all 30, the
    // all-pairs mode would emit 30*29/2 = 435 candidates per band
    val same = (0 until 16).map(j => math.sin(j + 1.0).toFloat)
    val flood = (0L until 30L).map(i => (i, same))
    val other = Seq(
      (100L, (0 until 16).map(j => math.cos(3.0 * j + 1).toFloat)),
      (101L, (0 until 16).map(j => math.sin(7.0 * j + 2).toFloat)))
    val vecs = (flood ++ other).toDF("vec_id", "embedding")
    val all = Ann.srpDupPairs(vecs, 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(all.size == 435, s"all-pairs emitted ${all.size}")
    val star = Ann.srpDupPairs(vecs, 0.9, starAbove = 5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // exactly K-1 star edges, all anchored at the bucket-min vec_id
    assert(star == (1L until 30L).map(j => (0L, j)).toSet, s"star emitted $star")
    val cc = Dedup.connectedComponents(star.toSeq.toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    assert(cc.keySet == (0L until 30L).toSet && cc.values.toSet == Set(0L),
      s"flood component not recovered: $cc")
  }

  test("SimHash star emission: an identical-doc flood emits O(K) edges, components survive") {
    import spark.implicits._
    import graft.dedup.Dedup
    val dup = (0L until 12L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val other = Seq(
      (100L, "completely different words fill this document top to bottom here"),
      (101L, "yet another unrelated text with its own vocabulary entirely now"))
    val docs = (dup ++ other).toDF("doc_id", "text")
    val all = Dedup.simhash(docs)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(all.size == 66, s"all-pairs emitted ${all.size}")
    val star = Dedup.simhash(docs, starAbove = 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(star == (1L until 12L).map(j => (0L, j)).toSet, s"star emitted $star")
    val cc = Dedup.connectedComponents(star.toSeq.toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    assert(cc.keySet == (0L until 12L).toSet && cc.values.toSet == Set(0L),
      s"flood component not recovered: $cc")
  }

  test("connectedComponents frees superseded checkpoints (no storage accumulation)") {
    import spark.implicits._
    // a 200-ring has diameter 100 → pointer jumping needs ~7 rounds;
    // without per-round release this pins ~15 RDD generations
    val pairs = (0L until 200L).map(i => (i, (i + 1) % 200)).toDF("i", "j")
    def pinned = spark.sparkContext.getPersistentRDDs.size
    val before = pinned
    val labels = graft.dedup.Dedup.connectedComponents(pairs)
    assert(labels.as[(Long, Long)].collect().forall(_._2 == 0L), "ring must collapse to min id")
    // only the final label generation may remain pinned — the r4 bench
    // regressed 2x from exactly this accumulation
    assert(pinned <= before + 1, s"checkpoint accumulation: $before -> $pinned")
    graft.dedup.Dedup.releaseLabels(labels)
    assert(pinned <= before, s"releaseLabels left pins: $before -> $pinned")
  }

  test("a zero embedding never outranks real neighbors (no NaN in the cosine path)") {
    import spark.implicits._
    // failed-encoder output: an all-zero vector. Unguarded, 0/0 = NaN
    // and Spark sorts NaN above every number — the zero vector would
    // take rank 1 for every query and pass every threshold.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (99L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Ann.bruteForce(vecs, q, 1).collect()
    assert(top.length == 1 && top.head.getAs[Long]("nn_id") == 2L, top.mkString)
    // and the radius search must not report it similar to anything
    val rs = Ann.rangeSearch(vecs, q, 0.5).collect()
    assert(rs.forall(_.getAs[Long]("nn_id") != 99L), rs.mkString)
  }

  test("ann_ivf agrees with brute force on most top-1 neighbors") {
    val q = emb.where(col("vec_id") < 10)
    val bf = Ann.bruteForce(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Ann.ivf(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = bf.count { case (k, v) => ivf.get(k).contains(v) }
    // nprobe=4 of 16 cells: recall can miss some, but must find most
    assert(agree >= 5, s"IVF top-1 recall $agree/10 vs brute force")
  }

  test("ann_ivf_imi: two-level routing keeps top-1 recall and is deterministic") {
    val q = emb.where(col("vec_id") < 10)
    val bf = Ann.bruteForce(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val imi = Ann.ivfImi(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-half quantizers ignore cross-half correlation, so pair
    // routing is coarser than flat cells at equal effective counts —
    // the 8-of-16 pair probe must still find most true neighbors
    val agree = bf.count { case (k, v) => imi.get(k).contains(v) }
    assert(agree >= 5, s"IMI top-1 recall $agree/10 vs brute force")
    // deterministic across invocations (seeded per-half Lloyd, no RNG)
    val again = Ann.ivfImi(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == imi, "IMI search is not deterministic")
  }

  test("ann_ivf_imi: cell-pair pruning admits a strict candidate subset, equi-join shaped") {
    val q = emb.where(col("vec_id") < 10)
    // the routing's whole point: the (cell1, cell2) equi-join admits
    // far fewer scored pairs than the Q·(N−1) brute-force stream
    val n = emb.count()
    val admitted = Ann.ivfImiScored(emb, q).count()
    assert(admitted > 0, "IMI admitted no candidates")
    assert(admitted < 10L * (n - 1) / 2,
      s"IMI admitted $admitted of ${10 * (n - 1)} brute-force pairs — routing prunes nothing")
    // plan shape: no cartesian product; the only nested-loop joins are
    // the two intended 1-row-broadcast codebook scorings; the corpus-
    // side candidate join is an equi-join on the probed (cell1, cell2)
    val plan = physicalPlan(Ann.ivfImi(emb, q, 5))
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), s"no equi-join on cell pair in:\n$plan")
  }

  test("PQ ANN: float re-score of ADC candidates keeps high top-1 agreement") {
    import graft.sim.Pq
    val q = emb.where(col("vec_id") < 10)
    val bf = Ann.bruteForce(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pq = Pq.pqSearch(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = bf.count { case (k, v) => pq.get(k).contains(v) }
    // candidates are 4k-wide and re-scored float: only a true neighbor
    // OUTSIDE the ADC top-4k can be missed
    assert(agree >= 8, s"PQ top-1 recall $agree/10 vs float brute force")
    // deterministic across invocations (seeded Lloyd, no RNG)
    val again = Pq.pqSearch(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == pq, "PQ search is not deterministic")
  }

  test("int8 ANN keeps high top-1 agreement with the float baseline") {
    import graft.sim.Quantize
    val q = emb.where(col("vec_id") < 10)
    val bf = Ann.bruteForce(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qz = Quantize.annInt8(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = bf.count { case (k, v) => qz.get(k).contains(v) }
    // SQ8 noise only reorders near-ties — agreement should be near-total
    assert(agree >= 9, s"int8 top-1 recall $agree/10 vs float brute force")
  }

  test("int8 IVF ANN keeps useful top-1 agreement with the float baseline") {
    import graft.sim.Quantize
    val q = emb.where(col("vec_id") < 10)
    val bf = Ann.bruteForce(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qi = Quantize.annInt8Ivf(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both error sources compound (cell miss + quantization reorder);
    // the floor is the IVF one — quantization must not degrade pruning
    val agree = bf.count { case (k, v) => qi.get(k).contains(v) }
    assert(agree >= 5, s"int8-IVF top-1 recall $agree/10 vs float brute force")
    // and it must agree with FLOAT IVF on most cells it probes: the
    // quantized index is a drop-in for the float one
    val fi = Ann.ivf(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sameAsFloatIvf = fi.count { case (k, v) => qi.get(k).contains(v) }
    assert(sameAsFloatIvf >= 8, s"int8-IVF vs float-IVF agreement $sameAsFloatIvf/10")
  }

  test("pii scrub: counts match the seeding, redacted text carries no pattern") {
    import spark.implicits._
    val d = Seq(
      (1L, "write to bob.b@mail.example today"),
      (2L, "call 555-123-4567 or 555-999-0000 now"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrub(d).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.map(r => (r._1, r._2, r._3, r._5)).sameElements(
      Array((1L, 1L, 0L, true), (2L, 0L, 2L, true), (3L, 0L, 0L, false))))
    // the fingerprint must be of the REDACTED text: doc 3 unchanged,
    // docs 1-2 changed vs their raw fingerprint
    val raw = TextOps.fingerprint(d).orderBy("doc_id").select("fp").as[Long].collect()
    assert(got(2)._4 == raw(2) && got(0)._4 != raw(0) && got(1)._4 != raw(1))
  }

  test("exact dedup collapses duplicate texts") {
    import spark.implicits._
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(d).orderBy("keeper").as[(Long, Long)].collect()
    assert(got.sameElements(Array((1L, 2L), (3L, 1L))))
  }

  test("text fingerprint matches the reference mod-fold") {
    import spark.implicits._
    val d = Seq((1L, "abc")).toDF("doc_id", "text")
    val fp = TextOps.fingerprint(d).select("fp").as[Long].head()
    // ((0*31+97)*31+98)*31+99 mod 1e9+7
    assert(fp == 96354L)
  }

  test("simhash of identical docs is identical; near-dup pairs have small hamming") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "x y z w q r s t"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhash(d, maxHamming = 0).as[(Long, Long, Int)].collect()
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._3 > 0))
  }

  test("int8 quantize: roundtrip error bounded by scale/2 per element, range honored") {
    import graft.sim.{Quantize, VectorOps}
    val rep = Quantize.int8Report(emb)
    // range + positivity invariants straight off the report
    val bad = rep.where(col("q_min") < -127 || col("q_max") > 127 ||
      col("scale") <= 0 || col("mse_ppm") < 0).count()
    assert(bad == 0)
    // max elementwise |v - scale*q| must be <= scale/2 (round-to-nearest;
    // the clamp never binds because |x|/scale <= 127 by construction)
    val err = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("scale",
        greatest(expr("array_max(transform(v, x -> abs(x)))") / 127, lit(1e-12)))
      .withColumn("qv", expr(
        "transform(v, x -> greatest(least(cast(floor(x / scale + 0.5) as bigint), 127), -127))"))
      .withColumn("worst", expr(
        "array_max(zip_with(v, qv, (a, q) -> abs(a - q * scale)))"))
      .where(col("worst") > col("scale") / 2 + lit(1e-12))
      .count()
    assert(err == 0)
  }

  test("pack_sequences: offsets in range, sequences advance with the running sum") {
    import graft.pipeline.DataPrep
    val ctx = 256
    val packed = DataPrep.packSequences(docs, ctxTokens = ctx, bucketSize = 100)
    assert(packed.where(col("seq_offset") < 0 || col("seq_offset") >= ctx).count() == 0)
    // first doc of every bucket starts a fresh sequence at offset 0
    val firsts = packed.groupBy("bucket")
      .agg(min_by(struct(col("seq_id"), col("seq_offset")), col("doc_id")).as("f"))
      .where(col("f.seq_offset") =!= 0 || col("f.seq_id") % 1048576 =!= 0)
    assert(firsts.count() == 0)
    // seq_id is non-decreasing in doc order within a bucket
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    val regress = packed.withColumn("_prev", lag(col("seq_id"), 1).over(w))
      .where(col("_prev").isNotNull && col("seq_id") < col("_prev"))
    assert(regress.count() == 0)
  }

  test("pack_sequences: a bucket overflowing its 2^20 seq_id slot fails loudly") {
    import spark.implicits._
    import graft.pipeline.DataPrep
    // 1.05M tokens at ctxTokens=1 → local sequence index past 2^20;
    // a silent wrap would collide into the next bucket's id space
    val big = Seq((0L, ("x " * 1050000).trim), (1L, "y")).toDF("doc_id", "text")
    val e = intercept[Throwable](
      DataPrep.packSequences(big, ctxTokens = 1, bucketSize = 100).collect())
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(messages.contains("packSequences"), s"wrong failure: $messages")
  }

  test("decontaminate: benchmark members self-flag; disjoint docs stay clean") {
    import spark.implicits._
    import graft.pipeline.DataPrep
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // = benchmark doc
      (2L, "the quick brown fox jumps somewhere else entirely now"), // shares 2 shingles
      (3L, "completely different words with no overlap at all")
    ).toDF("doc_id", "text")
    val benchmark = corpus.where($"doc_id" === 1)
    val got = DataPrep.decontaminate(corpus, benchmark, minShared = 2)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    assert(got(0)._3, "benchmark doc must self-flag")
    assert(got(1)._3, s"overlapping doc must flag: ${got(1)}")
    assert(!got(2)._3, "disjoint doc must stay clean")
  }

  test("splitLeakageSafe: every group lands in exactly ONE split, assignment deterministic") {
    import spark.implicits._
    import graft.pipeline.DataPrep
    val df = (0 until 1000).map(i => (i.toLong, s"host${i % 200}")).toDF("doc_id", "grp")
    val split = DataPrep.splitLeakageSafe(df, "grp")
    // group integrity: no group straddles splits — THE leakage guard
    val straddlers = split.groupBy("grp")
      .agg(countDistinct(col("split")).as("n")).where(col("n") > 1).count()
    assert(straddlers == 0)
    // all three splits populated at 200 groups and deterministic across runs
    val a = split.groupBy("split").count().orderBy("split")
      .as[(String, Long)].collect()
    val b = DataPrep.splitLeakageSafe(df, "grp").groupBy("split").count()
      .orderBy("split").as[(String, Long)].collect()
    assert(a.sameElements(b))
    assert(a.map(_._1).toSet == Set("train", "valid", "test"), a.mkString(","))
    // weights land near 80/10/10 at group granularity
    val m = a.toMap
    assert(m("train") > m("valid") && m("train") > m("test"),
      s"train must dominate: ${a.mkString(",")}")
    val e = intercept[IllegalArgumentException](
      DataPrep.splitLeakageSafe(df, "grp", trainPct = 95, validPct = 10))
    assert(e.getMessage.contains("bad split"))
  }

  test("stratified sampler is deterministic and stratum-faithful") {
    import graft.pipeline.DataPrep
    val rates = Map("en" -> 0.9, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.1)
    val s1 = DataPrep.sampleStratified(docs, "doc_id", "lang", rates)
    val s2 = DataPrep.sampleStratified(docs, "doc_id", "lang", rates)
    assert(s1.count() == s2.count() && s1.exceptAll(s2).count() == 0,
      "hash sampling must be run-to-run identical")
    // an unlisted stratum samples at 0
    val none = DataPrep.sampleStratified(docs, "doc_id", "lang", Map("xx" -> 1.0))
    assert(none.count() == 0)
  }

  test("kmeans: deterministic, objective non-decreasing over rounds, no cartesian") {
    import spark.implicits._
    def objective(iters: Int): Double =
      Ann.kmeans(emb, k = 10, iters = iters)
        .agg(sum("cos_to_centroid")).as[Double].head()
    // Lloyd monotonicity: more rounds never lower total assignment cosine
    // (tolerance for the 4dp rounding of the per-row scores)
    val o0 = objective(0); val o3 = objective(3)
    assert(o3 >= o0 - 1e-2, s"objective fell: $o0 -> $o3")
    // two runs produce identical assignments
    val a = Ann.kmeans(emb, k = 10, iters = 2)
    val b = Ann.kmeans(emb, k = 10, iters = 2)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // every vector assigned to exactly one of k clusters
    val cl = a.groupBy("cluster").count()
    assert(cl.count() <= 10 && a.count() == emb.count())
    // NEGATIVE vec_ids (hash-derived) seed through pmod, not `%` (r13
    // review): `%` seeded up to 2k-1 cells, half with negative ids
    val negIds = emb.limit(40).withColumn("vec_id", -col("vec_id") - 1)
    val nk = Ann.kmeans(negIds, k = 4, iters = 1)
    val ncl = nk.select(col("cluster").cast("long")).distinct().as[Long].collect()
    assert(ncl.length <= 4 && ncl.forall(_ >= 0),
      s"negative-id seeding leaked cells: ${ncl.mkString(",")}")
    // the only join is the single-row broadcast centroid attach (the
    // scalar-attach BNLJ every centroid consumer uses) — no cartesian
    val plan = physicalPlan(a)
    assert(!plan.contains("CartesianProduct"), s"all-pairs shape:\n$plan")
  }

  test("srpDupPairs finds every planted near-identical pair, exact-cosine verified") {
    import spark.implicits._
    val base = emb.select("vec_id", "embedding")
    val planted = base.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, j) -> " +
          "CAST(x * 1.01D + 0.001D * pmod(vec_id + j, 7) AS FLOAT))").as("embedding"))
    val nPlanted = planted.count()
    val got = Ann.srpDupPairs(base.unionByName(planted), 0.9)
      .as[(Long, Long, Double)].collect()
    // every reported pair is a planted (orig, copy) pair at cos ≥ 0.9...
    assert(got.forall { case (i, j, c) => j - i == 1000000L && c >= 0.9 },
      s"non-planted pair reported: ${got.mkString(",")}")
    // ...and none is missed
    assert(got.length == nPlanted, s"${got.length} of $nPlanted planted pairs found")
    // candidate generation is bucket-join shaped
    val plan = physicalPlan(Ann.srpDupPairs(base, 0.9))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs shape:\n$plan")
  }

  test("repetition: a self-repeating doc fails the gate, a diverse one passes") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      // all-distinct bigrams and enough of them that the top share
      // (1/24) clears the 5% gate short docs trip on
      (2L, ('a' to 'y').map(_.toString).mkString(" "))
    ).toDF("doc_id", "text")
    val r = TextOps.repetition(d)
      .select("doc_id", "rep_pass").as[(Long, Boolean)].collect().toMap
    assert(r == Map(1L -> false, 2L -> true), s"got $r")
  }

  test("unigramLogProb: rare-token docs score below common-token docs") {
    import spark.implicits._
    // 'a' appears 8x in the corpus, 'z' once: doc of a's must out-score
    // the doc holding the singleton.
    val d = Seq(
      (1L, "a a a a"), (2L, "a a a z"), (3L, "a b c d")
    ).toDF("doc_id", "text")
    val r = TextOps.unigramLogProb(d)
      .select("doc_id", "avg_log10p").as[(Long, Double)].collect().toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L) || r(1L) > r(3L), s"got $r")
    // exact check: doc 1 = log10(8/12) (micro-floored)
    assert(math.abs(r(1L) - math.log10(8.0 / 12.0)) < 1e-3, s"doc1 ${r(1L)}")
  }

  test("crossDocSubstrings: copied spans shared, unique docs score zero") {
    import spark.implicits._
    val span = "one two three four five six seven eight"
    val d = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$span iota kappa lambda mu nu xi omicron pi"),
      (3L, "completely different words that never repeat anywhere else at all")
    ).toDF("doc_id", "text")
    val r = Dedup.crossDocSubstrings(d)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    // docs 1 and 2 share exactly the one copied 8-gram; doc 3 none
    assert(r(1L) == 1 && r(2L) == 1 && r(3L) == 0, s"got $r")
    // a sub-n-word doc still gets its report row (zeroed counts, NULL
    // frac) — the cdcChunks discipline; it used to vanish and shift a
    // corpus-wide avg(shared_frac) denominator
    val short = d.unionByName(Seq((4L, "too short")).toDF("doc_id", "text"))
    val row4 = Dedup.crossDocSubstrings(short)
      .where(col("doc_id") === 4L).collect()
    assert(row4.length == 1, "short doc vanished from the report")
    assert(row4.head.getAs[Long]("n_grams") == 0L &&
      row4.head.isNullAt(row4.head.fieldIndex("shared_frac")),
      row4.head.toString)
  }

  test("sampleMixture: realized shares track targets, unlisted sources drop") {
    import graft.pipeline.DataPrep
    import spark.implicits._
    val weights = Map("src0" -> 40, "src1" -> 30, "src2" -> 20, "src3" -> 10)
    val got = DataPrep.sampleMixture(docs, "doc_id", "source", weights)
    val bySrc = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.keySet.subsetOf(weights.keySet), s"unlisted sources leaked: $bySrc")
    val total = bySrc.values.sum.toDouble
    for ((s, w) <- weights) {
      val share = bySrc.getOrElse(s, 0L) / total
      assert(math.abs(share - w / 100.0) < 0.15,
        s"$s share $share vs target ${w / 100.0} ($bySrc)")
    }
    // deterministic across invocations
    assert(got.exceptAll(DataPrep.sampleMixture(docs, "doc_id", "source", weights))
      .count() == 0)
  }

  test("pagerank: the hub outranks symmetric leaves, micro sums stay conservative") {
    import graft.dedup.Dedup
    import spark.implicits._
    // star: 0-1, 0-2, 0-3 — the hub must dominate, leaves tie exactly
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("i", "j")
    val got = Dedup.pagerank(pairs, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L), s"leaves diverged: $got")
    assert(got(0L) > got(1L), s"hub does not dominate: $got")
    // floor leakage only ever loses mass: sum <= 1e6, and stays near it
    val total = got.values.sum
    assert(total <= 1000000L && total > 900000L, s"mass off: $total")
    // exact hand-roll of the same integer recurrence
    var p = Map(0L -> 250000L, 1L -> 250000L, 2L -> 250000L, 3L -> 250000L)
    val deg = Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 3L -> 1L)
    for (_ <- 1 to 3) {
      def in(v: Long) = if (v == 0L) Seq(1L, 2L, 3L) else Seq(0L)
      p = p.keys.map(v => v -> (150000L / 4 +
        in(v).map(u => p(u) * 850000L / (1000000L * deg(u))).sum)).toMap
    }
    assert(got == p, s"recurrence drifted: got $got want $p")
    // past the micro-unit resolution the ranking would silently floor
    // to all-zeros — the guard must refuse loudly instead
    val big = spark.range(0, 150001L)
      .select(col("id").as("i"), (col("id") + 150001L).as("j"))
    // read p_micro (count() would prune the guarded column away —
    // guard-on-read is the correct semantics: an unread value that
    // would have been corrupt harms nobody)
    val e = intercept[Exception] {
      Dedup.pagerank(big, iters = 1).agg(sum("p_micro")).collect()
    }
    assert(e.getMessage.contains("micro-unit resolution"), e.getMessage)
  }

  test("importanceScore: target-vocabulary docs score positive, off-target negative") {
    import graft.text.TextOps
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // targets speak only 'alpha', non-targets only 'beta'; a doc made
    // of target vocabulary must be target_like, and vice versa
    val corpus = Seq((0L, "alpha alpha alpha", true), (1L, "alpha alpha alpha", true),
      (2L, "beta beta beta", false), (3L, "beta beta beta", false))
      .toDF("doc_id", "text", "is_t")
    val got = TextOps.importanceScore(corpus, col("is_t"))
      .select("doc_id", "logw_micro", "target_like")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(0L)._3 && got(1L)._3, s"target docs not target_like: $got")
    assert(!got(2L)._3 && !got(3L)._3, s"off-target docs flagged: $got")
    assert(got(0L)._2 > 0 && got(2L)._2 < 0, s"sign contract broken: $got")
    // exact micro-log arithmetic, hand-derived: alpha has ct=cr=6 so
    // only the global Nr/Nt term remains; beta adds the ct=0 penalty
    def ml(x: Long) = math.floor(math.log10(x.toDouble) * 1e6).toLong
    val global = 3 * (ml(12 + 8192) - ml(6 + 8192))
    assert(got(0L)._2 == global, s"expected $global: $got")
    assert(got(2L)._2 == 3 * (ml(1) - ml(7)) + global, s"got $got")
  }

  test("rrfFuse: both-list docs beat single-list docs, absent ranks contribute zero") {
    import graft.sim.Ann
    import spark.implicits._
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val vec = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Ann.rrfFuse(lex, vec, kConst = 60, topK = 10)
      .as[(Long, Option[Long], Option[Long], Long)].collect()
    val byDoc = got.map(r => r._1 -> r._4).toMap
    // doc 20: 1e6/62 + 1e6/61 = 16129 + 16393; lex-only doc 10: 1e6/61
    assert(byDoc(20L) == 16129L + 16393L && byDoc(10L) == 16393L, s"$byDoc")
    assert(byDoc(40L) == 16129L && byDoc(30L) == 15873L, s"$byDoc")
    // fused order: 20 (both lists) first despite 10 holding lex rank 1
    assert(got.head._1 == 20L, s"got ${got.toList}")
    assert(got.map(_._1).toSet == Set(10L, 20L, 30L, 40L), "a doc vanished")
  }

  test("exifStrip: COM removed with exact byte accounting, non-JPEG untouched") {
    import graft.multimodal.MM
    import spark.implicits._
    // doc_id 0 -> jpeg (pad = 3: COM segment = 4 + 3 = 7 bytes),
    // doc_id 1 -> png, doc_id 2 -> wav
    val docs = Seq((0L, "alpha beta"), (1L, "gamma delta"), (2L, "ep zeta"))
      .toDF("doc_id", "text")
    val got = MM.exifStrip(MM.synthesizePayload(docs))
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._3 == 7L, s"jpeg COM size wrong: ${got(0L)}")
    assert(got(1L)._3 == 0L && got(2L)._3 == 0L, s"clean files touched: $got")
    got.values.foreach { r =>
      assert(r._5, s"strip not verified: $r")
      assert(r._2 - r._4 == r._3, s"byte accounting off: $r")
    }
  }

  test("exifStrip: APP1 Exif AND COM both removed from a hand-built camera JPEG") {
    import graft.multimodal.MM
    import spark.implicits._
    def be2(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def m(a: Int, b: Int) = Array(a.toByte, b.toByte)
    // SOI | APP0(16) | APP1 "Exif\0\0GPS!" (the segment real EXIF GPS
    // tags live in) | COM "abc" | SOF0 h=100 w=200 | body
    val jpeg: Array[Byte] =
      m(0xFF, 0xD8) ++
      (m(0xFF, 0xE0) ++ be2(16) ++ "JFIF".getBytes("UTF-8") ++
        Array[Byte](0, 1, 1, 0) ++ be2(1) ++ be2(1) ++ Array[Byte](0, 0)) ++
      (m(0xFF, 0xE1) ++ be2(12) ++ "Exif".getBytes("UTF-8") ++
        Array[Byte](0, 0) ++ "GPS!".getBytes("UTF-8")) ++
      (m(0xFF, 0xFE) ++ be2(5) ++ "abc".getBytes("UTF-8")) ++
      (m(0xFF, 0xC0) ++ be2(17) ++ Array[Byte](8) ++ be2(100) ++ be2(200) ++
        Array(0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
          .map(_.toByte)) ++
      "XYZ".getBytes("UTF-8")
    val df = Seq((9L, jpeg)).toDF("doc_id", "payload")
    // the 4-hop walk parses the 4-segment chain pre-strip
    val dec = MM.decode(df).collect()(0)
    assert(dec.getAs[Long]("width") == 200 && dec.getAs[Long]("height") == 100,
      dec.toString)
    val r = MM.exifStrip(df).collect()(0)
    assert(r.getAs[Long]("removed_bytes") == 21, r.toString) // 14 APP1 + 7 COM
    assert(r.getAs[Long]("n_before") - r.getAs[Long]("n_after") == 21, r.toString)
    assert(r.getAs[Boolean]("strip_ok"), r.toString)
  }

  test("exifStrip: metadata at the FOURTH walk position is still scrubbed") {
    import graft.multimodal.MM
    import spark.implicits._
    def be2(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def m(a: Int, b: Int) = Array(a.toByte, b.toByte)
    // SOI | APP0(16) | DQT(6) | SOF0 | APP1 "Exif..GPS!" — the r10
    // review found the metadata scan ran one hop SHORT of the shared
    // 4-hop walk, so this legal layout kept its GPS segment while
    // reporting strip_ok=true
    val jpeg: Array[Byte] =
      m(0xFF, 0xD8) ++
      (m(0xFF, 0xE0) ++ be2(16) ++ "JFIF".getBytes("UTF-8") ++
        Array[Byte](0, 1, 1, 0) ++ be2(1) ++ be2(1) ++ Array[Byte](0, 0)) ++
      (m(0xFF, 0xDB) ++ be2(6) ++ Array[Byte](1, 2, 3, 4)) ++
      (m(0xFF, 0xC0) ++ be2(17) ++ Array[Byte](8) ++ be2(100) ++ be2(200) ++
        Array(0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
          .map(_.toByte)) ++
      (m(0xFF, 0xE1) ++ be2(12) ++ "Exif".getBytes("UTF-8") ++
        Array[Byte](0, 0) ++ "GPS!".getBytes("UTF-8")) ++
      "XYZ".getBytes("UTF-8")
    val df = Seq((4L, jpeg)).toDF("doc_id", "payload")
    val r = MM.exifStrip(df).collect()(0)
    assert(r.getAs[Long]("removed_bytes") == 14L, r.toString) // the APP1
    assert(r.getAs[Boolean]("strip_ok"), r.toString)
    assert(r.getAs[Long]("n_before") - r.getAs[Long]("n_after") == 14L,
      r.toString)
  }

  test("mm_phash parity canary: no band bucket reaches the star ceiling") {
    import graft.multimodal.MM
    // the Spark side caps degenerate buckets with star edges past
    // starAbove=256; the DuckDB oracle emits ALL band pairs. Parity
    // therefore REQUIRES every registered-corpus bucket to stay under
    // the ceiling — this canary fails BEFORE a corpus regeneration
    // could surface as a confusing hash mismatch (and if it ever
    // fires, mirror the cap in the oracle or raise starAbove there)
    val aug = graft.pipeline.PipelineQueries.plantTextTwins(
      Tables.load(spark, sfDir, "documents").select("doc_id", "text"),
      mod = 9, residue = 1, offset = 768000L)
    val sigs = MM.phash(MM.synthesizePayload(aug))
    val maxBucket = sigs.select(col("doc_id"),
        explode(expr("""array(hash_hi div 65536, hash_hi % 65536,
          |hash_lo div 65536, hash_lo % 65536)""".stripMargin)).as("key"))
      .groupBy("key").count().agg(max("count")).collect().head.getLong(0)
    assert(maxBucket <= 256, s"band bucket $maxBucket past the star ceiling")
  }

  test("exifStrip: a chain DEEPER than the walk is never blessed strip_ok") {
    import graft.multimodal.MM
    import spark.implicits._
    def be2(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def m(a: Int, b: Int) = Array(a.toByte, b.toByte)
    def seg(mk: (Int, Int), body: Int) = m(mk._1, mk._2) ++ be2(body + 2) ++
      Array.fill[Byte](body)(1)
    // SOI | APP0 | APP2 | APP2 | DQT | APP1(GPS) | SOF0: the metadata
    // sits at walk position 5 — beyond the 4-hop bound. No probe sees
    // it, so the scrub cannot PROVE the image clean; strip_ok must be
    // false, never the silent all-clear the r11 review caught
    val jpeg: Array[Byte] =
      m(0xFF, 0xD8) ++ seg((0xFF, 0xE0), 8) ++ seg((0xFF, 0xE2), 6) ++
        seg((0xFF, 0xE2), 6) ++ seg((0xFF, 0xDB), 4) ++
        (m(0xFF, 0xE1) ++ be2(12) ++ "Exif".getBytes("UTF-8") ++
          Array[Byte](0, 0) ++ "GPS!".getBytes("UTF-8")) ++
        (m(0xFF, 0xC0) ++ be2(17) ++ Array[Byte](8) ++ be2(100) ++ be2(200) ++
          Array.fill[Byte](10)(1))
    val df = Seq((7L, jpeg)).toDF("doc_id", "payload")
    val r = MM.exifStrip(df).collect()(0)
    assert(!r.getAs[Boolean]("strip_ok"), r.toString)
    assert(r.getAs[Long]("removed_bytes") == 0L, r.toString)
    // a clean SHALLOW jpeg still earns its all-clear (SOF reached)
    val clean: Array[Byte] =
      m(0xFF, 0xD8) ++ seg((0xFF, 0xE0), 8) ++
        (m(0xFF, 0xC0) ++ be2(17) ++ Array[Byte](8) ++ be2(100) ++ be2(200) ++
          Array.fill[Byte](10)(1))
    val c = MM.exifStrip(Seq((8L, clean)).toDF("doc_id", "payload")).collect()(0)
    assert(c.getAs[Boolean]("strip_ok") && c.getAs[Long]("removed_bytes") == 0L,
      c.toString)
    // the STRIPPED branch of the same hole (r12 review): metadata IS
    // found and spliced (COM at position 2), but SOF sits past the
    // walk — _w/_ht never parsed, so null <=> null would bless the
    // strip while a 6th-position APP1 survives. No proof, no all-clear.
    val deepStripped: Array[Byte] =
      m(0xFF, 0xD8) ++ seg((0xFF, 0xFE), 6) ++ seg((0xFF, 0xE2), 6) ++
        seg((0xFF, 0xE2), 6) ++ seg((0xFF, 0xDB), 4) ++ seg((0xFF, 0xDB), 4) ++
        (m(0xFF, 0xE1) ++ be2(12) ++ "Exif".getBytes("UTF-8") ++
          Array[Byte](0, 0) ++ "GPS!".getBytes("UTF-8")) ++
        (m(0xFF, 0xC0) ++ be2(17) ++ Array[Byte](8) ++ be2(100) ++ be2(200) ++
          Array.fill[Byte](10)(1))
    val d = MM.exifStrip(Seq((9L, deepStripped)).toDF("doc_id", "payload")).collect()(0)
    assert(!d.getAs[Boolean]("strip_ok"), d.toString)
    // resizeToFit: the parse failure must not read as a successful
    // patch — same proof rule (decode says decode_ok=false here too)
    val rz = MM.resizeToFit(Seq((7L, jpeg)).toDF("doc_id", "payload"), 64).collect()(0)
    assert(!rz.getAs[Boolean]("patch_ok"), rz.toString)
    // a NULL doc_id row is dropped at the featureExtract scan, never
    // an encoder NPE that aborts the batch
    val withNullId = Seq((java.lang.Long.valueOf(1L), Array[Byte](1, 2)),
      (null.asInstanceOf[java.lang.Long], Array[Byte](3)))
      .toDF("doc_id", "payload")
    val feats = MM.featureExtract(withNullId, dim = 2)
      .select("doc_id").as[Long].collect()
    assert(feats.sameElements(Array(1L)), feats.mkString(","))
  }

  test("audioInfo: non-canonical WAV layouts are excluded, not mis-read") {
    import graft.multimodal.MM
    import spark.implicits._
    def le4(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // an 18-byte EXTENSIBLE fmt chunk: byte offsets 41+ no longer hold
    // the data length — reading them anyway reported garbage
    // n_samples/duration that still passed the sr > 0 gate
    val ext = "RIFF".getBytes ++ le4(60) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(18) ++ Array[Byte](1, 0, 1, 0) ++ le4(8000) ++
      le4(16000) ++ Array[Byte](2, 0, 16, 0, 0, 0) ++
      "data".getBytes ++ le4(4) ++ Array[Byte](1, 2, 3, 4)
    assert(MM.audioInfo(Seq((1L, ext)).toDF("doc_id", "payload")).isEmpty,
      "extensible-fmt WAV entered triage with garbage offsets")
    // canonical 16-byte-PCM layout still parses
    val ok = "RIFF".getBytes ++ le4(40) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ Array[Byte](1, 0, 1, 0) ++ le4(8000) ++
      le4(16000) ++ Array[Byte](2, 0, 16, 0) ++
      "data".getBytes ++ le4(4) ++ Array[Byte](1, 2, 3, 4)
    val r = MM.audioInfo(Seq((2L, ok)).toDF("doc_id", "payload")).collect()(0)
    assert(r.getAs[Long]("sample_rate") == 8000L &&
      r.getAs[Long]("n_samples") == 2L, r.toString)
  }

  test("decode/audioInfo: a WEBP RIFF container is NOT audio") {
    import graft.multimodal.MM
    import spark.implicits._
    // RIFF + size + 'WEBP' form tag: RIFF yes, WAVE no
    val webp = "RIFF".getBytes("UTF-8") ++ Array[Byte](10, 0, 0, 0) ++
      "WEBPVP8 ".getBytes("UTF-8") ++ Array.tabulate[Byte](24)(_.toByte)
    val df = Seq((3L, webp)).toDF("doc_id", "payload")
    val dec = MM.decode(df).collect()(0)
    assert(dec.getAs[String]("format") == "unknown", dec.toString)
    assert(dec.isNullAt(dec.fieldIndex("sample_rate")), dec.toString)
    assert(MM.audioInfo(df).isEmpty,
      "image container entered the audio triage")
  }

  test("featureExtract: a NULL payload yields a NULL feature row, not a job abort") {
    import graft.multimodal.MM
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3, 4)), (2L, null: Array[Byte]))
      .toDF("doc_id", "payload")
    val rows = MM.featureExtract(df, dim = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(2L).isNullAt(1), "null payload must stay null")
    assert(!rows(1L).isNullAt(1))
  }

  test("phash: twin with an unsampled byte change collides at hamming 0") {
    import graft.multimodal.MM
    import spark.implicits._
    val text = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val pair = Seq((1L, text),
      (768001L, text.dropRight(1) + "~")).toDF("doc_id", "text")
    val sigs = MM.phash(MM.synthesizePayload(pair))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(sigs(1L) == sigs(768001L), s"twin hash drifted: $sigs")
    // determinism across invocations
    val again = MM.phash(MM.synthesizePayload(pair))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(again == sigs)
  }

  test("phashPairs: band rendezvous honors the pigeonhole contract, flood emits star edges") {
    import graft.multimodal.MM
    import spark.implicits._
    // A~B differ in 2 bits confined to one band -> must pair (3 bands
    // untouched); A~D spread flips across ALL 4 bands -> no rendezvous
    // even though hamming 4 <= maxHamming (the documented recall edge)
    val sigs = Seq((1L, 0L, 0L), (2L, 3L, 0L),
      (4L, 65537L, 65537L)).toDF("doc_id", "hash_hi", "hash_lo")
    val got = MM.phashPairs(sigs, maxHamming = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L)), s"got $got")
    // 300 identical signatures with starAbove=256: star edges (K-1 to
    // the min member), never the K(K-1)/2 quadratic expansion
    val flood = (0L until 300L).map(i => (i, 42L, 42L))
      .toDF("doc_id", "hash_hi", "hash_lo")
    val edges = MM.phashPairs(flood, maxHamming = 6, starAbove = 256)
      .as[(Long, Long, Long)].collect()
    assert(edges.length == 299 && edges.forall(e => e._1 == 0L && e._3 == 0L),
      s"flood produced ${edges.length} edges")
    // the star still reconstructs the full duplicate group
    val comp = graft.dedup.Dedup.connectedComponents(
      MM.phashPairs(flood, 6, 256).select("i", "j"))
    assert(comp.select("lbl").distinct().count() == 1L)
  }

  test("tfidf: rare terms outrank saturating terms, ranking window stays doc-partitioned") {
    import graft.text.TextOps
    import spark.implicits._
    // 'common' is in every doc (idf 0 to micro precision at N=df);
    // 'rare' only in doc 0 — it must take rank 1 there despite tf 1
    val corpus = Seq((0L, "common rare common"), (1L, "common common common"),
      (2L, "common x common")).toDF("doc_id", "text")
    val got = TextOps.tfidf(corpus, topK = 2)
      .select("doc_id", "rnk", "token").as[(Long, Long, String)].collect().toSet
    assert(got.contains((0L, 1L, "rare")), s"rare term not rank 1: $got")
    // idf(common) = mlog(4) - mlog(4) = 0 -> score 0 for every doc
    val p = TextOps.tfidf(corpus, 2).queryExecution.optimizedPlan.toString()
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(specs.nonEmpty && specs.forall(_.contains("windowspecdefinition(doc_id")),
      s"tfidf window not doc-partitioned:\n$p")
  }

  test("bm25: tf raises, length normalizes, non-matching docs absent, top-k bounded") {
    import graft.text.TextOps
    import spark.implicits._
    val corpus = Seq(
      (0L, "hash hash hash pad pad pad"),   // tf 3, dl 6
      (1L, "hash pad pad pad pad pad"),     // tf 1, dl 6
      (2L, "hash pad"),                     // tf 1, dl 2 (short)
      (3L, "pad pad pad pad pad pad")       // no hit
    ).toDF("doc_id", "text")
    val got = TextOps.bm25(corpus, Seq("hash"), topK = 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect()
    val score = got.toMap
    assert(!score.contains(3L), s"non-matching doc leaked: $got")
    assert(score(0L) > score(1L), s"higher tf must outrank: $got")
    assert(score(2L) > score(1L), s"shorter doc must outrank at same tf: $got")
    // ranked output is descending with doc_id tie-break
    assert(got.map(_._2).toList == got.map(_._2).sortBy(-_).toList, got.toList)
    val p = TextOps.bm25(corpus, Seq("hash"), 2).queryExecution.executedPlan.toString()
    assert(p.contains("TakeOrderedAndProject"), s"top-k lost:\n$p")
  }

  test("sampleReservoir: nested prefixes, short groups whole, heap not window") {
    import graft.pipeline.DataPrep
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, if (i < 3) "tiny" else s"g${i % 2}"))
      .toDF("doc_id", "grp")
    val k8 = DataPrep.sampleReservoir(df, "doc_id", "grp", 8)
      .as[(String, Long, Long)].collect()
    // the k=4 draw must be exactly the first 4 ranks of the k=8 draw
    val k4 = DataPrep.sampleReservoir(df, "doc_id", "grp", 4)
      .as[(String, Long, Long)].collect().toSet
    assert(k4 == k8.filter(_._2 <= 4).toSet, "prefix nesting broken")
    // a group smaller than k yields every row, ranked
    assert(k8.filter(_._1 == "tiny").map(_._3).toSet == Set(0L, 1L, 2L))
    assert(k8.filter(_._1 == "tiny").map(_._2).sorted.toList == List(1L, 2L, 3L))
    // ranking rides the bounded heap, not a per-group window sort
    val p = DataPrep.sampleReservoir(df, "doc_id", "grp", 8)
      .queryExecution.executedPlan.toString()
    assert(p.contains("topk_struct") && !p.contains("windowspecdefinition"), p)
  }

  test("sampleMixture: a weighted source with zero corpus rows collapses the mixture to empty") {
    import graft.pipeline.DataPrep
    // "ghost" never appears in docs: the feasibility min must see its
    // n_s = 0 (T = 0 → empty), not silently renormalize over the rest
    val weights = Map("src0" -> 50, "ghost" -> 50)
    assert(DataPrep.sampleMixture(docs, "doc_id", "source", weights).isEmpty)
  }

  test("TextOps.vocabBuild: heap selection equals the window form, coverage telescopes") {
    import spark.implicits._
    val corpus = Seq((1L, "a a a b b c"), (2L, "b b a d")).toDF("doc_id", "text")
    // counts: a=4, b=4, c=1, d=1 → top-3 = b(4), a(4), d(1) under
    // (cnt DESC, token DESC); total 10
    val got = TextOps.vocabBuild(corpus, 3)
      .select("rank", "token", "cnt", "pct", "cum_pct")
      .as[(Long, String, Long, Double, Double)].collect().toList.sortBy(_._1)
    assert(got == List((1L, "b", 4L, 0.4, 0.4), (2L, "a", 4L, 0.4, 0.8),
      (3L, "d", 1L, 0.1, 0.9)), s"got $got")
  }

  test("TextOps.blocklist: occurrence vs distinct counts, any hit drops") {
    import spark.implicits._
    val corpus = Seq((1L, "spam spam good slow"), (2L, "all clean here"),
      (3L, " ")).toDF("doc_id", "text")
    val got = TextOps.blocklist(corpus, Seq("spam", "slow"))
      .select("doc_id", "n_hits", "n_distinct_hits", "dropped")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 3L, 2L, true), (2L, 0L, 0L, false),
      (3L, 0L, 0L, false)), s"got $got")
  }

  test("TextOps.winnowing: shared run >= w+k-1 words shares a fingerprint; short docs out of contract") {
    import spark.implicits._
    val shared = (1 to 11).map(i => s"tok$i").mkString(" ") // k+w-1 = 11 words
    val corpus = Seq(
      (1L, s"one unique prefix here now $shared"),
      (2L, s"$shared and a different tail entirely"),
      (3L, "too short")).toDF("doc_id", "text")
    val fps = TextOps.winnowing(corpus, 4, 8)
    assert(fps.where(col("doc_id") === 3).isEmpty, "short doc must be out of contract")
    val one = fps.where(col("doc_id") === 1).select("fp_digest").as[String].head()
    val two = fps.where(col("doc_id") === 2).select("fp_digest").as[String].head()
    assert(one != two, "digests of different docs should differ")
    // the winnowing guarantee: both docs select at least one common
    // fingerprint from the shared 11-word run — recompute the selected
    // sets directly and intersect
    val w = org.apache.spark.sql.expressions.Window
    val setOf = (id: Long) => {
      val ws2 = corpus.where(col("doc_id") === id)
        .withColumn("wd", split(col("text"), " "))
      val grams = ws2.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(wd) - 4), i -> md5(concat_ws(' ', wd[i], wd[i+1], wd[i+2], wd[i+3])))")))
      val byDoc = w.partitionBy("doc_id")
      grams.withColumn("_g", count(lit(1)).over(byDoc))
        .withColumn("_sel", min(col("col")).over(
          byDoc.orderBy("pos").rowsBetween(w.currentRow, 7)))
        .where(col("pos") <= col("_g") - 8)
        .select("_sel").as[String].collect().toSet
    }
    val inter = setOf(1L).intersect(setOf(2L))
    assert(inter.nonEmpty, "shared 11-word run must share a selected fingerprint")
  }

  test("MM.sceneDetect: cuts where the fingerprint changes, scene_id counts scenes") {
    import spark.implicits._
    import graft.multimodal.MM
    // frame size lands at 16+doc_id%32; pick a doc whose frames repeat:
    // synthesize directly — 6 frames of 4 bytes: AAAA AAAA BBBB BBBB BBBB CCCC
    val fs = 4
    val frames = Seq("AAAA", "AAAA", "BBBB", "BBBB", "BBBB", "CCCC")
    val payload = Array[Byte]('G', 'V', 'I', 'D', 0, 6, 0, fs.toByte) ++
      frames.flatMap(_.getBytes("UTF-8"))
    val vids = Seq((1L, payload)).toDF("doc_id", "payload")
    val got = MM.sceneDetect(vids)
      .select("frame_idx", "is_cut", "scene_id")
      .as[(Long, Boolean, Long)].collect().toList.sortBy(_._1)
    assert(got == List((0L, true, 1L), (1L, false, 1L), (2L, true, 2L),
      (3L, false, 2L), (4L, false, 2L), (5L, true, 3L)), s"got $got")
  }

  test("TextOps.chunk: full coverage with overlap, short doc = one chunk, tail runs short") {
    import spark.implicits._
    import graft.text.TextOps
    val d40 = (1 to 40).map(i => s"t$i").mkString(" ")
    val corpus = Seq((1L, d40), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.chunk(corpus, 32, 24)
      .select("doc_id", "chunk_idx", "tok_start", "tok_len")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 0L, 32L), (1L, 1L, 24L, 16L), (2L, 0L, 0L, 3L)),
      s"got $got")
    // every token of doc 1 is covered by some chunk
    val covered = got.filter(_._1 == 1L)
      .flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 40L).toSet, "chunking left a token uncovered")
    // chunk text is the exact token slice
    val t0 = TextOps.chunk(corpus, 32, 24)
      .where(col("doc_id") === 1 && col("chunk_idx") === 1)
      .select("chunk_text").as[String].head()
    assert(t0 == (25 to 40).map(i => s"t$i").mkString(" "), s"got $t0")
  }

  test("dedup_keep_best: one keeper per cluster, keeper has the cluster's max quality") {
    val got = SparkEntry.queries("dedup_keep_best")(spark, sfDir)
    val perCluster = got.groupBy("cluster")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        max(col("quality")).as("maxq"),
        max(when(col("keep"), col("quality"))).as("keepq"))
    assert(perCluster.where(col("n_keep") =!= 1).isEmpty,
      "every cluster needs exactly one keeper")
    assert(perCluster.where(col("keepq") =!= col("maxq")).isEmpty,
      "keeper must carry the cluster's max quality")
  }

  test("video dedup: identical-content twins pair at jaccard 1, unrelated videos don't") {
    import graft.multimodal.MM
    import graft.dedup.Dedup
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val textA = (1 to 100).map(i => s"a$i").mkString(" ")
    val textB = (1 to 100).map(i => s"b$i").mkString(" ")
    // 0 and 416000 share frame geometry AND content; 1 is unrelated
    val vids = Seq((0L, textA), (416000L, textA), (1L, textB))
      .toDF("doc_id", "text")
    val fpSets = MM.frameSample(MM.synthesizeVideo(vids), every = 1)
      .groupBy("doc_id")
      .agg(array_sort(array_distinct(collect_list(col("fp").cast("string"))))
        .as("shs"))
    val got = Dedup.ngramJaccard(vids, 0.8, pruneUnique = false,
        maxDf = Some(8), minShared = 2, shingleTable = Some(fpSets))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((0L, 416000L, 1.0)), s"got $got")
  }

  test("cdcChunks: chunks reconstruct the text; a prefix edit shifts only the head chunks") {
    import graft.dedup.Dedup
    import spark.implicits._
    val base = (1 to 120).map(i => s"w$i").mkString(" ")
    val pair = Seq((1L, base), (2L, "INSERTED PREFIX " + base))
      .toDF("doc_id", "text")
    // reconstruction: chunk bytes account for the whole text
    val rebuilt = Dedup.cdcChunks(pair)
      .select("doc_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(rebuilt(1L) == base.length.toLong, s"doc 1 bytes ${rebuilt(1L)}")
    assert(rebuilt(2L) == base.length.toLong + 16, s"doc 2 bytes ${rebuilt(2L)}")
    // shift robustness: the prefixed twin re-synchronizes after the
    // first content-defined boundary, so MOST of doc 1's chunks are
    // duplicated in doc 2 — the property fixed-size chunking lacks
    val report = Dedup.cdcChunks(pair)
      .select("doc_id", "n_chunks", "n_dup_chunks")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (n1, d1) = report(1L)
    assert(d1 >= n1 / 2,
      s"CDC lost shift robustness: only $d1 of $n1 chunks survive a prefix edit")
  }

  test("dedup_soft: weights are exact cluster reciprocals, unique docs at full weight") {
    val got = SparkEntry.queries("dedup_soft")(spark, sfDir)
    assert(got.where(col("weight_micro") =!=
      expr("1000000 div cluster_size")).isEmpty, "weight arithmetic drifted")
    assert(got.where(col("cluster_size") === 1 && col("weight_micro") =!= 1000000L)
      .isEmpty, "unique docs must train at full weight")
    // every cluster's members carry the same declared size, and the
    // declared size IS the member count
    val bad = got.groupBy("cluster")
      .agg(count(lit(1)).as("n"), max("cluster_size").as("s"),
        min("cluster_size").as("s2"))
      .where(col("n") =!= col("s") || col("s") =!= col("s2"))
    assert(bad.isEmpty, "cluster_size disagrees with membership")
    // no content is ever dropped: one row per document
    assert(got.count() == docs.count(), "soft dedup dropped documents")
  }

  test("Quantize.dimStats: collapsed dims flagged, micro-unit means exact") {
    import spark.implicits._
    import graft.sim.Quantize
    val vecs = Seq(
      (1L, Array(1.0f, 0.5f, 0.25f)),
      (2L, Array(3.0f, 0.5f, -0.25f))
    ).toDF("vec_id", "embedding")
    val got = Quantize.dimStats(vecs, eps = 1e-4)
      .select("dim", "n", "mean_v", "min_v", "max_v", "collapsed")
      .as[(Long, Long, Double, Double, Double, Boolean)].collect().toSet
    assert(got == Set(
      (0L, 2L, 2.0, 1.0, 3.0, false),
      (1L, 2L, 0.5, 0.5, 0.5, true),    // constant dim -> collapsed
      (2L, 2L, 0.0, -0.25, 0.25, false)), s"got $got")

    // the audit SURVIVES what it audits (r12 review: floor·cast on a
    // NaN was an ANSI error that killed the whole report): non-finite
    // values are counted per dim and excluded from the stats; a dim
    // with no finite values reports NULL stats, collapsed = false
    val dirty = Seq(
      (1L, Array(1.0f, Float.NaN)),
      (2L, Array(3.0f, Float.PositiveInfinity))).toDF("vec_id", "embedding")
    val d = Quantize.dimStats(dirty, eps = 1e-4).orderBy("dim").collect()
    assert(d.length == 2)
    assert(d(0).getLong(1) == 2 && d(0).getLong(2) == 0 &&
      d(0).getDouble(3) == 2.0, s"clean dim: ${d(0)}")
    assert(d(1).getLong(1) == 2 && d(1).getLong(2) == 2 &&
      d(1).isNullAt(3) && d(1).isNullAt(4) && !d(1).getBoolean(6),
      s"all-non-finite dim: ${d(1)}")
  }

  test("quantizer/kmeans/SRP surfaces exclude non-finite vectors instead of erroring") {
    import spark.implicits._
    import graft.sim.Quantize
    val dirty = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.05f)),
      (3L, Array(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    // int8 report: corrupt vector has no defined code — it now gets an
    // explicit NULL-metrics row instead of silently vanishing from the
    // per-vector audit (r13 review; unguarded, ONE NaN ANSI-errored all)
    val qrRows = Quantize.int8Report(dirty)
      .select("vec_id", "scale").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(qrRows.keySet == Set(1L, 2L, 3L), s"int8Report rows: $qrRows")
    assert(!qrRows(1L) && !qrRows(2L) && qrRows(3L),
      s"NULL-metrics backfill: $qrRows")
    // quantized search: corrupt vector neither indexes nor queries
    val ann = Quantize.annInt8(dirty, dirty, 1)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    assert(ann == Set((1L, 2L), (2L, 1L)), s"annInt8 pairs: $ann")
    // kmeans: assignment report over the finite vectors only
    val ks = Ann.kmeans(dirty, k = 2, iters = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(ks == Set(1L, 2L), s"kmeans rows: $ks")
    // semanticDedup: survivorship must NOT lose the corrupt doc — it
    // gets a kept, own-group, no-verdict row
    val sd = Ann.semanticDedup(dirty, k = 2, iters = 1, threshold = 0.95)
      .select("vec_id", "sem_group", "keep").as[(Long, Long, Boolean)]
      .collect().map { case (v, g, kp) => v -> ((g, kp)) }.toMap
    assert(sd.keySet == Set(1L, 2L, 3L), s"semanticDedup rows: $sd")
    assert(sd(3L) == ((3L, true)), s"corrupt doc verdict: ${sd(3L)}")
    // SRP near-dup: the NaN vector emits no pair (unguarded, its NaN
    // verify cosine PASSED >= t under NaN-is-largest ordering)
    val srp = Ann.srpDupPairs(dirty, threshold = 0.9, bands = 8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(!srp.exists(p => p._1 == 3L || p._2 == 3L), s"SRP paired the NaN vector: $srp")
  }

  test("Ann.rangeSearch: threshold inclusive, self excluded, matches bruteForce scores") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.9f, 0.1f)),   // cos ≈ 0.994 to q1
      (3L, Array(0f, 1f)),       // cos 0
      (4L, Array(-1f, 0f))       // cos −1
    ).toDF("vec_id", "embedding")
    val got = Ann.rangeSearch(vecs, vecs.where(col("vec_id") === 1), 0.5)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), s"got $got")
    // every reported neighbor is exactly a bruteForce hit at/above the
    // threshold (same scoring, different cutoff contract)
    val bf = Ann.bruteForce(vecs, vecs.where(col("vec_id") === 1), 3)
      .where(col("score") >= 0.5).select("q_id", "nn_id")
      .as[(Long, Long)].collect().toSet
    assert(got == bf, s"range $got vs bruteforce $bf")
  }

  test("Dedup.incremental: corpus dup beats batch dup, min-id twin kept, bloom is exact") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val shard = Seq(
      (10L, "alpha"),   // verbatim corpus dup
      (11L, "gamma"), (12L, "gamma"), // twin pair: 11 kept, 12 dup_in_batch
      (13L, "delta"),   // fresh
      (14L, "beta"), (15L, "beta")    // corpus dup wins over batch dup for BOTH
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(corpus, shard)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "dup_in_corpus", 11L -> "kept", 12L -> "dup_in_batch",
      13L -> "kept", 14L -> "dup_in_corpus", 15L -> "dup_in_corpus"), s"got $got")
    // empty shard: no rows, no failure (the bloom aggregate over zero
    // digests must not poison the corpus filter)
    assert(Dedup.incremental(corpus, shard.where(lit(false))).isEmpty)
  }

  test("bpeTrain: rule-for-rule equal to a reference BPE on the same word counts") {
    import spark.implicits._
    // low*5 lower*2 newest*6 widest*3 — the classic Sennrich fixture
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = graft.text.TextOps.bpeTrain(docs, 6).collect()
      .map(r => (r.getAs[Long]("merge_idx"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("new_sym"),
        r.getAs[Long]("pair_count"))).toSeq.sortBy(_._1)
    // independent reference implementation (greedy, count desc then
    // lexicographic pair, left-to-right application)
    var vocab: Map[Vector[String], Long] =
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
        .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val expected = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (i <- 0 until 6) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) += c
      val ((l, r), pc) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      expected += ((i.toLong, l, r, l + r, pc))
      vocab = vocab.toSeq.map { case (syms, c) =>
        val m = scala.collection.mutable.ArrayBuffer[String]()
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
            m += l + r; j += 2
          } else { m += syms(j); j += 1 }
        }
        (m.toVector, c)
      }.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    }
    assert(got == expected.toSeq, s"got ${got.mkString(";")}")
  }

  test("unigramTrain: piece-for-piece equal to an independent Viterbi-EM implementation") {
    import spark.implicits._
    val wordCnt = Map("lowest" -> 6L, "low" -> 4L, "newest" -> 5L,
      "wide" -> 3L, "widest" -> 2L)
    val text = wordCnt.toSeq.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w) }.mkString(" ")
    val docsDf = Seq((1L, text)).toDF("doc_id", "text")
    val P = 4; val seedM = 12; val finalM = 6; val rounds = 2
    val got = graft.text.TextOps.unigramTrain(docsDf, P, seedM, finalM, rounds)
      .collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("piece_len"),
        r.getAs[Long]("count"), r.getAs[Long]("cost_micro"))).toSet

    // ---- independent reference implementation ----
    def mlog(x: Long) = math.floor(math.log10((x + 1).toDouble) * 1e6).toLong
    val subCnt = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, c) <- wordCnt; l <- 1 to math.min(P, w.length);
         p <- 0 to w.length - l)
      subCnt(w.substring(p, p + l)) += c
    val singles = subCnt.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multis = subCnt.filter(_._1.length > 1).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(seedM)
    def costs(inv: Seq[(String, Long)]): Map[String, Long] = {
      val total = inv.map(_._2).sum
      inv.map { case (p, n) => (p, mlog(total) - mlog(n)) }.toMap
    }
    val BIG = 99999999999L
    def viterbi(w: String, cost: Map[String, Long]): Seq[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(0L)
      for (i <- 1 to n)
        best(i) = (1 to math.min(P, i)).map(j =>
          best(i - j) + cost.getOrElse(w.substring(i - j, i), BIG)).min
      var pos = n
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (pos > 0) {
        val j = (1 to math.min(P, pos)).find(j =>
          best(pos) == best(pos - j) +
            cost.getOrElse(w.substring(pos - j, pos), BIG)).get
        out += w.substring(pos - j, pos); pos -= j
      }
      out.reverse.toSeq
    }
    // brute-force check: the DP cost IS the minimum over every
    // segmentation with pieces <= P chars
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(P, w.length)).flatMap(j =>
        allSegs(w.drop(j)).map(w.take(j) +: _))
    val seedCost = costs(singles ++ multis)
    for (w <- wordCnt.keys) {
      val dp = viterbi(w, seedCost).map(p => seedCost.getOrElse(p, BIG)).sum
      val brute = allSegs(w)
        .map(_.map(p => seedCost.getOrElse(p, BIG)).sum).min
      assert(dp == brute, s"$w: dp $dp vs brute $brute")
    }
    var model = costs(singles ++ multis)
    var modelPieces = (singles ++ multis).map(_._1)
    var last = (singles ++ multis).toMap
    for (r <- 1 to rounds) {
      val counted = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((w, c) <- wordCnt; p <- viterbi(w, model)) counted(p) += c
      val keep = seedM - ((seedM - finalM) * r) / rounds
      val sing = singles.map { case (p, _) => (p, counted(p)) }
      val mult = modelPieces.filter(_.length > 1).map(p => (p, counted(p)))
        .sortBy { case (p, n) => (-n, p) }.take(keep).filter(_._2 > 0)
      last = (sing ++ mult).toMap
      model = costs(sing ++ mult)
      modelPieces = (sing ++ mult).map(_._1)
    }
    val expected = model.map { case (p, c) =>
      (p, p.length.toLong, last(p), c) }.toSet
    assert(got == expected,
      s"got ${got.toSeq.sorted.mkString(";")}\nexp ${expected.toSeq.sorted.mkString(";")}")

    // the APPLY half on the same fixture: per-doc fertility must match
    // token counts from the reference Viterbi under the final model
    val applied = graft.text.TextOps
      .unigramApply(docsDf, P, seedM, finalM, rounds).collect()
    assert(applied.length == 1)
    val row = applied(0)
    val refTokens = wordCnt.map { case (w, c) => viterbi(w, model).size * c }.sum
    val refWords = wordCnt.values.sum
    val refChars = wordCnt.map { case (w, c) => w.length * c }.sum
    assert(row.getAs[Long]("n_words") == refWords, row.toString)
    assert(row.getAs[Long]("n_chars") == refChars, row.toString)
    assert(row.getAs[Long]("n_tokens") == refTokens, row.toString)
    assert(row.getAs[Long]("chars_per_token_micro") ==
      refChars * 1000000L / refTokens, row.toString)
  }

  test("tokenizer_unigram: alphabet coverage, count-cost monotonicity, determinism") {
    val q = SparkEntry.queries("tokenizer_unigram")
    val a = q(spark, sfDir).collect()
    assert(a.toSeq == q(spark, sfDir).collect().toSeq, "nondeterministic train")
    val rows = a.map(r => (r.getAs[String]("piece"), r.getAs[Long]("piece_len"),
      r.getAs[Long]("count"), r.getAs[Long]("cost_micro")))
    // every [a-z0-9] char of the corpus survives as a single-char piece
    val corpusChars = graft.core.Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), "")).as("c"))
      .where(col("c").rlike("^[a-z0-9]$"))
      .distinct().collect().map(_.getString(0)).toSet
    val singlePieces = rows.filter(_._2 == 1).map(_._1).toSet
    assert(corpusChars.subsetOf(singlePieces),
      s"missing singles: ${corpusChars -- singlePieces}")
    // final costs come from final counts: higher count => cost no higher
    val byCount = rows.sortBy(-_._3)
    byCount.zip(byCount.tail).foreach { case (x, y) =>
      assert(x._4 <= y._4, s"cost not monotone: $x vs $y")
    }
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 5 && r._3 >= 0))
  }

  test("curriculum_order: phases monotone in score, in range, covering every doc") {
    val rows = SparkEntry.queries("curriculum_order")(spark, sfDir).collect()
    val nDocs = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(rows.length == nDocs)
    assert(rows.forall(r => r.getAs[Long]("phase") >= 0L && r.getAs[Long]("phase") <= 3L))
    // a doc in a later phase never has a lower score than one in an
    // earlier phase (phases are cell-aligned score ranges)
    val byPhase = rows.groupBy(_.getAs[Long]("phase")).toSeq.sortBy(_._1)
    for (Seq((_, lo), (_, hi)) <- byPhase.sliding(2).toSeq if lo.nonEmpty && hi.nonEmpty)
      assert(lo.map(_.getAs[Long]("score_micro")).max <=
        hi.map(_.getAs[Long]("score_micro")).min)
  }

  test("eval_ndcg: dcg never beats idcg, ndcg bounded by 1e6, ideal self-consistency") {
    val rows = SparkEntry.queries("eval_ndcg")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (dcg, idcg, ndcg) = (r.getAs[Long]("dcg"), r.getAs[Long]("idcg"),
        r.getAs[Long]("ndcg_ppm"))
      assert(dcg <= idcg, s"dcg $dcg > idcg $idcg")
      assert(ndcg <= 1000000L && ndcg >= 0L, s"ndcg $ndcg out of range")
      assert(idcg == 0 || ndcg == dcg * 1000000L / idcg)
    }
  }

  test("eval_calibration: bins tile the corpus, rates bounded, means monotone by bin") {
    val rows = SparkEntry.queries("eval_calibration")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("bin"))
    val nDocs = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows.forall { r =>
      val p = r.getAs[Long]("pos_rate_ppm"); p >= 0L && p <= 1000000L })
    // equal-width bins over the score axis: per-bin means must ascend
    val means = rows.map(_.getAs[Long]("mean_score_micro"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b }, means.mkString(","))
  }

  test("dedup_report: per-source counts reconcile with the corpus and direct digest df") {
    val rows = SparkEntry.queries("dedup_report")(spark, sfDir).collect()
    val docsDf = graft.core.Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docsDf.count())
    val directExact = docsDf.select(md5(col("text")).as("d"))
      .groupBy("d").count().where(col("count") >= 2)
      .agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_exact_dup")).sum == directExact)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_ppm") <= 1000000L &&
        r.getAs[Long]("near_ppm") <= 1000000L, r.toString)
    }
  }

  test("ngram_novelty: per-source novel counts equal a direct single-source recount") {
    val rows = SparkEntry.queries("ngram_novelty")(spark, sfDir).collect()
    // direct recount: shingle → distinct source set, novel = |set|==1
    val direct = graft.dedup.Dedup.shingles(
        graft.core.Tables.load(spark, sfDir, "documents"))
      .join(graft.core.Tables.load(spark, sfDir, "documents")
        .select("doc_id", "source"), "doc_id")
      .select(col("source"), explode(col("shs")).as("sh"))
      .distinct()
      .groupBy("sh").agg(collect_set("source").as("srcs"))
      .select(explode(col("srcs")).as("source"),
        (size(col("srcs")) === 1).as("novel"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(when(col("novel"), 1L).otherwise(0L)).as("nov"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("nov"))).toMap
    rows.foreach { r =>
      val (n, nov) = direct(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_shingles") == n, r.toString)
      assert(r.getAs[Long]("n_novel") == nov, r.toString)
      assert(r.getAs[Long]("novel_ppm") <= 1000000L)
    }
  }

  test("source_overlap: symmetric shared counts, containment bounded, novelty consistent") {
    val ov = SparkEntry.queries("source_overlap")(spark, sfDir).collect()
    val nov = SparkEntry.queries("ngram_novelty")(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"))).toMap
    ov.foreach { r =>
      val shared = r.getAs[Long]("n_shared")
      val (na, _) = nov(r.getAs[String]("src_a"))
      val (nb, _) = nov(r.getAs[String]("src_b"))
      // shared can't exceed either side's distinct-shingle count
      assert(shared <= na && shared <= nb, r.toString)
      assert(r.getAs[Long]("contain_a_ppm") <= 1000000L &&
        r.getAs[Long]("contain_b_ppm") <= 1000000L)
    }
    // a source's NOVEL shingles appear in no overlap row: shared
    // totals can only come from the non-novel fraction
    nov.foreach { case (src, (n, novel)) =>
      val maxShared = ov.filter(r => r.getAs[String]("src_a") == src ||
        r.getAs[String]("src_b") == src).map(_.getAs[Long]("n_shared"))
      maxShared.foreach(sh => assert(sh <= n - novel, s"$src: $sh > ${n - novel}"))
    }
  }

  test("quality_ablation: survival is monotone in the cutoff and tops out at the corpus") {
    val rows = SparkEntry.queries("quality_ablation")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("cutoff_micro"))
    val nDocs = graft.core.Tables.load(spark, sfDir, "documents").count()
    // the lowest present cutoff keeps the whole corpus (cumulative
    // from the top over every present bucket)
    assert(rows.head.getAs[Long]("kept_docs") == nDocs)
    assert(rows.head.getAs[Long]("doc_ppm") == 1000000L)
    val kd = rows.map(_.getAs[Long]("kept_docs"))
    val kt = rows.map(_.getAs[Long]("kept_tokens"))
    assert(kd.zip(kd.tail).forall { case (a, b) => a >= b }, kd.mkString(","))
    assert(kt.zip(kt.tail).forall { case (a, b) => a >= b }, kt.mkString(","))
  }

  test("labelPropagation: clamped seeds, majority vote, deterministic ties, frontier rounds") {
    import spark.implicits._
    import graft.dedup.Dedup
    // path graph 1-2-3-4-5 plus a tie node 6 touching two seeds:
    //   seeds: 1=en, 5=fr, 7=de (7 isolated — stays a seed, spreads nowhere)
    //   6 - 1 and 6 - 5: one 'en' vote, one 'fr' vote → tie → 'en'
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 1L), (6L, 5L))
      .toDF("i", "j")
    val seeds = Seq((1L, "en"), (5L, "fr"), (7L, "de")).toDF("node", "label")
    // labelPropagation returns a LIVE pin — free it once collected
    val lp = Dedup.labelPropagation(pairs, seeds, rounds = 2)
    val out = lp.collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[String]("label"), r.getAs[Int]("round"))).toMap
    org.apache.spark.sql.graftbridge.CheckpointBridge.free(lp)
    // seeds clamped at round 0
    assert(out(1L) == ("en", 0) && out(5L) == ("fr", 0) && out(7L) == ("de", 0))
    // round 1: direct neighbors adopt; the tie node takes the smallest label
    assert(out(2L) == ("en", 1) && out(4L) == ("fr", 1))
    assert(out(6L) == ("en", 1))
    // round 2: node 3 sees en (from 2) and fr (from 4) — tie → en
    assert(out(3L) == ("en", 2))
    assert(out.size == 7)
  }

  test("dedupReport: NULL-text docs stay in their source's denominator") {
    import spark.implicits._
    // src_a: two exact copies + one NULL-text doc (a missing crawl
    // capture) + one unique doc; src_b: one unique doc. The former
    // INNER df join dropped the NULL-digest row, reporting src_a with
    // n_docs = 3 — a corpus report undercounting its own denominator
    // (r15 verdict item 2). NULL text is missing content: it must
    // count as a doc, and must be neither exact- nor near-dup.
    val d = Seq(
      (1L, "src_a", "same text body"),
      (2L, "src_a", "same text body"),
      (3L, "src_a", null.asInstanceOf[String]),
      (4L, "src_a", "unique body here"),
      (5L, "src_b", "other unique body")).toDF("doc_id", "source", "text")
    val pairs = Seq((1L, 2L)).toDF("i", "j")
    val got = graft.pipeline.PipelineQueries.dedupReport(d, pairs)
      .orderBy("source")
      .select("source", "n_docs", "n_exact_dup", "n_near_dup", "exact_ppm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("src_a", 4L, 2L, 2L, 500000L), // 2 exact dups of 4 docs — NULL-text doc counted
      ("src_b", 1L, 0L, 0L, 0L)))
  }

  test("labelPropagation: result is edge-order and partitioning independent") {
    import graft.dedup.Dedup
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)
      .select("i", "j")
    val seeds = graft.core.Tables.load(spark, sfDir, "documents")
      .where(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("node"), col("lang").as("label"))
    val lpA = Dedup.labelPropagation(pairs, seeds)
    val a = lpA.collect().map(_.toString).sorted
    org.apache.spark.sql.graftbridge.CheckpointBridge.free(lpA)
    val lpB = Dedup.labelPropagation(pairs.repartition(7).orderBy(col("j")),
      seeds.repartition(3))
    val b = lpB.collect().map(_.toString).sorted
    org.apache.spark.sql.graftbridge.CheckpointBridge.free(lpB)
    assert(a.sameElements(b))
  }
}
