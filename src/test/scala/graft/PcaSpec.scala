package graft

import org.apache.spark.sql.functions._
import graft.sim.Pca
import graft.text.TextOps

/** Spectral invariants for embedding_pca (rows-only query) and BPE
  * apply replay. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigenvalues: recovers a hand-built diagonal-plus-rotation spectrum") {
    // symmetric 2x2 [[2,1],[1,2]] → eigenvalues 3, 1
    val ev = Pca.jacobiEigenvalues(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-9 && math.abs(ev(1) - 1.0) < 1e-9, ev.toSeq.toString)
  }

  test("embedding_pca: descending spectrum, ratios to the trace, cum is the running floor sum") {
    val rows = SparkEntry.queries("embedding_pca")(spark, sfDir).collect()
    assert(rows.length == 8)
    val lams = rows.map(_.getAs[Long]("eigenvalue_micro"))
    assert(lams.zip(lams.tail).forall { case (a, b) => a >= b }, lams.toSeq.toString)
    val evr = rows.map(_.getAs[Long]("evr_ppm"))
    assert(evr.forall(v => v >= 0 && v <= 1000000L))
    val cum = rows.map(_.getAs[Long]("cum_evr_ppm"))
    assert(cum.toSeq == evr.scanLeft(0L)(_ + _).tail.toSeq)
    // covariance eigenvalues are non-negative and the top-8 can't
    // exceed the whole trace
    assert(cum.last <= 1000000L && lams.last >= 0L)
  }

  test("spectrum excludes non-finite vectors instead of emitting garbage or misdiagnosing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // r13 review: an Inf element overflowed the gram sums, trace = Inf
    // PASSED the trace guard, and the rows were silent garbage
    // (eigenvalue_micro = Long.MaxValue); a NaN aborted blaming a
    // "collapsed encoder". Both shapes now just fall out at intake.
    val clean = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 2.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val dirty = clean.unionByName(Seq(
      (5L, Array(Float.PositiveInfinity, 0.0f)),
      (6L, Array(Float.NaN, 1.0f))).toDF("vec_id", "embedding"))
    val a = graft.sim.Pca.spectrum(spark, clean, k = 2).collect()
    val b = graft.sim.Pca.spectrum(spark, dirty, k = 2).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      s"non-finite vectors changed the spectrum:\n${a.toSeq}\n${b.toSeq}")
    assert(a.forall(_.getAs[Long]("eigenvalue_micro") < Long.MaxValue))
    // an all-non-finite corpus is EMPTY after intake — the loud
    // empty-corpus refusal, not a fake collapsed-encoder diagnosis
    val none = Seq((1L, Array(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.sim.Pca.spectrum(spark, none, k = 2).collect()
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
  }

  test("bpeApply: token counts replay the learned merges on a hand corpus") {
    // corpus: 'abab' x4, 'ab' x2, 'cd' x1 → merges learn a+b → ab,
    // then ab+ab → abab (and onward); 'abab' must tokenize to 1 token,
    // 'ab' to 1, 'cd' stays 2 chars unless merged later
    val docs = Seq(
      (1L, "abab abab abab abab ab ab cd"),
      (2L, "abab ab")).toDF("doc_id", "text")
    val out = TextOps.bpeApply(docs, nMerges = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // merge 1: (a,b) count: within 'abab' 2 per word ... learned rules
    // guarantee: n_tokens < n_chars (merges fired), and doc totals are
    // consistent with per-word segmentation re-derived independently
    assert(out(1L).getAs[Long]("n_chars") == 22L) // word chars only: 4*4 + 2*2 + 2
    assert(out(1L).getAs[Long]("n_tokens") < 22L)
    // doc2 = 'abab' + 'ab': after merge a+b, 'abab'→[ab,ab], 'ab'→[ab];
    // after merge ab+ab, 'abab'→[abab] → 2 tokens total
    assert(out(2L).getAs[Long]("n_tokens") == 2L)
    assert(out(2L).getAs[Long]("chars_per_token_micro") == 3000000L)
  }

  test("fertility reports cover wordless docs with zero counts, not absence") {
    // a doc with no [a-z0-9]+ word (all punctuation/uppercase) used to
    // vanish through the inner word join (r15 review — the same
    // docs-left-join coverage class gopherRules/repetition/
    // unigramLogProb closed): it must report zero counts and a NULL
    // ratio, distinguishable from "doc absent"
    val docs = Seq(
      (1L, "abab ab"),
      (2L, "FOO !!! ??")).toDF("doc_id", "text")
    val out = TextOps.bpeApply(docs, nMerges = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L), s"docs covered: ${out.keySet}")
    assert(out(2L).getAs[Long]("n_words") == 0L)
    assert(out(2L).getAs[Long]("n_tokens") == 0L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("chars_per_token_micro")),
      "no tokens -> no defined chars-per-token ratio")
  }

  test("gramExact: hand-computed milli-unit triangle cells, guard rides the value") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two 2-d vectors, hand milli units: v1 = (1.5, -0.25) → (1500,
    // -250); v2 = (2.0, 0.5) → (2000, 500). floor(-0.25·1000) = -250.
    val emb = Seq(
      (1L, Array(1.5f, -0.25f)),
      (2L, Array(2.0f, 0.5f)),
      (3L, Array(Float.NaN, 1.0f))) // excluded at intake
      .toDF("vec_id", "embedding")
    val got = graft.sim.Pca.gramExact(emb).orderBy("i", "j")
      .as[(Int, Int, Long, Long, Long)].collect()
    // (0,0): 1500² + 2000² = 6_250_000; sum_i = 3500; n = 2
    // (0,1): 1500·(−250) + 2000·500 = 625_000; sum_i = 3500
    // (1,1): (−250)² + 500² = 312_500; sum_i = 250
    assert(got.sameElements(Array(
      (0, 0, 6250000L, 3500L, 2L),
      (0, 1, 625000L, 3500L, 2L),
      (1, 1, 312500L, 250L, 2L))), got.mkString(", "))
    // the overflow guard fires READING the value column (it rides
    // gram_milli2, the raise_error-in-consumed-expression discipline).
    // Values sit in the 2^62..2^63 headroom band the guard owns:
    // |x| = 1.6e6 → milli 1.6e9, 2·(1.6e9)² = 5.12e18 > 2^62 — the sum
    // itself still fits int64 (past 2^63 ANSI's ARITHMETIC_OVERFLOW is
    // the loud backstop; the guard's job is refusing BEFORE that)
    val big = Seq((1L, Array(1.6e6f, 0f)), (2L, Array(1.6e6f, 0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      graft.sim.Pca.gramExact(big).agg(sum("gram_milli2")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("gramExact"),
      s"guard did not fire: $e")
  }

  test("bpe_apply query: every doc appears once with tokens <= chars") {
    val out = SparkEntry.queries("bpe_apply")(spark, sfDir).collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == nDocs)
    assert(out.forall(r => r.getAs[Long]("n_tokens") <= r.getAs[Long]("n_chars")))
    assert(out.forall(r => r.getAs[Long]("chars_per_token_micro") >= 1000000L))
  }
}
