package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Generation-eval metrics over a CALLER-SUPPLIED candidate/reference
  * pairing — the library surface behind the registered
  * `eval_rouge_n` / `eval_bleu` / `eval_chrf` / `eval_edit_ratio`
  * queries (whose adjacent-doc-id pairing is declared synthetic
  * plumbing; a real harness feeds its own pairs through here, so the
  * contract is code, not a comment — r12 verdict item 4).
  *
  * Every metric rides ONE pair shape: `(cand_id, _c, ref_id, _r)`,
  * one payload column per side. Payload types differ per metric and
  * are checked by Spark's analyzer, not conventions:
  *   - [[rougeN]]   — `_c`/`_r`: `array<string>` n-gram SETS (e.g.
  *                    `graft.dedup.Dedup.shingles` output)
  *   - [[bleu]]     — `_c`/`_r`: `array<string>` token sequences
  *   - [[chrf]]     — `_c`/`_r`: raw `string`s
  *   - [[editRatio]]— `_c`/`_r`: raw `string`s
  *
  * Scale shape: each metric is a per-pair-local projection (native
  * Catalyst expressions — [[BleuClipCounts]], [[ChrfClipCounts]],
  * [[EditDistance]] — or codegen'd array algebra); the only exchanges
  * are the pair-construction joins in [[evalPairs]] and
  * [[editRatio]]'s explicit thin repartition that spreads its
  * CPU-quadratic DP. Nothing here sorts globally — callers order
  * their own reports.
  */
object GenerationEval {

  /** The harness shape: a `pairs(cand_id, ref_id)` table names the
    * pairing; payloads are fetched from the candidate and reference
    * relations by key. `cand` and `ref` may be the SAME relation
    * (the registered queries' self-pairing) or two different ones
    * (a sampling harness's generations vs a golden set). Two key
    * equi-joins — at 100 TB both sides shuffle on their ids once,
    * or broadcast when the pair table is harness-sized.
    *
    * CONTRACT on unmatched pairs (r13 review): the joins are INNER —
    * a pair row whose cand_id or ref_id has no payload row DROPS from
    * the output by default (its generation was never produced, its
    * reference is absent). That is the silent-vanish shape this
    * library refuses elsewhere, so `strict = true` probes for
    * unmatched pairs first and refuses loudly with a count — one
    * extra metadata-shaped job (two anti-joins off the pair table),
    * for harnesses where a missing generation is a bug, not a gap. */
  def evalPairs(pairs: DataFrame, cand: DataFrame, ref: DataFrame,
                idCol: String = "doc_id",
                payloadCol: String = "text",
                strict: Boolean = false): DataFrame = {
    val p = pairs.select(col("cand_id"), col("ref_id"))
    if (strict) {
      val missC = p.join(cand.select(col(idCol).as("cand_id")),
        Seq("cand_id"), "left_anti").count()
      val missR = p.join(ref.select(col(idCol).as("ref_id")),
        Seq("ref_id"), "left_anti").count()
      require(missC == 0 && missR == 0,
        s"evalPairs(strict): $missC pair(s) name a cand_id with no " +
          s"candidate row and $missR a ref_id with no reference row — " +
          "these pairs would silently drop from the eval report; fix " +
          "the pair table or score with strict = false")
    }
    p.join(cand.select(col(idCol).as("cand_id"),
        col(payloadCol).as("_c")), "cand_id")
      .join(ref.select(col(idCol).as("ref_id"),
        col(payloadCol).as("_r")), "ref_id")
      .select(col("cand_id"), col("_c"), col("ref_id"), col("_r"))
  }

  /** One-reference-per-task harness shape: candidate and reference
    * tables sharing a task id; the pair IS the id match. `strict`
    * threads through to the 3-relation form (r13 advice: without it,
    * a reference table missing some cand doc_ids silently shrank the
    * eval report via the inner join — exactly the silent-vanish shape
    * the strict probe refuses; the cand-side probe is trivially
    * satisfied since the pair table IS cand's ids, so strict here
    * prices one effective anti-join, the ref side). */
  def evalPairs(cand: DataFrame, ref: DataFrame,
                strict: Boolean): DataFrame =
    evalPairs(
      cand.select(col("doc_id").as("cand_id"),
        col("doc_id").as("ref_id")),
      cand, ref, strict = strict)

  /** [[evalPairs(cand:*]] with `strict = false` (only one overload may
    * carry default arguments, so the lenient form is spelled out). */
  def evalPairs(cand: DataFrame, ref: DataFrame): DataFrame =
    evalPairs(cand, ref, strict = false)

  /** ROUGE-N overlap (Lin 2004), distinct-n-gram set form: recall =
    * |∩|/|ref grams|, precision = |∩|/|cand grams|, F1 — exact integer
    * ppm. Intersections are codegen'd `array_intersect` on the pair
    * row; zero overlap has no harmonic mean and reports F1 = 0. An
    * EMPTY gram array scores 0, not NULL (the `greatest(n,1)` ppm
    * discipline every sibling metric already carries — r13 review:
    * the registered corpus never feeds empties, but this public
    * surface takes a caller's pairs, and an unguarded divide turned
    * an empty candidate generation into a silent NULL row). */
  def rougeN(pairs: DataFrame): DataFrame =
    pairs
      .select(col("cand_id"), col("ref_id"),
        size(col("_c")).cast("bigint").as("n_cand"),
        size(col("_r")).cast("bigint").as("n_ref"),
        size(array_intersect(col("_c"), col("_r"))).cast("bigint")
          .as("n_common"))
      .withColumn("recall_ppm",
        expr("n_common * 1000000 div greatest(n_ref, 1L)"))
      .withColumn("precision_ppm",
        expr("n_common * 1000000 div greatest(n_cand, 1L)"))
      // F1 = 2PR/(P+R) in ppm (P,R ≤ 10⁶ so 2PR ≤ 2e12 — exact)
      .withColumn("f1_ppm", expr(
        "IF(n_common = 0, 0L, " +
          "2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm))"))

  /** Corpus BLEU (Papineni et al. 2002), add-one-smoothed (Lin & Och
    * 2004) in EXACT micro-log10 units: per pair, clipped n-gram
    * matches m_n (multiset min of candidate/reference counts,
    * n = 1..4) over candidate totals t_n, reported as unsmoothed
    * p{n}_ppm plus log10(BLEU)·10⁶ =
    *   bp + (Σ_n mlog(m_n+1) − mlog(t_n+1)) div 4
    * where mlog is the micro-log floor and bp =
    * ⌊(1 − r/c)·log10(e)·10⁶⌋ when c < r (0 otherwise) — identical
    * texts score exactly 0 (BLEU = 1). All integer arithmetic after
    * the floors; div truncation is portable on the negative sums
    * (r12-verified vs DuckDB `//`). Clipped counts come from ONE
    * native per-pair-local pass ([[BleuClipCounts]] — the pair row
    * holds both token arrays, so no n-gram ever shuffles). */
  def bleu(pairs: DataFrame): DataFrame = {
    val mt = ColumnBridge.column(BleuClipCounts(
      ColumnBridge.expression(col("_c")),
      ColumnBridge.expression(col("_r")), maxN = 4))
    val mlogDiff = (1 to 4).map(n =>
      s"(CAST(floor(log10(m$n + 1) * 1000000) AS BIGINT) - " +
        s"CAST(floor(log10(t$n + 1) * 1000000) AS BIGINT))").mkString(" + ")
    pairs
      .withColumn("_mt", mt)
      .select(Seq(col("cand_id"), col("ref_id"),
        size(col("_c")).cast("bigint").as("c_len"),
        size(col("_r")).cast("bigint").as("r_len")) ++
        (1 to 4).flatMap(n => Seq(
          col("_mt").getItem(n - 1).getField("m").as(s"m$n"),
          col("_mt").getItem(n - 1).getField("t").as(s"t$n"))): _*)
      .withColumn("p1_ppm", expr("m1 * 1000000 div greatest(t1, 1L)"))
      .withColumn("p2_ppm", expr("m2 * 1000000 div greatest(t2, 1L)"))
      .withColumn("p3_ppm", expr("m3 * 1000000 div greatest(t3, 1L)"))
      .withColumn("p4_ppm", expr("m4 * 1000000 div greatest(t4, 1L)"))
      // greatest(c_len, 1) in the brevity penalty: an EMPTY candidate
      // (c_len = 0, r_len > 0) otherwise divides by zero — silent NULL
      // bleu for the worst possible generation (or an ANSI job kill),
      // the exact class the rougeN guard above closed (r15 review; the
      // registered corpora never feed empties, but this public surface
      // takes a caller's pairs). Treated as length 1: bp = 1 − r, the
      // deepest penalty the integer form expresses, same discipline as
      // every greatest(t, 1) ppm divide in this file.
      .withColumn("bleu_mlog_micro", expr(
        """(CASE WHEN c_len >= r_len THEN 0L
          |  ELSE CAST(floor(((1.0D - CAST(r_len AS DOUBLE) / greatest(c_len, 1L))
          |    * 0.43429448190325176D) * 1000000) AS BIGINT) END)
          |""".stripMargin + s" + (($mlogDiff) div 4)"))
      .select(col("cand_id"), col("ref_id"), col("c_len"), col("r_len"),
        col("p1_ppm"), col("p2_ppm"), col("p3_ppm"), col("p4_ppm"),
        col("bleu_mlog_micro"))
  }

  /** chrF (Popović 2015), the character-level generation metric that
    * survives tokenizer mismatch: clipped character n-gram matches
    * (n = 1..6, whitespace removed) over candidate totals (chrP) and
    * reference totals (chrR), uniformly averaged across orders, fused
    * as F2 = 5·P·R/(4P+R) — all integer ppm, an order with no grams
    * contributes 0. ONE native per-pair pass over the raw strings
    * ([[ChrfClipCounts]] — rolling 64-bit gram keys + primitive
    * sort-merge, nothing allocated per gram). */
  def chrf(pairs: DataFrame): DataFrame = {
    val mt = ColumnBridge.column(ChrfClipCounts(
      ColumnBridge.expression(col("_c")),
      ColumnBridge.expression(col("_r")), maxN = 6))
    val pSum = (1 to 6).map(n => s"(m$n * 1000000 div greatest(tc$n, 1L))")
      .mkString(" + ")
    val rSum = (1 to 6).map(n => s"(m$n * 1000000 div greatest(tr$n, 1L))")
      .mkString(" + ")
    // c_chars/r_chars come from the native struct's n = 1 totals —
    // t₁/tr₁ ARE the whitespace-stripped lengths, so the report and
    // the chrP/chrR denominators share ONE definition of "stripped
    // length" (r12 review)
    pairs.withColumn("_mt", mt)
      .select(Seq(col("cand_id"), col("ref_id"),
        col("_mt").getItem(0).getField("t").as("c_chars"),
        col("_mt").getItem(0).getField("tr").as("r_chars")) ++
        (1 to 6).flatMap(n => Seq(
          col("_mt").getItem(n - 1).getField("m").as(s"m$n"),
          col("_mt").getItem(n - 1).getField("t").as(s"tc$n"),
          col("_mt").getItem(n - 1).getField("tr").as(s"tr$n"))): _*)
      .withColumn("chrp_ppm", expr(s"($pSum) div 6"))
      .withColumn("chrr_ppm", expr(s"($rSum) div 6"))
      // F2 in ppm: P,R ≤ 10⁶ so 5PR ≤ 5e12 — exact; no grams at all
      // (both averages 0) has no harmonic mean — report 0
      .withColumn("chrf2_ppm", expr(
        "IF(chrp_ppm + chrr_ppm = 0, 0L, " +
          "5 * chrp_ppm * chrr_ppm div (4 * chrp_ppm + chrr_ppm))"))
      .select(col("cand_id"), col("ref_id"), col("c_chars"), col("r_chars"),
        col("chrp_ppm"), col("chrr_ppm"), col("chrf2_ppm"))
  }

  /** Character edit-distance ratio (the char-level cousin of TER,
    * Snover et al. 2006): Levenshtein(cand, ref) normalized by
    * reference length in ppm — can exceed 10⁶ when the candidate
    * overruns. The distance is the unique Levenshtein metric
    * ([[EditDistance]] — char-array two-row DP, ~30× cheaper than
    * Spark's UTF-8-byte-walking built-in). The explicit repartition
    * spreads the CPU-quadratic projection across cores even when the
    * upstream scan is one small file (at 100 TB scans are
    * many-partitioned, and the thin pair shuffle is noise against
    * the quadratic it parallelizes). */
  def editRatio(pairs: DataFrame): DataFrame =
    pairs
      .transform(graft.core.Par.spread(_, "cand_id"))
      .select(col("cand_id"), col("ref_id"),
        length(col("_c")).cast("bigint").as("c_len"),
        length(col("_r")).cast("bigint").as("r_len"),
        ColumnBridge.column(EditDistance(
          ColumnBridge.expression(col("_c")),
          ColumnBridge.expression(col("_r")))).as("edit_dist"))
      .withColumn("edit_ratio_ppm",
        expr("edit_dist * 1000000 div greatest(r_len, 1L)"))
}
