package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline, over the
  * `documents` table. Everything is built from codegen'd SQL functions
  * (split / transform / aggregate / regexp) — no UDFs in the hot path —
  * and every metric is defined with engine-portable arithmetic so the
  * DuckDB oracle recomputes it exactly.
  */
object TextOps {

  /** English-marker stopword list used by langid + quality scoring.
    * Fixed and tiny by design: language ID at pipeline scale is a
    * per-row map-side classification, no shuffle. */
  val EnMarkers: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  private def markerList = EnMarkers.map(w => s"'$w'").mkString(", ")

  /** ⌊log₁₀(c)·10⁶⌋ as bigint — THE integer micro-log every
    * engine-portable log-score in this file builds on (unigram LM,
    * tf-idf/bm25 idf, importance weights, bigram log-probs). ONE copy:
    * a precision or flooring tweak must move every consumer at once,
    * or the micro-log scales the operators are documented to share
    * silently diverge. Inputs are integer counts (+smoothing), so the
    * float log evaluates on identical values in every engine. */
  private def mlog(c: Column): Column = floor(log10(c) * 1e6).cast("bigint")

  /** Driver-side mirror of [[mlog]] for trainer loops that fold costs
    * in Scala (a Column can't run there). MUST stay formula-identical
    * to the Column form — PropertySpec crosschecks the two over a
    * count range; smoothing (+1) belongs to the CALLER, exactly as
    * with the Column version. */
  private[graft] def mlogLong(c: Long): Long =
    math.floor(math.log10(c.toDouble) * 1e6).toLong

  /** Whitespace WORDS — empties removed: split(text, ' ') emits empty
    * strings for doubled/leading/trailing spaces, and a phantom token
    * deflates alpha/stopword/distinct ratios enough to flip a gate
    * verdict on otherwise-clean text (corpus-blind: the registered
    * corpora are single-spaced, so only hand-payload specs see it).
    * THE tokenizer every VERDICT-class operator shares; its oracle
    * mirror is `list_filter(string_split(text, ' '), x -> len(x) > 0)`.
    * Pure-count operators (ws_tokens) keep raw split-field semantics
    * by documented contract. */
  private def words: Column =
    filter(split(col("text"), " "), t => length(t) > 0)

  /** n-gram-heuristic language ID: fraction of whitespace tokens that
    * are English marker words; >= 5% → 'en'. A profile-based classifier
    * would swap in here — the pipeline shape (pure projection) is the
    * point at 100 TB.
    *
    * ZERO-token documents (empty / whitespace-only text) score
    * en_ratio 0.0 → 'other' by the greatest(n, 1) denominator guard:
    * the unguarded 0/0 is NULL in Spark but inf/NaN-class in DuckDB
    * under ieee_floating_point — a cross-engine divergence the
    * empties-filtered tokenizer made REACHABLE (the old split-field
    * count was always ≥ 1). 'other' is the right verdict anyway: no
    * tokens is no evidence of English. */
  def langId(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        round(
          size(expr(s"filter(split(text, ' '), x -> x IN ($markerList))")).cast("double") /
            greatest(size(words), lit(1)), 4).as("en_ratio"))
      .withColumn("pred_lang", when(col("en_ratio") >= 0.05, "en").otherwise("other"))

  /** Quality scoring: token counts, lexical diversity, repetition.
    * Repetition needs per-token frequencies → one hash shuffle on
    * (doc_id, token) with map-side partial counts; everything else is
    * projection. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(words).as("tok"))
    val freqs = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val stats = freqs.groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
           count(lit(1)).as("n_distinct"),
           max(col("cnt")).as("max_freq"),
           sum(when(col("tok").isInCollection(EnMarkers), col("cnt")).otherwise(0L))
             .as("n_stop"))
    // greatest(len, 1): an EMPTY text makes this projection divide by
    // zero — an ANSI DIVIDE_BY_ZERO error thrown while scanning, even
    // though the zero-token doc never survives the stats join (its
    // row is filtered AFTER the division evaluates). 0/1 = 0 for the
    // row that's about to be dropped anyway.
    val perDoc = docs.select(col("doc_id"),
      size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).cast("double")
        ./(greatest(length(col("text")), lit(1))).as("punct_ratio"))
    stats.join(perDoc, "doc_id")
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio"),
        round(col("max_freq").cast("double") / col("n_tokens"), 4).as("repetition"),
        round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stopword_ratio"),
        round(col("punct_ratio"), 4).as("punct_ratio"),
        round(least(col("n_tokens").cast("double") / 100, lit(1.0)) *
          (col("n_distinct").cast("double") / col("n_tokens")), 4).as("quality"))
  }

  /** Linear quality classifier — the keep/drop gate production
    * pipelines put behind a learned model (CCNet's fasttext LM filter,
    * Wenzek et al. 2020 §3.3; the quality classifiers of GPT-3 /
    * Gopher appendix A): score = w·features, keep = score ≥ cutoff.
    * The WEIGHTS here are fixed stand-ins — a trained linear model
    * drops its coefficients straight in — while the operator is the
    * plumbing that survives the swap: feature extraction as ONE
    * aggregate over exploded tokens plus a codegen'd projection, and
    * every feature in integer MICRO-UNITS (the CCNet-unigram trick:
    * ⌊x·10⁶⌋ with integer div), so the score is engine-portable and
    * order-independent where a double dot product could drift a ulp.
    * Features: capped length credit (≤64 tokens at 15625 µ each —
    * caps at exactly 10⁶), stopword-fraction µ, distinct-token-ratio
    * µ. */
  def qualityClassifier(docs: DataFrame, cutoffMicro: Long = 1500000L,
                        wLen: Int = 1, wStop: Int = 4, wDist: Int = 1): DataFrame =
    qualityFeatures(docs)
      .select(col("doc_id"), col("f_len_micro"), col("f_stop_micro"),
        col("f_dist_micro"))
      .withColumn("score_micro", scoreMicro(wLen, wStop, wDist))
      .withColumn("keep", col("score_micro") >= cutoffMicro)

  /** Per-doc classifier features in integer micro-units PLUS the raw
    * token count — ONE copy of the feature extraction, shared by
    * [[qualityClassifier]] and the quality_ablation threshold sweep
    * (which must sweep THE classifier's score, not a drifting
    * reimplementation). */
  private[graft] def qualityFeatures(docs: DataFrame): DataFrame = {
    val feats = docs.select(col("doc_id"), explode(words).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("_nd"),
        sum(when(col("tok").isInCollection(EnMarkers), 1L).otherwise(0L)).as("_ns"))
      .select(col("doc_id"), col("n_tokens"),
        (least(col("n_tokens"), lit(64L)) * 15625L).as("f_len_micro"),
        expr("(_ns * 1000000) div n_tokens").as("f_stop_micro"),
        expr("(_nd * 1000000) div n_tokens").as("f_dist_micro"))
    // the classifier is a keep/drop GATE: a zero-token doc vanished
    // from BOTH sets (no exploded rows, no group — the silent-vanish
    // class the r12 curate fix closed downstream). All-zero features
    // score 0 < any positive cutoff → keep = false, deterministically,
    // and the ablation sweep sees the doc in every threshold bucket.
    docs.select("doc_id").join(feats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("f_len_micro"), lit(0L)).as("f_len_micro"),
        coalesce(col("f_stop_micro"), lit(0L)).as("f_stop_micro"),
        coalesce(col("f_dist_micro"), lit(0L)).as("f_dist_micro"))
  }

  /** The classifier's linear score over [[qualityFeatures]] columns —
    * default weights are the registered quality_classifier's. */
  private[graft] def scoreMicro(wLen: Int = 1, wStop: Int = 4,
                                wDist: Int = 1): Column =
    col("f_len_micro") * wLen + col("f_stop_micro") * wStop +
      col("f_dist_micro") * wDist

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other-symbols). */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("bpe_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("ws_tokens"), 4))

  /** Tokenizer-training vocabulary construction (the prep stage of any
    * BPE/WordPiece train run): corpus-wide token counts → the top-K
    * vocabulary with per-token and cumulative corpus coverage — the
    * table that decides vocab size vs OOV rate.
    *
    * Scale shape: token counting is one map-side-combinable aggregate
    * (the gram text reduces per executor before the shuffle). The
    * top-K selection rides the bounded-state TopKStruct — at web scale
    * the distinct-token table is billions of rows, and a window
    * row_number over it would sort and shuffle all of them; the heap
    * aggregate shuffles ≤ k rows per partition. The grand total is one
    * broadcast scalar; the coverage window runs over the K selected
    * rows only. Tie order at equal counts is lexicographically LARGEST
    * token first (TopKStruct keeps the largest struct values; the
    * oracle mirrors ORDER BY cnt DESC, token DESC). */
  def vocabBuild(docs: DataFrame, k: Int = 256): DataFrame = {
    val counts = docs.select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    topKWithCoverage(counts, "token", k)
  }

  /** Top-K terms with per-term and cumulative corpus coverage — ONE
    * copy of the heap/rank/coverage scaffolding (TopKStruct bounded
    * heap → grand total → posexplode rank → cumulative window over
    * the K selected rows only), shared by [[vocabBuild]] and
    * [[bigramVocab]]: a tie-order or rounding tweak must land in both
    * or the two vocab reports silently diverge.
    *
    * @param counts (`keyCol`, cnt) term counts */
  private def topKWithCoverage(counts: DataFrame, keyCol: String,
                               k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.sim.TopKStruct
    val payload = struct(col("cnt").as("c"), col(keyCol).as("t"))
    val agg = ColumnBridge.column(
      TopKStruct(ColumnBridge.expression(payload), k).toAggregateExpression())
    // heap AND grand total in ONE aggregate — two separate aggregate
    // subtrees would each re-scan/re-explode the whole corpus (no CSE
    // across crossJoin arms), doubling the corpus pass per vocab build
    counts.agg(agg.as("_top"), sum(col("cnt")).as("_total"))
      .select(posexplode(col("_top")), col("_total"))
      .select((col("pos") + 1).cast("bigint").as("rank"),
        col("col.t").as(keyCol), col("col.c").as("cnt"), col("_total"))
      .withColumn("_cum", sum(col("cnt")).over(
        Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col(keyCol), col("cnt"),
        round(col("cnt") / col("_total"), 4).as("pct"),
        round(col("_cum") / col("_total"), 4).as("cum_pct"))
  }

  /** Bigram vocabulary: same heap-aggregate shape as [[vocabBuild]]
    * (TopKStruct keeps ≤ k rows per partition; the distinct-bigram
    * table never sorts globally) over order-2 token windows — the
    * counts a bigram LM / BPE-merge-candidate pass starts from. Bigram
    * extraction is one in-row transform over the token array: zero
    * extra passes over text, the explode carries ~n tokens per doc
    * exactly like the unigram path. */
  def bigramVocab(docs: DataFrame, k: Int = 64): DataFrame = {
    val counts = docs
      .withColumn("w", words) // the ONE shared tokenizer, not a re-spelling
      .select(explode(expr(
        """IF(size(w) >= 2,
          |  transform(sequence(1, size(w) - 1),
          |    i -> concat(element_at(w, i), ' ', element_at(w, i + 1))),
          |  array())""".stripMargin)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
    topKWithCoverage(counts, "bigram", k)
  }

  /** Blocklist gate (the C4 "badwords" filter — Raffel et al. 2020
    * §2.2 dropped any page containing a word from a fixed list): per
    * doc, total and distinct blocklist hits over the token stream and
    * the drop flag (any hit kills the doc, C4's rule). The list is a
    * literal array riding the projection — pure codegen'd per-row array
    * algebra, nothing shuffles, nothing broadcast-joins; at 100 TB this
    * runs at scan speed next to the other projection gates. */
  def blocklist(docs: DataFrame, blockWords: Seq[String]): DataFrame = {
    require(blockWords.nonEmpty, "blocklist must not be empty")
    val bl = array(blockWords.map(lit): _*)
    // the shared verdict tokenizer — the old parameter name `words`
    // SHADOWED it, forcing an inline re-spelling that a tokenizer
    // tweak would have silently missed (r12 text review)
    val toks = words
    docs.select(col("doc_id"),
      size(filter(toks, t => array_contains(bl, t))).cast("bigint").as("n_hits"),
      size(array_intersect(array_distinct(toks), bl)).cast("bigint")
        .as("n_distinct_hits"))
      .withColumn("dropped", col("n_hits") > 0)
  }

  /** PII scrub — the redaction pass a training corpus runs before
    * anything else sees the text: count and redact email addresses and
    * phone numbers (regex classes deliberately RE2-simple so Spark's
    * Java regex and DuckDB's RE2 agree). Pure per-row projection —
    * regexp_extract_all/regexp_replace are codegen'd, nothing shuffles,
    * and the scrubbed text is reported as its rolling fingerprint (the
    * audit needs proof-of-redaction, not a second copy of the corpus). */
  def piiScrub(docs: DataFrame): DataFrame = {
    val email = "[a-z0-9._]+@[a-z0-9.]+"
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val emailDone = s"regexp_replace(text, '$email', '<EMAIL>')"
    val scrubbed = s"regexp_replace($emailDone, '$phone', '<PHONE>')"
    // n_phones counts on the POST-email text — the redaction order the
    // scrub actually runs: a phone overlapping an email match is partly
    // consumed by <EMAIL> and never becomes <PHONE>, and an audit that
    // counted it on the original would report a redaction that did not
    // happen (proof-of-redaction must match the fingerprinted output)
    docs.select(col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$email', 0)")).cast("bigint").as("n_emails"),
      size(expr(s"regexp_extract_all($emailDone, '$phone', 0)")).cast("bigint").as("n_phones"),
      rabinFold(scrubbed).as("scrubbed_fp"))
      .withColumn("had_pii", col("n_emails") + col("n_phones") > 0)
  }

  /** Repetition quality gate (the Gopher repetition rules — Rae et al.
    * 2021 §A1.1 — word-n-gram form): per doc, the fraction of 2-grams
    * that are repeats (1 − distinct/total), the share of the single
    * most frequent 2-gram, and the 3-gram repeat fraction; a doc
    * passes when its 2-gram stats sit under the thresholds. Two
    * hash-shuffle levels — (doc, gram) partial counts then per-doc
    * stats — both map-side combinable, so the gram text never leaves
    * its executor un-aggregated. Pass/fail compares ROUNDED fractions
    * so Spark and the SQL oracle agree at the threshold boundary.
    *
    * SHORT-DOC boundary, stated plainly (r12 text review): with the
    * default topFracMax = 0.05 every doc under ~20 bigrams fails the
    * top-share gate even with zero repeats (1/n > 0.05), while a
    * sub-2-token doc passes by the no-evidence rule below. The gate
    * targets corpus-scale documents (Gopher filters PAGES, and its
    * word-count rule already rejects < 50 words); callers gating
    * short snippets must raise topFracMax or pre-filter on length —
    * the thresholds are parameters precisely for that. */
  def repetition(docs: DataFrame, topFracMax: Double = 0.05,
                 dupFracMax: Double = 0.05): DataFrame = {
    val ws = docs.withColumn("w", words)
    // each gram level gates on ITS OWN minimum length: a 2-word doc
    // has one 2-gram the report promises ('foo foo' is maximal 2-gram
    // repetition — a >= 3 gate would silently pass it by omission) and
    // simply no 3-grams (left join; zero 3-grams = zero repeats)
    def gramStats(n: Int, pre: String, withMax: Boolean): DataFrame = {
      val mk = (0 until n).map(j => s"w[i+$j]").mkString(", ")
      // the top-gram share only gates at n = 2 — the 3-gram max was
      // aggregated and discarded (dead state per doc; r12 text review)
      val aggs = Seq(sum("cnt").as(s"${pre}_n"), count(lit(1)).as(s"${pre}_d")) ++
        (if (withMax) Seq(max("cnt").as(s"${pre}_m")) else Nil)
      ws.where(size(col("w")) >= n)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', $mk))")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(aggs.head, aggs.tail: _*)
    }
    val report = gramStats(2, "g2", withMax = true)
      .join(gramStats(3, "g3", withMax = false), Seq("doc_id"), "left")
      .select(col("doc_id"), col("g2_n").as("n_2grams"),
        round(lit(1) - col("g2_d").cast("double") / col("g2_n"), 4).as("dup_2gram_frac"),
        round(col("g2_m").cast("double") / col("g2_n"), 4).as("top_2gram_frac"),
        coalesce(round(lit(1) - col("g3_d").cast("double") / col("g3_n"), 4),
          lit(0.0)).as("dup_3gram_frac"))
      .withColumn("rep_pass",
        col("top_2gram_frac") <= topFracMax && col("dup_2gram_frac") <= dupFracMax)
    // a QUALITY GATE must return a verdict for EVERY doc (the
    // gopherRules discipline): a sub-2-token doc has no 2-grams at
    // all — zero repetition evidence — so it PASSES with zeroed
    // stats and NULL fractions (0 of 0 grams has no honest ratio),
    // rather than silently vanishing from the pass AND fail sets
    docs.select("doc_id").join(report, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        col("dup_2gram_frac"), col("top_2gram_frac"),
        when(col("n_2grams").isNull, lit(0.0))
          .otherwise(col("dup_3gram_frac")).as("dup_3gram_frac"),
        coalesce(col("rep_pass"), lit(true)).as("rep_pass"))
  }

  /** Corpus-LM quality proxy (the CCNet pipeline's LM-perplexity
    * filter, Wenzek et al. 2019, with the corpus's own unigram model
    * standing in for the external LM): per doc, the mean log10
    * probability of its tokens under corpus unigram frequencies.
    * Per-token contributions are pre-floored to integer micro-logs on
    * the VOCABULARY table (Zipf: tiny next to the corpus, broadcast;
    * the non-broadcast fallback shuffles on `tok`, the same key the
    * vocab count already partitioned by) so the per-doc sum is exact
    * long arithmetic — immune to float summation order, which a
    * distributed avg(log) is not. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(words).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("tok"), mlog(col("cnt")).as("mlog"))
    val total = toks.agg(count(lit(1)).as("_N"))
    // no broadcast hint: Zipf keeps the vocab tiny at test scale (AQE
    // broadcasts it on its own), but at corpus scale distinct tokens
    // can exceed any broadcast budget — the planner must stay free to
    // shuffle on `tok`, the key the vocab count already partitioned by
    val report = toks.join(vocab, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("mlog").as("sum_mlog"))
    // a QUALITY SCORE must cover EVERY doc (bigramLogProb's
    // discipline, r12 text review): a zero-token doc has no unigram
    // evidence — zeroed counts, NULL mean — rather than silently
    // vanishing from both the keep and drop sets of a downstream
    // perplexity filter
    docs.select("doc_id").join(report, Seq("doc_id"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_mlog"), lit(0L)).as("sum_mlog"),
        round(col("sum_mlog") / 1e6 / col("n_tokens") - log10(col("_N")), 4)
          .as("avg_log10p"))
  }

  /** Character-entropy quality signal: H = log2(n) − (Σ c·log2 c)/n
    * over per-doc character frequencies — near-zero for degenerate
    * repeated-character spam, ~4+ bits for natural text. The same
    * integer micro-log trick as [[unigramLogProb]]: c·⌊log2(c)·10⁶⌋
    * sums are exact long arithmetic, so the only float ops are on
    * identical inputs in both engines. One (doc, char) count shuffle
    * with map-side partials; chars never leave their executor
    * un-counted. */
  def charEntropy(docs: DataFrame): DataFrame = {
    // the empties filter kills the PHANTOM '' element both engines
    // emit for EMPTY text (split('','') = [''] in Spark AND DuckDB —
    // r12 text review measured both): without it the zero-length doc
    // reported 1 "char" of zero entropy instead of the honest 0-chars
    // no-verdict row the coverage join below emits
    val report = docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), ""), c => c =!= "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_chars"),
        sum(col("c") * floor(log2(col("c")) * 1e6).cast("bigint")).as("_clogc"))
      .select(col("doc_id"), col("n_chars"),
        round(log2(col("n_chars")) - col("_clogc") / 1e6 / col("n_chars"), 4)
          .as("entropy_bits"))
    // EVERY doc gets a row (r12 text review): split('', '') is an
    // empty array in Spark 4, so the zero-length doc — the most
    // degenerate input an entropy signal exists to catch — vanished
    // from the report entirely; it carries 0 chars and a NULL entropy
    // (no distribution to measure)
    docs.select("doc_id").join(report, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        col("entropy_bits"))
  }

  /** Sliding-window chunking — the windowing stage every pretraining /
    * RAG pipeline runs between cleaning and tokenization: width `w`
    * tokens, stride `s` (s < w ⇒ adjacent chunks overlap by w−s so no
    * span is ever split across a boundary without a copy). Chunk count
    * per doc is 1 + max(0, ⌈(n−w)/s⌉) — every token is covered, the
    * tail chunk may run short, a doc shorter than w yields exactly one
    * chunk. Pure projection + explode: chunk geometry is integer
    * arithmetic (`div` floor division, engine-portable), and the only
    * shuffle in a chunking job is the sink's own partitioning. */
  def chunk(docs: DataFrame, w: Int = 32, s: Int = 24): DataFrame = {
    require(w >= 1 && s >= 1 && s <= w,
      s"need 1 <= stride ($s) <= width ($w)")
    docs.withColumn("ts", split(col("text"), " "))
      .select(col("doc_id"), col("ts"), posexplode(expr(
        s"transform(sequence(0, greatest(0L, (size(ts) - $w + ${s - 1}) div $s)), i -> i * $s)")))
      .select(col("doc_id"), col("pos").cast("bigint").as("chunk_idx"),
        col("col").cast("bigint").as("tok_start"),
        least(lit(w), size(col("ts")) - col("col")).cast("bigint").as("tok_len"),
        expr(s"array_join(slice(ts, col + 1, least($w, size(ts) - col)), ' ')")
          .as("chunk_text"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    * 2003 — the MOSS local fingerprinting algorithm), word-k-gram
    * form: hash every k-gram, slide a w-wide window over the hash
    * sequence, select each window's MINIMUM hash; the distinct
    * selected hashes are the document's fingerprint set. Winnowing
    * guarantees any shared run of ≥ w+k−1 words between two documents
    * shares at least one selected fingerprint — the local property
    * that makes it the plagiarism/near-dup detector of record.
    *
    * Per doc the report is the fingerprint count, the digest of the
    * SORTED fingerprint set (set equality across engines without
    * shipping the set) and the minimum fingerprint. Docs shorter than
    * k+w−1 words have no full window and are out of contract.
    *
    * Scale shape: gram hashing is a per-row projection; the window min
    * is PARTITIONED by doc_id (never a global sort), and only md5
    * hex strings shuffle — text stays at its scan. */
  def winnowing(docs: DataFrame, k: Int = 4, w: Int = 8): DataFrame = {
    require(k >= 1 && w >= 2, s"need k >= 1 ($k), w >= 2 ($w)")
    val ws = docs.withColumn("wd", split(col("text"), " "))
      .where(size(col("wd")) >= k + w - 1)
    val mk = (0 until k).map(j => s"wd[i+$j]").mkString(", ")
    // the per-doc gram count is size(wd) - k + 1 BY CONSTRUCTION — a
    // cheap projection carried through the posexplode, not a second
    // full-partition count window over every gram row
    val grams = ws.select(col("doc_id"), (size(col("wd")) - (k - 1)).as("_g"),
        posexplode(expr(
        s"transform(sequence(0, size(wd) - $k), i -> md5(concat_ws(' ', $mk)))")))
      .select(col("doc_id"), col("_g"), col("pos"), col("col").as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("_sel", min(col("h")).over(win))
      .where(col("pos") <= col("_g") - w)
      .select(col("doc_id"), col("_sel")).distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"),
        md5(concat_ws(",", array_sort(collect_list(col("_sel")))).cast("binary"))
          .as("fp_digest"),
        min(col("_sel")).as("min_fp"))
  }

  /** The engine-portable Rabin fold h = (h·31 + ascii(c)) mod 1e9+7
    * over a string expression — ONE copy: [[fingerprint]]'s contract
    * (and cdcChunks' boundary parity) depends on bit-identity across
    * every consumer (piiScrub's proof-of-redaction digest,
    * importanceScore's bucket hash), so the fold must never fork. */
  private def rabinFold(e: String): Column =
    expr(s"aggregate(transform(split($e, ''), c -> ascii(c)), 0L, " +
      "(h, c) -> (h * 31 + c) % 1000000007)")

  /** Rabin–Karp-style rolling fingerprint: left fold of
    * h = (h * 31 + ascii(c)) mod 1e9+7 over the characters — a
    * sequential mod-fold both Spark (`aggregate`) and DuckDB
    * (`list_reduce`) evaluate identically. `prefix_fp` fingerprints the
    * first 64 chars (the cheap near-head dedup key). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      rabinFold("text").as("fp"),
      rabinFold("substring(text, 1, 64)").as("prefix_fp"))

  /** DSIR-style importance scoring (Xie et al. 2023 "Data Selection
    * for Language Models via Importance Resampling"): per-doc
    * log-importance weight log(p_target/p_raw) under hashed-unigram
    * bag models — the domain-upweighting signal a pretraining mixture
    * is resampled on (target here = any caller predicate, e.g. a
    * trusted-domain flag).
    *
    * DSIR's own trick IS the scale story: tokens hash into a FIXED
    * `buckets`-sized model (default 8192), so the model is a
    * broadcastable constant-size table at any corpus size — no
    * corpus-sized vocabulary join. The hash is the engine-portable
    * Rabin fold ([[fingerprint]]); probabilities are add-one-smoothed
    * micro-logs on integer counts, so every per-doc sum is exact long
    * arithmetic: `Σ_tok [mlog(ct+1) − mlog(cr+1)] + n_tokens·
    * (mlog(Nr+B) − mlog(Nt+B))`. `target_like` = weight > 1; feed the
    * scores to [[graft.pipeline.DataPrep.sampleStratified]]-style
    * thresholds for the actual resample. */
  def importanceScore(docs: DataFrame, isTarget: Column,
                      buckets: Int = 8192): DataFrame = {
    require(buckets >= 2, s"buckets ($buckets) must be at least 2")
    val toks = docs.select(col("doc_id"), isTarget.as("_t"),
        explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .withColumn("bucket", rabinFold("token") % buckets)
    val model0 = toks.groupBy("bucket").agg(count(lit(1)).as("cr"),
      sum(when(col("_t"), 1L).otherwise(0L)).as("ct"))
    // the model is ≤ buckets rows BY CONSTRUCTION (hash % buckets),
    // but its lazy plan re-runs the full corpus token pass per
    // consumer — and it had TWO (the scoring join and the consts
    // aggregate, which paid an entire corpus scan for 2 scalars; r15
    // review, the k-fold re-scan class materializeMeta exists for).
    // Pinned to a driver-local relation once, consts becomes a
    // LocalRelation fold — values bit-identical, one corpus pass saved.
    val model = graft.analytics.Tools.materializeMeta(model0, buckets)
    val consts = model.agg(sum("cr").as("_nr"), sum("ct").as("_nt"))
    // the per-bucket mlog DIFFERENCE is precomputed INTO the ≤ buckets-
    // row broadcast model (r16): the former form evaluated two
    // log10+floor per exploded TOKEN row — identical values, since the
    // mlog args depend only on the joined bucket row, at model
    // cardinality instead of corpus token cardinality (the shape a
    // 100 TB DSIR pass wants: the model is the constant, tokens are
    // the stream)
    val scoredModel = model.withColumn("_w",
      mlog(col("ct") + 1) - mlog(col("cr") + 1))
    toks.join(broadcast(scoredModel), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_w")).as("_sum"))
      .crossJoin(broadcast(consts))
      .select(col("doc_id"), col("n_tokens"),
        (col("_sum") + col("n_tokens") *
          (mlog(col("_nr") + buckets) - mlog(col("_nt") + buckets)))
          .as("logw_micro"))
      .withColumn("target_like", col("logw_micro") > 0)
  }

  /** BM25 retrieval (Robertson–Spärck Jones, the Okapi form with
    * k₁ = 1.2, b = 0.75): rank documents against a fixed query term
    * set — the retrieval half of a RAG / hard-negative-mining
    * pipeline, and the lexical side every hybrid (BM25 + vector)
    * search needs.
    *
    * Engine-portable by construction: the idf is the integer micro-log
    * (as [[tfidf]]); the length normalization clears its rational
    * constants — with k₁ = 6/5 and b = 3/4,
    * `tf·(k₁+1) / (tf + k₁(1−b+b·dl/avgdl))` scaled by `10·L`
    * (L = corpus token count, avgdl = L/N) becomes
    * `22·tf·L / (10·L·tf + 3·L + 9·dl·N)` — a ratio of exact bigints,
    * floored per term, summed per doc. No float ever forms. Valid
    * while `idf_micro·22·tf·L < 2⁶³` (L ≈ 4·10¹¹ at tf 10); past
    * that, rescale L to kilotokens on both sides.
    *
    * Scale shape: per-doc lengths and the corpus scalars are one
    * map-side-combinable pass; only QUERY-term postings join back
    * (a |query|-term slice, not the corpus); the global top-k is
    * TakeOrderedAndProject. Text never shuffles. */
  def bm25(docs: DataFrame, query: Seq[String], topK: Int = 20): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.where(col("token").isin(query: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("_L"))
      .crossJoin(docs.agg(count(lit(1)).as("_N")))
    tf.join(dfreq, "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("_idf", mlog(col("_N") + 1) - mlog(col("df") + 1))
      .select(col("doc_id"),
        // full product before the ONE floor division — dividing the
        // tf ratio first would floor away the idf precision. The
        // product idf_micro·tf·22·L outgrows int64 at corpus scales
        // (L ≈ 1e10 tokens with tf 20, idf 3e6 already crosses 2^63)
        // where non-ANSI Spark would WRAP NEGATIVE and silently invert
        // the ranking — guard loudly instead (the rangeJoinBinned
        // discipline). Integer divs floor the bound, so the check only
        // errs on the strict side.
        when(col("tf") <=
            expr("(9223372036854775807 div (greatest(_idf, 1) * 22)) div _L"),
          col("_idf") * col("tf") * 22 * col("_L"))
          .otherwise(raise_error(concat(
            lit("bm25: idf_micro*tf*22*L overflows int64 (tf="),
            col("tf").cast("string"), lit(", L="), col("_L").cast("string"),
            lit(") — shard the corpus or rescale the micro units"))))
          .as("_num"),
        // the DENOMINATOR overflows the same way (9·dl·N crosses 2^63
        // at ~1e10 docs with 1e8-token outliers): bound each term at
        // Long.Max/3 so the 3-term sum is wrap-free, refuse loudly
        when(col("tf") <=
            expr("((9223372036854775807 div 3) div 10) div greatest(_L, 1)") &&
            col("dl") <=
            expr("((9223372036854775807 div 3) div 9) div greatest(_N, 1)"),
          lit(10) * col("_L") * col("tf") + lit(3) * col("_L")
            + lit(9) * col("dl") * col("_N"))
          .otherwise(raise_error(concat(
            lit("bm25: the 10·L·tf + 3·L + 9·dl·N denominator overflows "),
            lit("int64 (dl="), col("dl").cast("string"),
            lit(", N="), col("_N").cast("string"),
            lit(") — shard the corpus or rescale the micro units"))))
          .as("_den"))
      .select(col("doc_id"), expr("_num div _den").as("contrib_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), sum("contrib_micro").as("score_micro"))
      .orderBy(desc("score_micro"), asc("doc_id"))
      .limit(topK)
  }

  /** The BPE left-to-right merge fold over a `syms` array — ONE copy
    * shared by training and application: a fold divergence would make
    * the trainer and the tokenizer segment DIFFERENTLY, the silent
    * split the unigram family avoids with its shared SQL builders. */
  private def bpeMergeFoldSql(l: String, r: String, ns: String): String =
    s"""aggregate(syms,
       |  named_struct('out', cast(array() as array<string>),
       |               'pend', cast(null as string)),
       |  (s, x) -> IF(s.pend = '$l' AND x = '$r',
       |    named_struct('out', array_append(s.out, '$ns'),
       |                 'pend', cast(null as string)),
       |    named_struct('out', IF(s.pend IS NULL, s.out,
       |                           array_append(s.out, s.pend)),
       |                 'pend', x)),
       |  s -> IF(s.pend IS NULL, s.out, array_append(s.out, s.pend))
       |)""".stripMargin

  /** BPE merge-rule training (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units" — the tokenizer
    * algorithm itself, not just the prep [[vocabBuild]] does): greedy
    * rounds, each merging the most frequent adjacent symbol pair
    * (count desc, then lexicographic pair — deterministic ties) across
    * the corpus, applied left-to-right within each word.
    *
    * Scale shape — the key fact making BPE trainable at 100 TB: after
    * ONE corpus pass builds the (word, count) table, every round runs
    * entirely over that VOCAB-cardinality table (pair explode ≤
    * word-length fanout, one map-side-combinable aggregate, a 1-row
    * argmax collect — driver-local metadata like k-means centroids).
    * The corpus is never re-scanned; rounds checkpoint the symbol
    * table and free the superseded pin (the Lloyd discipline,
    * [[graft.sim.Ann]]). Tokens normalize to [a-z0-9]+ (lowercase
    * word-piece alphabet) so merge rules are literal-safe.
    *
    * @return one row per learned rule:
    *         (merge_idx, left, right, new_sym, pair_count). */
  def bpeTrain(docs: DataFrame, nMerges: Int = 8): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    // the rounds CHAIN fold projections into one plan (see the loop
    // comment) — bounded rounds keep that plan codegen-sized; a
    // deeper trainer should reintroduce the per-round checkpoint
    require(nMerges >= 1 && nMerges <= 32,
      s"bpeTrain: nMerges ($nMerges) must be in [1, 32] — rounds chain " +
        "into one plan; past ~32 reintroduce per-round checkpoints")
    val spark = docs.sparkSession
    var vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(expr("split(w, '')").as("syms"), col("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var exhausted = false
    // try/finally: a throwing round (failed collect/checkpoint) must
    // still release the live vocab pin — the unigramModel discipline
    try {
    for (i <- 0 until nMerges if !exhausted) {
      val top = vocab.where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "j -> struct(syms[j-1] AS l, syms[j] AS r))")).as("p"))
        .groupBy("p").agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("p.l"), col("p.r")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val p = top.head.getStruct(0)
        val (l, r, pc) = (p.getString(0), p.getString(1), top.head.getLong(1))
        val ns = l + r
        merges += ((i.toLong, l, r, ns, pc))
        // CHAIN the fold onto the pinned base vocab instead of
        // checkpointing per round: each round's pair-count collect
        // then re-evaluates i chained fold projections over the
        // vocab-cardinality pin — one codegen'd pass, the exact shape
        // bpeApply already runs all k rules as — which halves the
        // round's job count (8 collects, not 8 collects + 8 eager
        // checkpoint jobs; measured ~0.6 s off the bpe memo_setup
        // share at sf0.1). Values identical: the folds are deterministic
        // projections, re-evaluated or pinned. nMerges is require-
        // bounded (≤ 32, above) so the chained plan stays codegen-
        // sized — unbounded rounds would want the per-round pin back.
        vocab = vocab.select(
          expr(bpeMergeFoldSql(l, r, ns)).as("syms"), col("cnt"))
      }
    }
    } finally CheckpointBridge.free(vocab)
    import spark.implicits._
    merges.toSeq.toDF("merge_idx", "left", "right", "new_sym", "pair_count")
  }

  /** BPE tokenization with a trained merge table — the APPLY half of
    * [[bpeTrain]] (Sennrich et al. 2016 §2: learned rules replay in
    * learned order, each a left-to-right pass over a word's symbols):
    * per doc, word/char/token counts under the learned segmentation
    * and the chars-per-token compression ratio — the fertility table
    * that decides whether a tokenizer is good enough to train with.
    *
    * Scale shape, same discipline as training: rules are a driver-
    * local model (k rows — the trained-model collect pattern); the
    * merge folds apply to the DISTINCT word table only (vocab
    * cardinality, all k rules in ONE chained codegen projection, one
    * pass); docs then join token counts back on the word key. The
    * corpus text itself is never folded per rule.
    *
    * `trained` supplies an already-trained merge table (the
    * [[bpeTrain]] schema) — the production contract: a pipeline trains
    * the tokenizer ONCE per corpus snapshot and applies it everywhere;
    * re-training inside every apply would re-pay the greedy rounds per
    * consumer. Omitted, apply trains its own (self-contained form). */
  def bpeApply(docs: DataFrame, nMerges: Int = 8,
               trained: Option[DataFrame] = None): DataFrame = {
    val rules = trained.getOrElse(bpeTrain(docs, nMerges))
      .orderBy("merge_idx").collect()
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w").rlike("^[a-z0-9]+$"))
      .distinct()
    var t = words.select(col("w"), expr("split(w, '')").as("syms"))
    for (r <- rules) {
      val (l, rr, ns) = (r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[String]("new_sym"))
      // rules are SPLICED into the merge-fold SQL: self-trained rules
      // are [a-z0-9]+ by construction, a caller-supplied `trained`
      // table must prove it (uniMapLit's discipline)
      Seq(l, rr, ns).foreach(v => require(v != null && v.matches("[a-z0-9]+"),
        s"BPE rule symbol '$v' must match [a-z0-9]+ (rules are spliced " +
          "into generated SQL)"))
      t = t.select(col("w"), expr(bpeMergeFoldSql(l, rr, ns)).as("syms"))
    }
    val wordTok = t.select(col("w"), size(col("syms")).cast("long").as("_n_syms"))
    fertility(docs, wordTok)
  }

  /** ONE copy of the per-doc fertility join-back both tokenizer
    * families share ([[bpeApply]] / [[unigramApply]]): explode words,
    * the same `[a-z0-9]+` token filter, join the per-word token count
    * on the word key, and the identical chars-per-token micro-ratio —
    * a rounding or filter tweak applied to one family but not the
    * other would make the two fertility reports silently
    * incomparable. `wordTok` is (w, _n_syms). */
  private def fertility(docs: DataFrame, wordTok: DataFrame): DataFrame = {
    val per = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w").rlike("^[a-z0-9]+$"))
      .join(wordTok, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum("_n_syms").as("n_tokens"))
    // a per-doc REPORT covers every doc (r15 review — the same
    // docs-left-join coverage fix gopherRules/repetition/
    // unigramLogProb/qualityFeatures each received): a doc with no
    // [a-z0-9]+ word (all punctuation/uppercase) vanished from the
    // fertility table through the inner join, indistinguishable from
    // "doc absent". It reports zero counts and a NULL ratio instead —
    // no tokens, no defined chars-per-token (the IF also keeps the
    // div off zero, which ANSI would kill the job over).
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn("chars_per_token_micro",
        expr("IF(n_tokens = 0, CAST(NULL AS BIGINT), " +
          "n_chars * 1000000 div n_tokens)"))
  }

  /** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization"
    * §3 — the SentencePiece unigram model, the other mainstream
    * tokenizer family beside [[bpeTrain]]): seed a piece inventory from
    * frequent substrings, then Viterbi-EM rounds — segment every word
    * into its maximum-likelihood piece sequence under the current piece
    * costs, re-estimate piece frequencies from those segmentations, and
    * prune the weakest multi-char pieces on a linear shrink toward the
    * target inventory. Single characters are never pruned (coverage —
    * SentencePiece's required-character set). Hard (Viterbi) EM — the
    * deterministic variant — so the train is exact integer arithmetic
    * over micro-log costs and an independent implementation replays it
    * bit-for-bit (the spec's contract).
    *
    * Scale shape, the [[bpeTrain]] discipline: ONE corpus pass builds
    * the (word, cnt) vocab table; seeding explodes substrings over
    * VOCAB cardinality (≤ maxPieceLen per position); each EM round runs
    * the Viterbi DP as one chained codegen projection over the vocab
    * table — the piece-cost model is a driver-local ≤(chars + multis)-
    * entry MAP LITERAL (constant-folded once; the trained-model collect
    * pattern, bounded rows) — plus one map-side-combinable count. The
    * corpus text is never re-scanned after the first pass.
    *
    * Viterbi forward: best[i] = min over j ≤ maxPieceLen of best[i−j] +
    * cost(w[i−j+1..i]); absent pieces cost a sentinel no real path can
    * reach (every single char is always in the model, so position i
    * always has a real arm). Backtrack: the SMALLEST matching j at each
    * boundary — fully deterministic.
    *
    * @return final inventory, one row per piece:
    *         (piece, piece_len, count, cost_micro) — count is the
    *         last-round Viterbi frequency, cost the −log₁₀ micro
    *         unigram cost. */
  private val UniBig = 99999999999L // > any reachable Viterbi path cost

  private def uniMapLit(model: Seq[(String, Long)]): String = {
    // the pieces are SPLICED into generated SQL: the self-trained
    // inventory is [a-z0-9]+ by construction, but a caller-supplied
    // `trained` model must prove it too — an unvalidated quote would
    // inject into (or break) the map literal
    model.foreach { case (p, _) =>
      require(p != null && p.matches("[a-z0-9]+"),
        s"unigram piece '$p' must match [a-z0-9]+ (pieces are spliced " +
          "into generated SQL; retrain on the [a-z0-9]+ token filter)") }
    model.map { case (p, c) => s"'$p', ${c}L" }.mkString("map(", ", ", ")")
  }

  /** Viterbi forward DP over a word column `w`: best-cost array per
    * prefix, one codegen `aggregate`. `m` is the map-literal model. */
  private def uniBestSql(m: String, maxPieceLen: Int): String = {
    val arms = (1 to maxPieceLen).map { j =>
      s"IF(i >= $j, element_at(acc, i - ${j - 1}) + " +
        s"coalesce(element_at($m, substring(w, i - ${j - 1}, $j)), ${UniBig}L), " +
        "CAST(NULL AS BIGINT))"
    }.mkString("least(", ", ", ")")
    s"""aggregate(sequence(1, length(w)), array(CAST(0 AS BIGINT)),
       |  (acc, i) -> array_append(acc, $arms), acc -> acc)""".stripMargin
  }

  /** Viterbi backtrack over `w` and a `_best` column from
    * [[uniBestSql]] — arms nest j ascending: the OUTERMOST test is
    * j = 1, so the smallest matching piece wins every boundary. */
  private def uniBackSql(m: String, maxPieceLen: Int): String = {
    val nested = (maxPieceLen to 1 by -1).foldLeft("s") { (els, j) =>
      s"IF(s.pos >= $j AND element_at(_best, s.pos + 1) = " +
        s"element_at(_best, s.pos - ${j - 1}) + " +
        s"coalesce(element_at($m, substring(w, s.pos - ${j - 1}, $j)), ${UniBig}L), " +
        s"named_struct('pos', s.pos - $j, " +
        s"'out', array_append(s.out, substring(w, s.pos - ${j - 1}, $j))), $els)"
    }
    s"""reverse((aggregate(sequence(1, length(w)),
       |  named_struct('pos', length(w), 'out', CAST(array() AS ARRAY<STRING>)),
       |  (s, i) -> IF(s.pos <= 0, s, $nested), s -> s)).out)""".stripMargin
  }

  /** The training loop shared by [[unigramTrain]] (inventory report)
    * and [[unigramApply]] (segmentation): returns the final
    * (piece, cost_micro) model in inventory order plus the final
    * Viterbi-EM counts. All pins freed on every exit path. */
  private def unigramModel(docs: DataFrame, maxPieceLen: Int,
                           seedMultis: Int, finalMultis: Int, emRounds: Int)
      : (Seq[(String, Long)], Map[String, Long]) = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    require(maxPieceLen >= 2 && maxPieceLen <= 8,
      s"maxPieceLen ($maxPieceLen) must be in [2, 8]")
    require(emRounds >= 1 && seedMultis >= finalMultis && finalMultis >= 1,
      s"bad schedule: rounds=$emRounds seed=$seedMultis final=$finalMultis")
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    try {
    // pinned: the substring explosion feeds TWO collects (singles,
    // top-multis) — unpinned, each would re-run the whole seeding job
    val subs = words.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, least($maxPieceLen, length(w))),
           |  l -> transform(sequence(1, length(w) - l + 1),
           |    p -> substring(w, p, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("n"))
      .localCheckpoint(true)
    val (singles, multis) = try {
      val sg = subs.where(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
      require(sg.nonEmpty, "unigramTrain: no trainable [a-z0-9]+ tokens")
      val ml = subs.where(length(col("piece")) > 1)
        .orderBy(col("n").desc, col("piece")).limit(seedMultis)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      (sg, ml)
    } finally CheckpointBridge.free(subs)
    // integer micro-log cost: −log₁₀ p in the add-one-smoothed model
    def costs(inv: Seq[(String, Long)]): Seq[(String, Long)] = {
      val total = inv.map(_._2).sum
      inv.map { case (p, n) => (p, mlogLong(total + 1) - mlogLong(n + 1)) }
    }
    var model = costs(singles ++ multis)
    var lastCounts = (singles ++ multis).toMap
    for (r <- 1 to emRounds) {
      val m = uniMapLit(model)
      val counted = words
        .withColumn("_best", expr(uniBestSql(m, maxPieceLen)))
        .select(col("cnt"), explode(expr(uniBackSql(m, maxPieceLen))).as("piece"))
        .groupBy("piece").agg(sum("cnt").as("n"))
        .collect().map(rr => (rr.getString(0), rr.getLong(1))).toMap
      val keepMultis = seedMultis - ((seedMultis - finalMultis) * r) / emRounds
      val sing = singles.map { case (p, _) => (p, counted.getOrElse(p, 0L)) }
      val mult = model.map(_._1).filter(_.length > 1)
        .map(p => (p, counted.getOrElse(p, 0L)))
        .sortBy { case (p, n) => (-n, p) }.take(keepMultis)
        .filter(_._2 > 0)
      lastCounts = (sing ++ mult).toMap
      model = costs(sing ++ mult)
    }
    (model, lastCounts)
    } finally CheckpointBridge.free(words)
  }

  def unigramTrain(docs: DataFrame, maxPieceLen: Int = 5,
                   seedMultis: Int = 96, finalMultis: Int = 48,
                   emRounds: Int = 2): DataFrame = {
    val (model, lastCounts) =
      unigramModel(docs, maxPieceLen, seedMultis, finalMultis, emRounds)
    val spark = docs.sparkSession
    import spark.implicits._
    model.map { case (p, c) =>
      (p, p.length.toLong, lastCounts.getOrElse(p, 0L), c)
    }.toDF("piece", "piece_len", "count", "cost_micro")
  }

  /** Unigram tokenization with the [[unigramTrain]] model — the APPLY
    * half, [[bpeApply]]'s shape for the other tokenizer family: per
    * doc, word/char/token counts under the trained max-likelihood
    * segmentation plus the chars-per-token fertility micro-ratio.
    *
    * Scale shape, the bpeApply discipline: the trained model is a
    * driver-local map literal; the Viterbi DP + backtrack run over
    * the DISTINCT word table only (vocab cardinality, one chained
    * codegen projection), then token counts join back on the word
    * key. The corpus text is never segmented per piece. */
  def unigramApply(docs: DataFrame, maxPieceLen: Int = 5,
                   seedMultis: Int = 96, finalMultis: Int = 48,
                   emRounds: Int = 2,
                   trained: Option[DataFrame] = None): DataFrame = {
    // `trained` takes an already-trained model ([[unigramTrain]]
    // schema) — the same train-once production contract as
    // [[bpeApply]]'s `trained`: re-running the Viterbi-EM rounds (and
    // their driver collects) inside every apply re-pays training per
    // consumer. Omitted, apply trains its own (self-contained form).
    val model: Seq[(String, Long)] = trained match {
      case Some(t) => t.select("piece", "cost_micro").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      case None =>
        unigramModel(docs, maxPieceLen, seedMultis, finalMultis, emRounds)._1
    }
    val m = uniMapLit(model)
    // probe as deep as the model's LONGEST piece: with a caller-trained
    // model and the default maxPieceLen, longer pieces would be
    // silently unreachable and segmentation would diverge from
    // training with no error
    val probeLen = (maxPieceLen +: model.map(_._1.length)).max
    val wordTok = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w").rlike("^[a-z0-9]+$"))
      .distinct()
      .withColumn("_best", expr(uniBestSql(m, probeLen)))
      .select(col("w"),
        size(expr(uniBackSql(m, probeLen))).cast("long").as("_n_syms"))
    fertility(docs, wordTok)
  }

  /** TF-IDF top-`topK` terms per document — the keyword-extraction /
    * topic-tagging pass of a curation pipeline. The idf is the
    * [[unigramLogProb]] integer micro-log: `score = tf ·
    * (⌊log₁₀(N+1)·10⁶⌋ − ⌊log₁₀(df+1)·10⁶⌋)` — both logs evaluate on
    * INTEGER inputs, so floor-to-micro renders them engine-portable,
    * and everything after is exact bigint arithmetic (no float idf to
    * drift between engines). Rare terms score high, corpus-saturating
    * terms score ~0; ties break on token order.
    *
    * Scale shape: tf is one (doc, token) map-side-combinable count;
    * df aggregates tf's output WITHOUT re-reading text (counting tf
    * rows = counting distinct docs per token, tf is already distinct);
    * N broadcasts as a 1-row scalar; the per-doc ranking window is
    * partitioned by doc_id — never global. The token join shuffles
    * (tf, df) pairs, not text. */
  def tfidf(docs: DataFrame, topK: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_nd"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score_micro"), asc("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf") * (mlog(col("_nd") + 1) - mlog(col("df") + 1)))
          .as("score_micro"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= topK)
  }

  /** Gopher quality-filter rule suite (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", Appendix A1.1 — the published document-level heuristics
    * that became the de-facto pretraining gate): word-count bounds,
    * mean-word-length bounds, a stopword minimum (the paper requires
    * ≥ 2 distinct hits from a fixed 8-word list), an alphabetic-word
    * fraction floor, and a repetition ceiling (the paper's
    * duplicate-n-gram family, expressed here as the top unigram's
    * share — the n=1 member of that family, the only one this
    * single-line corpus exercises).
    *
    * Every ratio is integer MICRO-UNITS (⌊x·10⁶⌋ with integer div) so
    * the oracle recomputes bit-for-bit; thresholds are parameters with
    * the paper's defaults. Scale shape: one (doc_id, token) hash
    * aggregate with map-side partials, then a per-doc projection —
    * the same single-shuffle shape as [[quality]]; rules are
    * expressions, never extra passes. */
  def gopherRules(docs: DataFrame,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minMeanLenMicro: Long = 3000000L,
                  maxMeanLenMicro: Long = 10000000L,
                  minStopHits: Long = 2L,
                  minAlphaMicro: Long = 800000L,
                  maxTopTokMicro: Long = 200000L): DataFrame = {
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = docs.select(col("doc_id"), explode(words).as("tok"))
    val stats = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_words"),
        sum(col("cnt") * length(col("tok"))).as("_len_sum"),
        countDistinct(when(col("tok").isInCollection(gopherStops), col("tok")))
          .as("stop_hits"),
        sum(when(col("tok").rlike("[a-z]"), col("cnt")).otherwise(0L))
          .as("_alpha"),
        max("cnt").as("_top"))
      .select(col("doc_id"), col("n_words"),
        expr("(_len_sum * 1000000) div n_words").as("mean_len_micro"),
        col("stop_hits"),
        expr("(_alpha * 1000000) div n_words").as("alpha_micro"),
        expr("(_top * 1000000) div n_words").as("top_tok_micro"))
    // a GATE returns a verdict for EVERY doc — this function is the
    // named discipline the siblings cite, yet it dropped zero-token
    // docs itself (r12 text review). Zeroed stats make the rules
    // compute naturally: no words fails the minimums (keep = false),
    // exactly what the paper's rules say about an empty page.
    docs.select("doc_id").join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("mean_len_micro"), lit(0L)).as("mean_len_micro"),
        coalesce(col("stop_hits"), lit(0L)).as("stop_hits"),
        coalesce(col("alpha_micro"), lit(0L)).as("alpha_micro"),
        coalesce(col("top_tok_micro"), lit(0L)).as("top_tok_micro"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_mean_len",
        col("mean_len_micro") >= minMeanLenMicro &&
          col("mean_len_micro") <= maxMeanLenMicro)
      .withColumn("ok_stop", col("stop_hits") >= minStopHits)
      .withColumn("ok_alpha", col("alpha_micro") >= minAlphaMicro)
      .withColumn("ok_repetition", col("top_tok_micro") <= maxTopTokMicro)
      .withColumn("keep",
        col("ok_words") && col("ok_mean_len") && col("ok_stop") &&
          col("ok_alpha") && col("ok_repetition"))
  }

  /** Bigram-LM perplexity scoring — the CCNet quality signal (Wenzek
    * et al. 2020 §3.3 score documents with a language-model negative
    * log-likelihood; KenLM there, an order-2 model with add-one
    * smoothing here, trained on the corpus itself in the same job):
    * P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V), doc score = mean −log₁₀ P over
    * its bigrams. High avg_neg_log10p = surprising/noisy text; low =
    * fluent under the corpus distribution.
    *
    * Parity: the only float op is log10 of an INTEGER count, floored
    * to micro-units per model row ([[unigramLogProb]]'s trick), so
    * per-doc sums are exact long arithmetic in both engines. Scale
    * shape: bigram extraction is an array zip (no join against
    * position-shifted copies); the model is one map-side-combinable
    * aggregate; scoring re-joins docs to the model on the bigram key —
    * model rows are bounded by distinct bigrams (≪ corpus tokens), and
    * V is a 1-row broadcast. */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), words.as("ws"))
      // greatest(…, 0): a ZERO-token doc made the slice length −1,
      // which is a SparkRuntimeException that killed the whole corpus
      // scan (r12 text review) — the empty slice feeds zero bigrams
      // and the doc reaches the coverage join below like any other
      // sub-2-word doc
      .select(col("doc_id"),
        expr("slice(ws, 1, greatest(size(ws) - 1, 0))").as("a"),
        expr("slice(ws, 2, greatest(size(ws) - 1, 0))").as("b"))
      .select(col("doc_id"), expr("explode(arrays_zip(a, b))").as("p"))
      .select(col("doc_id"), col("p.a").as("w1"), col("p.b").as("w2"))
    // The model-build and scoring branches each explode the corpus
    // once (Spark does no CSE across the join). Measured trade, both
    // SFs: pre-aggregating (doc, w1, w2) counts to share one explode
    // ADDS a corpus-sized shuffle while shrinking nothing (bigram
    // instances are near-distinct within a doc) and came out slower at
    // sf0.1 AND the 10× spike (1.0→1.5 s / 11.8→13.5 s). Two columnar
    // scans are the cheaper linear path — scans prune and stream;
    // corpus-wide shuffles spill.
    val model = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val lefts = model.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = docs
      .select(explode(words).as("tok"))
      .agg(countDistinct("tok").as("_V"))
    val scored = model.join(lefts, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        (mlog(col("c1") + col("_V")) - mlog(col("c12") + 1L)).as("mneg"))
    val report = pairs.join(scored, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("mneg").as("sum_mneg"))
    // a QUALITY SCORE must cover EVERY doc (the repetition/gopherRules
    // discipline): a sub-2-word doc has no bigrams — zero perplexity
    // evidence — so it reports zeroed counts and a NULL mean (0 of 0
    // bigrams has no honest ratio) rather than silently vanishing
    // from both the keep and drop sets of a downstream filter
    docs.select("doc_id").join(report, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_mneg"), lit(0L)).as("sum_mneg"),
        round(col("sum_mneg") / 1e6 / col("n_bigrams"), 4).as("avg_neg_log10p"))
  }
}
