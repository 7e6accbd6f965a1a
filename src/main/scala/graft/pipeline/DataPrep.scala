package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Training-set preparation operators beyond dedup/quality gating:
  * benchmark decontamination, deterministic dataset mixing, and
  * context-window sequence packing. Each is a small declarative plan
  * whose shape survives 100 TB: the benchmark side of decontamination
  * broadcasts, sampling is a stateless projection, and packing windows
  * are partitioned by a bounded doc_id bucket (never one global
  * unpartitioned window).
  */
object DataPrep {

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minShared` distinct word n-gram shingles with ANY benchmark
    * document — the standard eval-leakage scrub before training.
    *
    * Scale shape: the benchmark set (eval suites — thousands of docs)
    * is minute next to the corpus, so its DISTINCT shingle set is
    * broadcast; the corpus side is shingle explode → broadcast hash
    * join → one (doc_id) aggregate. The corpus never shuffles its
    * text, and a doc with no benchmark overlap contributes nothing
    * past the join. */
  /** @param shingleTable precomputed [[Dedup.shingles]] output for
    *   `docs` (the session memo every other shingle consumer reads) —
    *   without it each call re-tokenizes and re-explodes the whole
    *   corpus, a second complete text scan at the 100 TB design point
    *   (r12 review); the benchmark side is tiny and always shingled
    *   fresh. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    minShared: Int = 2, n: Int = 3,
                    shingleTable: Option[DataFrame] = None,
                    benchShingleTable: Option[DataFrame] = None): DataFrame = {
    // both sides fold the shingle STRING to a 64-bit xxhash64 before
    // the broadcast join (r16): the probe side then hashes/compares
    // 8-byte longs instead of ~20-char strings, and the broadcast
    // relation shrinks the same way. Counts are identical up to 64-bit
    // collisions (~1e-8 at 1e6 distinct shingles) — the digest is
    // internal, the Dedup.crossDocSubstrings digest-choice note.
    val corpus = shingleTable.getOrElse(Dedup.shingles(docs, n))
      .select(col("doc_id"), explode(col("shs")).as("_s"))
      .select(col("doc_id"), xxhash64(col("_s")).as("s"))
    // benchShingleTable (r17): when the benchmark set is a SLICE of an
    // already-shingled corpus, the caller hands the precomputed
    // (doc_id, shs) rows for it instead of re-shingling raw text —
    // rebuilding here was decontaminate's single largest job
    // (measured 1.6 s on ONE task: the optimizer's inferred explode
    // guards push below the shingle projection and inline the whole
    // interpreted HOF into a per-row Filter over the raw scan)
    val benchSh = benchShingleTable.getOrElse(Dedup.shingles(benchmark, n))
      .select(explode(col("shs")).as("_s"))
      .select(xxhash64(col("_s")).as("s")).distinct()
    val hits = corpus.join(broadcast(benchSh), Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("_shared"))
    docs.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_shared"), lit(0L)).as("shared_ngrams"),
        (coalesce(col("_shared"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** Deterministic stratified sampling — dataset MIXING: each stratum
    * (source, language, quality band) keeps a configured fraction of
    * its rows, decided by a pure hash of the row key so the sample is
    * reproducible across runs, engines and partitionings (no RNG, no
    * seed-per-partition coupling). A row is kept iff
    * knuth(key) / 2³² < rate(stratum). Stateless projection + filter:
    * nothing shuffles, pushdown still applies, and the same call on a
    * 1000-executor cluster picks the identical rows.
    *
    * The hash folds the key into [0, 2³¹) before the Knuth multiply —
    * the raw multiply overflows Long past keys ~3.5e9 (ANSI-mode
    * runtime error at exactly 100 TB key ranges). pmod keeps the fold
    * non-negative for NEGATIVE keys too; a SQL mirror must use the
    * pmod-equivalent ((k % m + m) % m), not bare sign-preserving %,
    * or the engines pick different rows below key 0. */
  def sampleStratified(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double], salt: Long = 0L): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.where(knuthHash(keyCol, salt) < rate * lit(4294967296L))
  }

  /** The overflow-guarded Knuth hash both samplers share — ONE copy of
    * the fold-then-multiply (see [[sampleStratified]]'s scaladoc for
    * the overflow/negative-key rationale; its SQL mirror is the
    * pmod-equivalent `((k % m + m) % m)` form). */
  private def knuthHash(keyCol: String, salt: Long = 0L) =
    graft.core.Hashes.knuth(col(keyCol), salt)

  /** Domain-mixture resampling (the Pile/Dolma-style source weighting):
    * given target shares in integer percent, find the largest total the
    * corpus can serve at those shares (capped by its scarcest source:
    * T = min_s ⌊n_s·100/w_s⌋), then keep each source's share by the
    * same engine-portable Knuth-hash threshold [[sampleStratified]]
    * uses — but with the per-source thresholds DERIVED from the data
    * (one tiny count aggregate, broadcast back), not hand-fed rates.
    * Sources without a weight are dropped (share 0 of the mixture);
    * a WEIGHTED source absent from the corpus counts as n_s = 0, so T
    * collapses to 0 and the mixture is empty — never silently skewed
    * (the weights side of the count join is the literal weight table,
    * not the corpus, exactly so absent sources can't vanish from the
    * feasibility min). All threshold arithmetic is integer-exact;
    * valid while every source holds < 2³¹ rows (the k·2³² product's
    * overflow bound) — past that, pre-scale with a stratified pass
    * carrying a DISTINCT `salt`: all samplers share one key hash, so
    * same-salt stages are fully correlated (the survivors of stage 1
    * all hash below its threshold, and stage 2's realized fractions
    * skew by exactly that conditioning — r12 review). */
  def sampleMixture(docs: DataFrame, keyCol: String, sourceCol: String,
                    weightsPct: Map[String, Int], salt: Long = 0L): DataFrame = {
    require(weightsPct.nonEmpty && weightsPct.values.forall(_ > 0) &&
      weightsPct.values.sum == 100,
      s"mixture weights must be positive percents summing to 100: $weightsPct")
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = weightsPct.toSeq.map { case (s, w) => (s, w.toLong) }
      .toDF(sourceCol, "_w")
    val counts = weights.join(
      docs.groupBy(sourceCol).agg(count(lit(1)).as("_ns")),
      Seq(sourceCol), "left")
      .withColumn("_ns", coalesce(col("_ns"), lit(0L)))
    val feasible = counts.agg(min(expr("(_ns * 100) div _w")).as("_T"))
    val thr = counts.where(col("_ns") > 0)
      .crossJoin(broadcast(feasible))
      .select(col(sourceCol),
        expr("(((_w * _T) div 100) * 4294967296) div _ns").as("_thr"))
    docs.join(broadcast(thr), Seq(sourceCol))
      .where(knuthHash(keyCol, salt) < col("_thr")).drop("_thr")
  }

  /** Temperature-scaled source mixture (the multilingual sampling rule
    * of XLM-R, Conneau et al. 2020 §3.1: sample source i with
    * probability ∝ p_i^α, α < 1, upsampling the tail): at α = ½ the
    * per-source weight is √n_i, here floor(√(n_i·10⁶)) — an INTEGER
    * isqrt (exact for n_i·10⁶ < 2⁵², sqrt being correctly-rounded
    * IEEE), so Z = Σw_i is an order-independent integer sum where a
    * floating Σ√n would drift with partition order and a pow() chain
    * could drift a ulp between engines. Target take T = ⌊N·pct/100⌋
    * splits as t_i = ⌊T·w_i/Z⌋; each source keeps by the same
    * engine-portable Knuth-hash threshold as [[sampleMixture]]
    * (⌊t_i·2³²/n_i⌋, one broadcast of S thresholds, join-free row
    * decision). A tail source whose target exceeds its size caps at
    * keep-all — without-replacement sampling can't upsample past 1;
    * the realized mixture shows the cap rather than silently
    * re-normalizing. Integer-exact while every t_i < 2³¹ (the t_i·2³²
    * overflow bound, as sampleMixture's). Compose with other sampling
    * stages only under DISTINCT salts (see [[sampleMixture]]). */
  def sampleTemperature(docs: DataFrame, keyCol: String, sourceCol: String,
                        targetPct: Int, salt: Long = 0L): DataFrame = {
    require(targetPct > 0 && targetPct <= 100,
      s"targetPct must be in (0, 100]: $targetPct")
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("_ns"))
      .withColumn("_w", floor(sqrt(col("_ns") * lit(1000000L))).cast("bigint"))
    val tot = counts.agg(sum(col("_w")).as("_z"),
      expr(s"(sum(_ns) * $targetPct) div 100").as("_T"))
    // t_i = ⌊T·w/Z⌋ via the exact decomposition
    // (T div Z)·w + ((T mod Z)·w) div Z: the direct T·w product
    // overflows int64 INSIDE the documented validity domain (300
    // sources × 2e9 rows puts T·w ≈ 1.1e19 past Long.Max) while every
    // decomposition intermediate stays below Z·max(w) (r12 review).
    // All operands non-negative, so div/% are exact floor pieces and
    // the DuckDB mirror is the same expression verbatim.
    val thr = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        least(lit(4294967296L),
          expr("((((_T div _z) * _w + ((_T % _z) * _w) div _z)) * 4294967296) div _ns"))
          .as("_thr"))
    docs.join(broadcast(thr), Seq(sourceCol))
      .where(knuthHash(keyCol, salt) < col("_thr")).drop("_thr")
  }

  /** Context-window sequence packing ("concat-and-chunk"): documents
    * are concatenated in doc_id order and cut every `ctxTokens`
    * tokens; each document reports the sequence its first token lands
    * in and its offset inside that sequence. Packing runs per doc_id
    * RANGE BUCKET of `bucketSize` docs — the window is partitioned by
    * bucket, so no executor ever sorts more than a bucket (a single
    * global running sum is exactly the unpartitioned-window shape this
    * codebase bans). Buckets correspond to independent shards of the
    * packed dataset; sequence ids are globally unique via
    * bucket * 2²⁰ + local index — valid while a bucket packs fewer
    * than 2²⁰ sequences (≈ 2²⁰ · ctxTokens tokens per bucket; the
    * defaults allow ~2 G tokens per 100 docs). An overflowing bucket
    * would silently collide into the next bucket's id space, so the
    * projection raises instead (guard is a codegen'd branch, free on
    * the non-overflow path). */
  def packSequences(docs: DataFrame, ctxTokens: Int = 2048,
                    bucketSize: Int = 100): DataFrame = {
    val t = docs.select(col("doc_id"),
      expr(s"doc_id div $bucketSize").as("bucket"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    val localIdx = expr(s"(_cum - n_tokens) div $ctxTokens")
    // the guard names the NULL input (r15 review — the three-valued
    // trap the pass@k guard class documents): a NULL-text doc has
    // NULL n_tokens, so localIdx is NULL, when(NULL < 2^20) is
    // UNKNOWN, and the unnamed form fell through to raise_error with
    // a misleading overflow message — while the oracle returns the
    // doc's NULL seq_id row. NULL stays NULL (no tokens, no defined
    // sequence slot), matching the oracle's arithmetic.
    val guarded = when(localIdx.isNull, lit(null).cast("bigint"))
      .when(localIdx < lit(1048576L), localIdx).otherwise(expr(
      """raise_error(concat('packSequences: bucket ', bucket,
        |  ' exceeds 2^20 sequences - raise ctxTokens or shrink bucketSize'))"""
        .stripMargin))
    t.withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("bucket"), col("n_tokens"),
        (col("bucket") * lit(1048576L) + guarded).as("seq_id"),
        ((col("_cum") - col("n_tokens")) % ctxTokens).as("seq_offset"))
  }

  /** Group-aware train/valid/test split — the assignment-time guard
    * against eval contamination: the split is a pure md5 hash of the
    * GROUP key (source domain, url host, dedup-cluster id …), so every
    * document of a group lands in ONE split. Near-duplicates and
    * templated text cluster within groups; a row-level split leaks
    * them across train/eval and inflates every benchmark it touches
    * ([[decontaminate]] audits that leak after the fact — this
    * prevents it where it starts). Engine-portable: the md5 fold is
    * the shuffle_shard 60-bit conv, reproducible across runs, engines
    * and partitionings; no RNG, no seed-per-partition coupling.
    * Stateless projection — nothing shuffles, pushdown still applies,
    * and a 1000-executor cluster assigns the identical rows. */
  def splitLeakageSafe(df: DataFrame, groupCol: String,
                       trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct > 0 && validPct > 0 && trainPct + validPct < 100,
      s"bad split ($trainPct/$validPct): need train>0, valid>0, train+valid<100")
    // the ONE md5-fold copy (Hashes.md5Fold60) — shared with
    // shuffle_shard so split and shard assignment cannot hand-sync-drift
    val h = graft.core.Hashes.md5Fold60(groupCol, 100)
    df.withColumn("split",
      when(h < trainPct, "train")
        .when(h < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Deterministic fixed-size per-group sample (the reproducible form
    * of reservoir sampling): for each group, the `k` rows whose Knuth
    * key hash sorts lowest — a "random" draw that every engine, run,
    * and partitioning reproduces bit-for-bit, unlike rand()-seeded
    * reservoirs whose output depends on partition iteration order.
    * Draws are ranked (1..k, hash order, doc-id tie-break) so
    * downstream can take any prefix for a smaller sample without
    * re-drawing — the nested property real eval-set carving relies on.
    *
    * Scale shape: ranking rides the bounded-state [[graft.sim.TopKStruct]]
    * heap, NOT a per-group window sort — each input partition reduces
    * to ≤ k rows of state before the one shuffle, so a 10⁹-row group
    * costs the same shuffle bytes as a 10³-row one. A group with fewer
    * than k rows yields all of them. */
  /** @param salt decorrelates this draw from other salt-0 samplers
    *   (r15 review — the composition hazard sampleMixture/
    *   sampleTemperature document): an eval set carved here at salt 0
    *   is exactly the lowest-hash rows, which ALL land inside any
    *   salt-0 stratified training sample — maximal train/eval leakage
    *   from two "independent" reproducible draws. Pass a distinct salt
    *   per logical draw. */
  def sampleReservoir(df: DataFrame, keyCol: String, groupCol: String,
                      k: Int, salt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.sim.TopKStruct
    require(k >= 1, s"sampleReservoir: k ($k) must be at least 1")
    // TopKStruct keeps the LARGEST structs; negate so the smallest
    // hash (then smallest key) wins
    val payload = struct((-knuthHash(keyCol, salt)).as("nh"), (-col(keyCol)).as("nk"))
    val agg = ColumnBridge.column(
      TopKStruct(ColumnBridge.expression(payload), k).toAggregateExpression())
    df.groupBy(col(groupCol)).agg(agg.as("_top"))
      .select(col(groupCol), posexplode(col("_top")))
      .select(col(groupCol), (col("pos") + 1).cast("bigint").as("draw"),
        (-col("col.nk")).as(keyCol))
  }
}
