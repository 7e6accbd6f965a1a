package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding quantization for the similarity stack: symmetric
  * per-vector int8 (the faiss/SQ8-style scalar quantizer). Storage for
  * an ANN corpus drops 4× (float32 → int8 + one scale per vector), and
  * the reconstruction v̂ = q·scale keeps cosine ordering close enough
  * for candidate generation, with exact re-scoring on the float
  * vectors as the verify step — the same candidates-then-verify split
  * as every dedup operator here.
  *
  * Everything is a per-row codegen'd projection (transform/array_max/
  * [[VecDot]]) — no shuffle, no UDF; at 100 TB this runs at scan
  * speed. The quantization error report (per-vector MSE) is the audit
  * a pipeline stores next to the quantized corpus.
  */
object Quantize {

  /** Embedding-SPACE audit: per-DIMENSION corpus statistics — the
    * health report run before trusting an embedding column (collapsed
    * dimensions from a degenerate encoder, range blow-ups that break
    * quantizer scales, the n-vs-dim sanity row). One map-side-partial
    * hash aggregate over the exploded (dim, value) stream: 64 output
    * rows regardless of corpus size, nothing else shuffles.
    *
    * Means are integer-exact for engine parity: each value folds to
    * floor(v·10⁶) micro-units (double arithmetic on an exactly-cast
    * float — deterministic in both engines) and the per-dim mean is
    * the long sum divided back down, immune to float summation order.
    * Long capacity bounds the contract at ~9·10¹² vectors per
    * aggregation — past that, shard the sum (the same split the
    * micro-log LM score documents). min/max on the raw values are
    * order-free and exact. `collapsed` flags dimensions whose whole
    * corpus range sits inside `eps`. `n_nonfinite` counts NaN/Inf
    * values per dim — THE column that finds the corrupt vectors the
    * search surfaces exclude (allFinite's scaladoc sends callers
    * here). */
  def dimStats(vectors: DataFrame, eps: Double = 1e-4): DataFrame =
    vectors.select(posexplode(col("embedding")))
      .select(col("pos").cast("bigint").as("dim"),
        col("col").cast("double").as("v"))
      // the AUDIT must survive what it audits (r12 sim review): the
      // search surfaces exclude non-finite vectors and point HERE as
      // the report that finds them — but floor(NaN)·cast(bigint) is an
      // ANSI runtime error, so one corrupt vector killed the whole
      // audit instead of being counted. Non-finite values are COUNTED
      // per dim (n_nonfinite — the finding) and excluded from the
      // micro-sum/min/max; a dim with no finite values reports NULL
      // stats and collapsed = false (no evidence). CASE short-circuits,
      // so the bigint cast never sees a non-finite value.
      .withColumn("_fin", !isnan(col("v")) && abs(col("v")) < lit(Double.PositiveInfinity))
      .withColumn("_mv",
        when(col("_fin"), floor(col("v") * 1000000d).cast("bigint")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(when(col("_fin"), 0L).otherwise(1L)).as("n_nonfinite"),
        sum(col("_mv")).as("_sum_micro"),
        min(when(col("_fin"), col("v"))).as("_min"),
        max(when(col("_fin"), col("v"))).as("_max"))
      // the micro-unit sum wraps past 2^63 (~9.2e9 vectors at the 1e3
      // value bound) — raise loudly like cellMeans (the bm25
      // discipline), never report a silently wrong mean from the
      // AUDIT that exists to catch range blow-ups. The guard is
      // EXACT-by-construction, not a post-check on the sum: a long
      // sum wrapped far past 2^63 can alias back inside any accepted
      // range, so test the worst case n·max|mv| instead — both
      // factors come from the same aggregate (floor is monotonic, so
      // floor(min·10⁶)/floor(max·10⁶) bound every _mv exactly) and
      // the product is computed in DOUBLE, which cannot wrap
      .withColumn("_bound_micro",
        greatest(abs(floor(col("_min") * 1000000d)),
          abs(floor(col("_max") * 1000000d))))
      .withColumn("_sum_micro",
        when((col("n") - col("n_nonfinite")).cast("double") * col("_bound_micro")
            > lit(math.pow(2, 62)),
          raise_error(lit("dimStats: worst-case micro-unit sum near int64 " +
            "range — shard the aggregation")))
          .otherwise(col("_sum_micro")))
      .select(col("dim"), col("n"), col("n_nonfinite"),
        round(col("_sum_micro") / (col("n") - col("n_nonfinite")) / 1000000d, 4)
          .as("mean_v"),
        round(col("_min"), 4).as("min_v"),
        round(col("_max"), 4).as("max_v"),
        coalesce(col("_max") - col("_min") < eps, lit(false)).as("collapsed"))

  /** The corpus re-expressed as reconstructed int8 vectors v̂ = q·scale
    * (what a stored int8+scale index decodes at scan time). The scale
    * MUST be multiplied back: pairwise cosine is per-vector
    * scale-invariant either way, but IVF centroids are MEANS across
    * vectors — raw q vectors (all max-abs 127) would weight every
    * vector by 1/scale and warp the cell geometry away from the float
    * index it must mirror. Public so a pipeline can materialize the
    * quantized corpus ONCE and feed it to [[annInt8]] / [[annInt8Ivf]]
    * — each call otherwise re-quantizes per plan subtree. */
  def quantized(vectors: DataFrame): DataFrame =
    withQuantized(vectors)
      .select(col("vec_id"),
        expr("transform(qv, x -> cast(x as double) * scale)").as("embedding"))

  /** (vec_id, v: double[], scale, qv: bigint[]) — ONE copy of the
    * quantizer arithmetic (scale = amax/127 guarded against all-zero
    * vectors; q = floor(v/scale + 0.5) clamped to ±127, explicit
    * floor because CAST rounds in DuckDB but truncates in Spark),
    * shared by [[quantized]] and [[int8Report]]: the report must
    * describe the SAME quantizer that produced the stored corpus, or
    * a drifted copy silently invalidates the audit. */
  private def withQuantized(vectors: DataFrame): DataFrame =
    vectors
      // non-finite vectors have no defined int8 code — amax is NaN, so
      // scale is NaN and the bigint cast of floor(NaN) is an ANSI
      // runtime error that killed the whole query on ONE corrupt
      // vector (r12 sim review). Excluded at intake, like every search
      // surface; dimStats' n_nonfinite is the audit that finds them.
      .where(VectorOps.allFinite(col("embedding")))
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("scale",
        greatest(expr("array_max(transform(v, x -> abs(x)))") / 127, lit(1e-12)))
      .withColumn("qv", expr(
        """transform(v, x ->
          |  greatest(least(cast(floor(x / scale + 0.5) as bigint), 127), -127))""".stripMargin))

  /** ANN over the int8-quantized corpus: same broadcast-queries +
    * bounded-state top-k plan as [[Ann.bruteForce]], scoring the
    * quantized vectors — the memory-bound regime where SQ8 pays off
    * (4× less corpus to stream per scan). Approximate (quantization
    * noise can reorder close neighbors); top-1 recall vs the float
    * baseline is spec-asserted, so this registers rows-only.
    * @param quantizedVectors pre-materialized [[quantized]] corpus (the
    *   stored index); built inline when absent. */
  def annInt8(vectors: DataFrame, queries: DataFrame, k: Int,
              quantizedVectors: Option[DataFrame] = None): DataFrame =
    Ann.bruteForce(quantizedVectors.getOrElse(quantized(vectors)),
      quantized(queries), k)

  /** The production composition of both approximations: IVF cell
    * pruning over the int8-quantized corpus for CANDIDATE GENERATION,
    * then exact re-scoring of the candidate set on the float vectors —
    * the candidates-then-verify split promised above (faiss's SQ8 +
    * refine). The quantized index does all the heavy lifting (4× less
    * corpus streamed, nprobe/nCells of it probed); the float corpus is
    * touched only by the candidate semi-join (`kCand` rows per query
    * survive), so compounded int8+IVF error affects WHICH candidates
    * surface but never their final ordering — without the refine step,
    * boundary flips + near-tie reordering drove top-1 recall below the
    * spec floor. Still approximate (the true NN can live in an unprobed
    * cell, exactly like [[Ann.ivf]]); registers rows-only with the
    * spec'd top-1 recall contract. */
  def annInt8Ivf(vectors: DataFrame, queries: DataFrame, k: Int,
                 nCells: Int = 0, nprobe: Int = 4,
                 quantizedVectors: Option[DataFrame] = None): DataFrame = {
    import VectorOps.{dot, norm}
    // candidate pool from the quantized index: wider than k so float
    // re-scoring has slack to reorder (quantization noise perturbs
    // ranks, rarely ejects a true neighbor) — the ONE shared
    // candidates-then-verify floor (Ann.rerankWidth; this site had
    // drifted to max(4k, 20), r13 review)
    val kCand = Ann.rerankWidth(k)
    val cand = Ann.ivf(quantizedVectors.getOrElse(quantized(vectors)),
        quantized(queries), kCand, nCells, nprobe)
      .select(col("q_id"), col("nn_id"))
    // refine: exact float cosine on the candidate set only — the ONE
    // shared scaffold (Ann.refineExact; no corpus shuffle, no full
    // scoring pass — broadcast rationale documented there)
    Ann.refineExact(cand, vectors, queries, k)
  }

  /** Per-vector int8 quantization report. scale = amax/127 guarded
    * against all-zero vectors; q = floor(v/scale + 0.5) clamped to
    * [-127, 127] (explicit floor — engine-portable, where CAST rounds
    * in DuckDB but truncates in Spark). MSE comes from the dot-product
    * identity |v − s·q|² = v·v − 2s(q·v) + s²(q·q), evaluated with the
    * same sequential double folds on both engines. */
  def int8Report(vectors: DataFrame): DataFrame = {
    import VectorOps.dot
    val q = withQuantized(vectors)
      .withColumn("qd", expr("transform(qv, x -> cast(x as double))"))
    val good = q.select(col("vec_id"), round(col("scale"), 6).as("scale"),
      expr("aggregate(qv, cast(0 as bigint), (a, x) -> a + x)").as("q_sum"),
      array_min(col("qv")).as("q_min"), array_max(col("qv")).as("q_max"),
      round((dot(col("v"), col("v"))
        - lit(2) * col("scale") * dot(col("qd"), col("v"))
        + col("scale") * col("scale") * dot(col("qd"), col("qd")))
        / size(col("v")) * lit(1000000), 4).as("mse_ppm"))
    // a per-vector AUDIT covers EVERY vector (the cdcChunks /
    // nearestNeighborReport backfill discipline — r13 review): a
    // non-finite or NULL embedding has no defined int8 code, but
    // silently dropping its row made a "why has this vec_id no
    // scale/MSE" lookup find nothing and shifted every corpus-wide
    // average's denominator. It gets an explicit all-NULL metrics row
    // instead; the coalesce(…, false) leg catches NULL arrays, which
    // three-valued !allFinite alone would drop from BOTH legs.
    val bad = vectors
      .where(!coalesce(VectorOps.allFinite(col("embedding")), lit(false)))
      .select(col("vec_id") +: good.schema.fields.tail.map(f =>
        lit(null).cast(f.dataType).as(f.name)): _*)
    good.unionByName(bad)
  }
}
