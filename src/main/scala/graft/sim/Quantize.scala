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

  /** The corpus re-expressed as reconstructed int8 vectors (q as
    * double; the per-vector scale cancels in cosine, so ANN over these
    * IS ANN over the quantized corpus). */
  private def asQuantized(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("scale",
        greatest(expr("array_max(transform(v, x -> abs(x)))") / 127, lit(1e-12)))
      .select(col("vec_id"), expr(
        """transform(v, x -> cast(
          |  greatest(least(cast(floor(x / scale + 0.5) as bigint), 127), -127)
          |  as double))""".stripMargin).as("embedding"))

  /** ANN over the int8-quantized corpus: same broadcast-queries +
    * bounded-state top-k plan as [[Ann.bruteForce]], scoring the
    * quantized vectors — the memory-bound regime where SQ8 pays off
    * (4× less corpus to stream per scan). Approximate (quantization
    * noise can reorder close neighbors); top-1 recall vs the float
    * baseline is spec-asserted, so this registers rows-only. */
  def annInt8(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame =
    Ann.bruteForce(asQuantized(vectors), asQuantized(queries), k)

  /** The production composition of both approximations: IVF cell
    * pruning OVER the int8-quantized corpus — 4× less corpus streamed
    * AND only nprobe/nCells of it touched per query. Centroids, cell
    * assignment and scoring all run on the reconstructed int8 vectors,
    * exactly as a quantized index would (the float corpus never loads).
    * Errors compound (cell boundary flips + near-tie reordering), so
    * the contract is the spec'd top-1 recall vs the float brute-force
    * baseline; registers rows-only like [[annInt8]] and [[Ann.ivf]]. */
  def annInt8Ivf(vectors: DataFrame, queries: DataFrame, k: Int,
                 nCells: Int = 16, nprobe: Int = 4): DataFrame =
    Ann.ivf(asQuantized(vectors), asQuantized(queries), k, nCells, nprobe)

  /** Per-vector int8 quantization report. scale = amax/127 guarded
    * against all-zero vectors; q = floor(v/scale + 0.5) clamped to
    * [-127, 127] (explicit floor — engine-portable, where CAST rounds
    * in DuckDB but truncates in Spark). MSE comes from the dot-product
    * identity |v − s·q|² = v·v − 2s(q·v) + s²(q·q), evaluated with the
    * same sequential double folds on both engines. */
  def int8Report(vectors: DataFrame): DataFrame = {
    import VectorOps.dot
    val q = vectors
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("scale",
        greatest(expr("array_max(transform(v, x -> abs(x)))") / 127, lit(1e-12)))
      .withColumn("qv", expr(
        """transform(v, x ->
          |  greatest(least(cast(floor(x / scale + 0.5) as bigint), 127), -127))""".stripMargin))
      .withColumn("qd", expr("transform(qv, x -> cast(x as double))"))
    q.select(col("vec_id"), round(col("scale"), 6).as("scale"),
        expr("aggregate(qv, cast(0 as bigint), (a, x) -> a + x)").as("q_sum"),
        array_min(col("qv")).as("q_min"), array_max(col("qv")).as("q_max"),
        round((dot(col("v"), col("v"))
          - lit(2) * col("scale") * dot(col("qd"), col("v"))
          + col("scale") * col("scale") * dot(col("qd"), col("qd")))
          / size(col("v")) * lit(1000000), 4).as("mse_ppm"))
  }
}
