package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding column — the whitening /
  * dimensionality-reduction stage SemDeDup-style semantic pipelines
  * run before clustering (Abbas et al. 2023 reduce embeddings before
  * the k-means pass; classic Halko et al. 2011 motivates the
  * covariance route for short, fat matrices).
  *
  * The 100 TB shape is the textbook one: the d×d covariance is the
  * ONLY thing that ever crosses the wire — an upper-triangle Gramian
  * of d(d+1)/2 cells plus d means, computed in one map-side-combinable
  * aggregate pass over the corpus (no row leaves its executor
  * un-summed), then eigensolved on the DRIVER (d = 64 here; a 64×64
  * symmetric Jacobi sweep is microseconds — the same driver-local
  * trained-model pattern as k-means centroids and PQ codebooks,
  * sim/Ann.scala). N never appears in anything but the two aggregate
  * passes fused into one.
  */
object Pca {

  /** Cyclic Jacobi eigensolver for a symmetric matrix (in-place on a
    * copy); returns eigenvalues sorted descending. Deterministic sweep
    * order; converges quadratically — 64×64 finishes in a handful of
    * sweeps. */
  private[graft] def jacobiEigenvalues(a0: Array[Array[Double]]): Array[Double] = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 50 && off > 1e-12) {
      off = 0.0
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // sign(0) must be +1 here: a zero theta is the 45-degree
          // rotation, not "skip" (math.signum(0) = 0 would stall on
          // equal diagonal entries)
          val sgn = if (theta >= 0.0) 1.0 else -1.0
          val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
        }
      }
      sweep += 1
    }
    (0 until d).map(i => a(i)(i)).toArray.sorted(Ordering[Double].reverse)
  }

  /** The upper-triangle (i, vi, j >= i, vj) pair stream every Gramian
    * consumer aggregates — ONE copy of the shuffle-bearing shape
    * shared by [[spectrum]] (double sums, driver eigensolve) and
    * [[gramExact]] (integer milli-unit sums, the hash-gated oracle
    * leg). Per-row fanout is d(d+1)/2, combined map-side to a
    * 2080-cell partial per partition before the shuffle. The second
    * explode runs over slice(e, i+1, d−i) — generating the triangle
    * DIRECTLY: a full d×d posexplode followed by a j >= i filter
    * materializes 2× the rows first, because Catalyst cannot push a
    * filter inside a Generate (at d=64 that is 4096 vs 2080 generated
    * rows per corpus vector on the one full-corpus pass).
    * @param x one column `e` array<double>. */
  private[graft] def trianglePairs(x: DataFrame): DataFrame =
    x.select(col("e"), posexplode(col("e")).as(Seq("i", "vi")))
      .select(col("i"), col("vi"),
        posexplode(expr("slice(e, i + 1, size(e) - i)")).as(Seq("dj", "vj")))
      .select(col("i"), col("vi"), (col("i") + col("dj")).as("j"), col("vj"))

  /** EXACT integer Gramian audit — the distributed half of
    * [[spectrum]] as a full-oracle query (r13 verdict item 6): per
    * upper-triangle cell (i, j), milli-unit second moments
    * Σ floor(vi·10³)·floor(vj·10³), i-side first moments Σ floor(vi·10³)
    * and the member count, all order-independent BIGINT sums — bit-
    * identical cross-engine, so the shuffle-bearing shape
    * ([[trianglePairs]] + the (i, j) aggregate, the ONLY thing in PCA
    * that touches data scale) is hash-gated; the 64×64 driver-side
    * Jacobi eigensolve stays spec-covered. Milli (not micro) units:
    * the guarded product headroom n·(10³·|e|)² must hold 10⁹-row
    * corpora — at micro units a |e| ≤ 2 corpus would trip the guard
    * near 5e8 rows. [[spectrum]] itself keeps full double precision
    * (its sums never cross an engine boundary).
    *
    * Overflow is guarded EXACTLY like [[Ann.cellMeans]]: worst-case
    * n·max|xi|·max|xj| tested in double (cannot wrap) and the
    * raise_error rides the value column consumers read. */
  def gramExact(emb: DataFrame): DataFrame = {
    val x = emb.where(VectorOps.allFinite(col("embedding")))
      .select(col("embedding").cast("array<double>").as("e"))
    trianglePairs(x)
      .select(col("i"), col("j"),
        floor(col("vi") * 1000).cast("long").as("xi"),
        floor(col("vj") * 1000).cast("long").as("xj"))
      .groupBy("i", "j")
      .agg(sum(col("xi") * col("xj")).as("s2"),
        sum(col("xi")).as("sm"), count(lit(1)).as("n"),
        max(abs(col("xi"))).as("_bi"), max(abs(col("xj"))).as("_bj"))
      .select(col("i"), col("j"),
        when(col("n").cast("double") * col("_bi").cast("double") *
            col("_bj").cast("double") > lit(math.pow(2, 62)),
          raise_error(lit("gramExact: worst-case milli-unit product sum " +
            "near int64 range — rescale the units or shard the corpus")))
          .otherwise(col("s2")).as("gram_milli2"),
        // the first moment needs its OWN guard riding ITS column (r14
        // advice): the s2 guard's product is 0 whenever a j-dimension
        // is all zeros (_bj = 0), yet Σxi can still wrap at extreme
        // n·|e| — n·_bi in double cannot wrap, same discipline
        when(col("n").cast("double") * col("_bi").cast("double")
            > lit(math.pow(2, 62)),
          raise_error(lit("gramExact: worst-case milli-unit first-moment " +
            "sum near int64 range — rescale the units or shard the corpus")))
          .otherwise(col("sm")).as("sum_i_milli"), col("n"))
  }

  /** Top-k principal spectrum of the embedding covariance:
    * (component, eigenvalue_micro, evr_ppm, cum_evr_ppm) — explained
    * variance ratios against the full trace, the table that decides
    * how many dimensions survive the reduction.
    *
    * @param emb (vec_id, embedding array<float>). */
  def spectrum(spark: SparkSession, emb: DataFrame, k: Int = 8): DataFrame = {
    // non-finite vectors excluded at intake (the r12 allFinite
    // discipline every sibling surface carries; r13 review closed this
    // last holdout): one Inf element overflows the gram sums so trace
    // = Inf PASSES the trace guard and the spectrum rows are silent
    // garbage (eigenvalue_micro = Long.MaxValue, evr_ppm = 0); one NaN
    // aborts blaming a "collapsed encoder" that doesn't exist.
    // embedding_stats is the audit that finds the bad vectors upstream.
    val x = emb.where(VectorOps.allFinite(col("embedding")))
      .select(col("embedding").cast("array<double>").as("e"))
    val pairs = trianglePairs(x)
    // diagonal groups (i == j) carry sum(vi) and the row count
    // alongside their gram cell, so the means come out of the SAME
    // aggregate — one corpus scan total, not a second moments pass
    val cells = pairs.groupBy("i", "j")
      .agg(sum(col("vi") * col("vj")).as("s"),
        sum(col("vi")).as("m"), count(lit(1)).as("cnt"))
      .collect()
    val diag = cells.filter(r => r.getAs[Int]("i") == r.getAs[Int]("j"))
    require(diag.nonEmpty,
      "pca spectrum: empty corpus or empty embedding arrays — nothing to decompose")
    val d = diag.length
    val n = diag.head.getAs[Long]("cnt").toDouble
    val mean = Array.ofDim[Double](d)
    diag.foreach(r => mean(r.getAs[Int]("i")) = r.getAs[Double]("m") / n)
    val cov = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val c = r.getAs[Double]("s") / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val ev = jacobiEigenvalues(cov)
    val trace = ev.sum
    // a zero trace means ZERO variance in every dimension (constant or
    // all-identical embeddings — the collapsed-encoder case this audit
    // exists to catch): lam/trace would be NaN and floor(NaN).toLong
    // reports k rows of silent zeros instead of the loud failure
    require(trace > 0.0,
      "pca spectrum: covariance trace is zero — every embedding is " +
        "identical/constant (collapsed encoder); nothing to decompose")
    import spark.implicits._
    val rows = ev.take(k).zipWithIndex.scanLeft((0L, 0L, 0L, 0.0)) {
      case ((_, _, cum, _), (lam, i)) =>
        val evr = math.floor(lam * 1e6 / trace).toLong
        (i.toLong, math.floor(lam * 1e6).toLong, cum + evr, lam)
    }.drop(1).map { case (i, lamMicro, cumEvr, lam) =>
      (i, lamMicro, math.floor(lam * 1e6 / trace).toLong, cumEvr)
    }
    rows.toSeq.toDF("component", "eigenvalue_micro", "evr_ppm", "cum_evr_ppm")
  }
}
