package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): the embedding splits into `m` subspaces,
  * each quantized independently against its own `ksub`-entry codebook,
  * so a D-float vector stores as m small codes — with m=8, ksub=16
  * that is 8 half-byte codes against 256 bytes of float32, a 64×
  * compression of the scanned corpus. Scoring is ADC (asymmetric
  * distance computation): the query stays float, each subspace
  * contributes `dot(q_sub, codebook[sub][code])`, and the approximate
  * inner product is the sum — a table lookup per subspace, never a
  * full float decode.
  *
  * Spark shape: the subspace Lloyd training runs over ONE exploded
  * (vec_id, sub, sv) relation — all m codebooks train in the same
  * shuffle per round (grouping key (sub, code)), not m sequential
  * jobs. The trained codebooks collapse to a single broadcast row
  * (m·ksub entries ≤ a few KB); encoding and ADC are pure projections
  * over it. Candidates come from the bounded-state [[TopK]] aggregate
  * at `4k` per query, then re-score on the FLOAT vectors (the
  * [[Quantize]] discipline: quantization picks candidates, floats
  * pick winners). Vectors are L2-normalized before slicing so the ADC
  * sum approximates cosine directly.
  *
  * Deterministic end to end: seed code = vec_id mod ksub, L2 argmin
  * ties break toward the smaller code, no RNG — same contract as
  * [[Ann.kmeans]]. Like the other quantized ANN arms this is
  * *rows-only* for the oracle gate (float centroid means have no
  * portable SQL form); recall vs the float baseline is spec-asserted.
  */
object Pq {

  /** (vec_id, sub, sv) exploded normalized subvectors. */
  private def subRows(vectors: DataFrame, m: Int, dsub: Int): DataFrame =
    vectors
      .withColumn("_n", VectorOps.norm(col("embedding")))
      .withColumn("_ne", expr("transform(embedding, x -> x / _n)"))
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice(_ne, s * $dsub + 1, $dsub))")))
      .toDF("vec_id", "sub", "sv")

  /** All m codebooks as ONE broadcast row: sorted array of
    * (sub, code, c_emb) structs. */
  private[sim] def codebooks(vectors: DataFrame, m: Int, dsub: Int,
                             ksub: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    // the kmeans iteration discipline (Ann.scala): WITHOUT pinning,
    // round N's plan nests round N-1's whole training subtree, so the
    // final evaluation replays the explode+aggregate chain once per
    // round per reference — measured 6.0 s at sf0.1 for a 16k-row
    // training relation. Pin the exploded rows once and each round's
    // 1-row books; free pins as they're superseded.
    val rows = subRows(vectors, m, dsub).localCheckpoint(true)
    var assigned = rows.withColumn("code", (col("vec_id") % ksub).cast("int"))
    var books: DataFrame = null
    for (_ <- 0 to iters) {
      val next = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")))
        .groupBy("sub", "code", "pos").agg(avg(col("col")).as("v"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("sub"), col("code"), expr("transform(pv, x -> x.v)").as("c_emb"))
        .agg(sort_array(collect_list(struct(col("sub"), col("code"), col("c_emb"))))
          .as("books"))
        .localCheckpoint(true)
      if (books != null) CheckpointBridge.free(books)
      books = next
      assigned = assignCodes(rows, broadcast(books))
    }
    // the trained codebooks are ONE row of a few KB: collapse to a
    // driver-local relation (the ivf convention — zero pins left
    // behind; callers can evaluate encode/ADC plans against it long
    // after this method's pins are gone)
    val spark = vectors.sparkSession
    val local = spark.createDataFrame(
      java.util.Arrays.asList(books.collect(): _*), books.schema)
    CheckpointBridge.free(books)
    CheckpointBridge.free(rows)
    local
  }

  /** Nearest-codebook-entry assignment: per row, min (L2², code) over
    * the row's own subspace — a projection over the broadcast books. */
  private def assignCodes(rows: DataFrame, books: DataFrame): DataFrame =
    rows.crossJoin(books)
      .withColumn("_best", array_min(expr(
        s"transform(filter(books, b -> b.sub = sub), b -> " +
          "struct(CAST(aggregate(zip_with(sv, b.c_emb, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x) AS DOUBLE) AS d2, b.code AS code))")))
      .select(col("vec_id"), col("sub"), col("sv"),
        col("_best.code").as("code"))

  /** PQ-ANN: encode the corpus, ADC-score queries against the codes,
    * take 4k candidates per query on the bounded heap, re-score float.
    * Output matches [[Ann.bruteForce]]: (q_id, nn_id, score, rank). */
  def pqSearch(vectors: DataFrame, queries: DataFrame, k: Int,
               m: Int = 8, ksub: Int = 16, trainIters: Int = 2): DataFrame = {
    val dim = vectors.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val books = codebooks(vectors, m, dsub, ksub, trainIters)
    // corpus → m codes per vector, re-packed to one row per vector
    val codes = assignCodes(subRows(vectors, m, dsub), books)
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(col("vec_id").as("nn_id"),
        expr("transform(sc, x -> x.code)").as("codes"))
    // per-query ADC tables: dot(q_sub, centroid) for every (sub, code)
    val qrows = queries
      .withColumn("_qn", VectorOps.norm(col("embedding")))
      .withColumn("_qe", expr("transform(embedding, x -> x / _qn)"))
      .select(col("vec_id").as("q_id"), col("_qe"))
      .crossJoin(books)
      .withColumn("_sparse", expr(
        s"""transform(books, b -> struct(b.sub AS sub, b.code AS code,
           |  CAST(aggregate(zip_with(slice(_qe, b.sub * $dsub + 1, $dsub),
           |    b.c_emb, (x, y) -> x * y),
           |    CAST(0 AS DOUBLE), (a, x) -> a + x) AS DOUBLE) AS ip))"""
          .stripMargin))
      // a Lloyd code that attracted no members drops out of the
      // codebook groupBy, so (sub, code) is NOT a dense grid —
      // scatter into a dense m·ksub table once per query (get()
      // tolerates the gap, and no corpus code ever references one:
      // assignment only ever picks existing entries)
      .withColumn("_tab", expr(
        s"""transform(sequence(0, ${m * ksub - 1}), i ->
           |  coalesce(get(filter(_sparse, e ->
           |    e.sub = i div $ksub AND e.code = i % $ksub), 0).ip,
           |    CAST(0 AS DOUBLE)))""".stripMargin))
      .select(col("q_id"), col("_tab"))
    // ADC score: the codes index the query's DENSE table at 0-based
    // subscript sub * ksub + code — positional lookup, no per-element
    // scan in the corpus-sized loop
    val scored = codes.crossJoin(broadcast(qrows))
      .where(col("nn_id") =!= col("q_id"))
      .withColumn("_adc", expr(
        s"""aggregate(transform(sequence(0, ${m - 1}), s ->
           |  _tab[CAST(s * $ksub + codes[CAST(s AS INT)] AS INT)]),
           |  CAST(0 AS DOUBLE), (a, x) -> a + x)""".stripMargin))
      .withColumn("_score", col("_adc"))
    // rerank width: 4k but never under 32 — ADC ordering is coarse
    // (m·ksub quantization cells), so a thin candidate list starves
    // the float re-score; 32 is the standard faiss-style floor
    val cand = Ann.topK(scored.select(col("q_id"), col("nn_id"), col("_score")),
        "q_id", math.max(32, 4 * k))
      .select(col("q_id"), col("nn_id"))
    // float re-score of the candidate slice only; cand is
    // queries × max(32, 4k) rows but comes out of an aggregate, so
    // Catalyst's size estimate is corpus-derived — broadcast it
    // explicitly or the plan shuffles the whole float corpus by nn_id
    // (the exact cost Quantize.annInt8Ivf's broadcast semi-join avoids)
    val v = vectors.select(col("vec_id").as("nn_id"), col("embedding"))
      .withColumn("_vn", VectorOps.norm(col("embedding")))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("_qn", VectorOps.norm(col("q_emb")))
    val exact = v.join(broadcast(cand), "nn_id").join(broadcast(q), "q_id")
      .withColumn("_score",
        VectorOps.dot(col("q_emb"), col("embedding")) / (col("_qn") * col("_vn")))
    Ann.topK(exact.select(col("q_id"), col("nn_id"), col("_score")), "q_id", k)
      .select(col("q_id"), col("nn_id"),
        round(col("_score"), 4).as("score"), col("rank"))
  }
}
