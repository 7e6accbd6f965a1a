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
  * [[Ann.kmeans]]. Since r9 training means are integer micro-unit
  * exact, so the whole search replays bit-identically in the DuckDB
  * oracle (full-oracle gate); recall vs the float baseline stays
  * spec-asserted as the semantic contract.
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
    * (sub, code, c_emb) structs.
    *
    * Trains on a deterministic hash-sample capped near `maxTrain`
    * vectors: with m·ksub cells, a few tens of thousands of training
    * vectors saturate centroid quality (Jégou et al. §V train
    * billion-scale codebooks from ~100k samples) — folding a 100 TB
    * corpus through every Lloyd round would buy nothing. Encoding
    * still covers every vector; the sample is hash-spread (not a
    * prefix), so id-correlated content can't bias the cells. */
  private[sim] def codebooks(vectors: DataFrame, m: Int, dsub: Int,
                             ksub: Int, iters: Int,
                             maxTrain: Int = 16384): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    val spark = vectors.sparkSession
    val n = vectors.count()
    val rate = math.max(1L, n / maxTrain) // keeps ~maxTrain expected rows
    val train = if (rate == 1L) vectors
      else vectors.where(pmod(xxhash64(col("vec_id")), lit(rate)) === 0)
    // the kmeans iteration discipline (Ann.scala): WITHOUT pinning,
    // round N's plan nests round N-1's whole training subtree, so the
    // final evaluation replays the explode+aggregate chain once per
    // round per reference — measured 6.0 s at sf0.1 for a 16k-row
    // training relation. Pin the exploded rows once; each round's
    // 1-row books collapses to a DRIVER-LOCAL relation immediately
    // (m·ksub entries, a few KB — the trained-model collect pattern),
    // which saves a persist job plus a broadcast-exchange build per
    // round vs checkpointing it, leaves zero pins behind, and hands
    // callers a relation they can keep evaluating encode/ADC plans
    // against after this method's pins are gone.
    // the training relation is SAMPLE-BOUNDED (≤ maxTrain·m sub rows
    // no matter the corpus), so full shuffle-partition fanout only
    // pays per-task scheduling across every Lloyd round — 8 partitions
    // hold ~16k vectors comfortably and stay scale-safe by construction
    val rows = subRows(train, m, dsub).repartition(8).localCheckpoint(true)
    // pmod, not %: a NEGATIVE vec_id would seed a negative code that
    // propagates through every Lloyd round into the books, where the
    // dense ADC table's (0 until m*ksub) key range silently drops it —
    // those vectors then score NULL with no error
    var assigned = rows.withColumn("code",
      pmod(col("vec_id"), lit(ksub.toLong)).cast("int"))
    var books: DataFrame = null
    // books schema: one row, one `books` column of (sub, code, c_emb)
    // structs — the shape assignCodes / the ADC tables filter on
    val bookSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "books array<struct<sub:int,code:int,c_emb:array<double>>>")
    try {
      for (r <- 0 to iters) {
        // re-assign against the previous round's books at the TOP of
        // the round (round 0 keeps the vec_id-mod seed) — assigning at
        // the bottom built one final dead assignment plan whose result
        // nothing read (callers re-encode via assignCodes themselves)
        if (r > 0) assigned = assignCodes(rows, books)
        // ONE shuffle per round: the (sub, code, pos) cell means — at
        // most m·ksub·dsub rows (1024 for the registered shape) — then
        // the books row assembles DRIVER-side; the former
        // groupBy-into-array + single-row collect_list pipeline paid
        // two more exchanges per round for what is a metadata reshape
        // EXACT integer micro-unit cell means scaled back to natural
        // units (the Ann.cellMeans discipline — float avg partial-sum
        // order differs across partitions/engines; /1e6 is one
        // deterministic IEEE division, identical everywhere). PQ
        // assignment is L2 — scale matters, unlike Lloyd's cosine —
        // hence the scale-back where cellMeans keeps raw micro.
        // Makes the whole training bit-identical cross-engine → the
        // full-oracle contract.
        val cells = assigned
          .select(col("sub"), col("code"), posexplode(col("sv")))
          .select(col("sub"), col("code"), col("pos"),
            floor(col("col") * 1e6).cast("long").as("xm"))
          .groupBy("sub", "code", "pos")
          .agg(sum("xm").as("sm"), count(lit(1)).as("n"))
          .select(col("sub"), col("code"), col("pos"),
            (expr("(sm - pmod(sm, n)) div n").cast("double") / 1e6).as("v"))
          .collect()
        val entries = cells.groupBy(c => (c.getInt(0), c.getInt(1))).toSeq
          .sortBy(_._1)
          .map { case ((sub, code), rs) =>
            org.apache.spark.sql.Row(sub, code,
              rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
          }
        books = spark.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(entries)), bookSchema)
      }
    } finally CheckpointBridge.free(rows)
    books
  }

  /** The trained books as a driver literal: sub → (code, centroid)
    * entries, code-ascending. A few KB (m·ksub·dsub doubles) — it
    * constant-folds into codegen, so assignment and ADC tables are
    * pure projections with a DIRECT per-subspace lookup instead of a
    * crossJoin + 128-entry filter scan per row (the r8 plan paid a
    * broadcast build and a nested-loop stage per training round). */
  private def bookLit(books: DataFrame): Column = {
    import org.apache.spark.sql.Row
    val entries = books.collect().head.getSeq[Row](0)
      .map(b => (b.getInt(0), (b.getInt(1), b.getSeq[Double](2))))
      .groupBy(_._1).map { case (sub, es) =>
        (sub, es.map(_._2).sortBy(_._1)) }
    typedLit(entries)
  }

  /** Nearest-codebook-entry assignment: per row, min (L2², code) over
    * the row's own subspace — a literal-lookup projection. The
    * distance is the native [[VecL2Sq]] loop: this runs corpus×ksub
    * times per encode (the PQ hot path), where the HOF
    * aggregate(zip_with(...)) form allocates an intermediate array
    * per comparison; VecL2Sq folds the identical terms in the
    * identical order, so code assignments — and with them the Lloyd
    * training trajectory the full oracle replays — are bit-unchanged. */
  private def assignCodes(rows: DataFrame, books: DataFrame): DataFrame = {
    val m = bookLit(books)
    rows.withColumn("_best", array_min(transform(
        element_at(m, col("sub")),
        b => struct(
          VectorOps.l2sq(col("sv"), b.getField("_2")).as("d2"),
          b.getField("_1").as("code")))))
      .select(col("vec_id"), col("sub"), col("sv"),
        col("_best.code").as("code"))
  }

  /** PQ-ANN: encode the corpus, ADC-score queries against the codes,
    * take 4k candidates per query on the bounded heap, re-score float.
    * Output matches [[Ann.bruteForce]]: (q_id, nn_id, score, rank). */
  def pqSearch(vectors0: DataFrame, queries0: DataFrame, k: Int,
               m: Int = 8, ksub: Int = 16, trainIters: Int = 2): DataFrame = {
    // non-finite vectors excluded on both sides (the Ann.scoredPairs
    // discipline, r12 sim review): a NaN element ANSI-errors the
    // codebook training's micro-unit casts and, past training, would
    // rank first in every ADC heap. dimStats finds them upstream.
    val vectors = vectors0.where(VectorOps.allFinite(col("embedding")))
    val queries = queries0.where(VectorOps.allFinite(col("embedding")))
    // loud, NAMED failure when the finite corpus is empty (a fully
    // corrupt encoder batch) — the bare head() threw an opaque
    // next-on-empty-iterator from the driver (r12 review)
    val dimRow = vectors.select(size(col("embedding"))).limit(1).collect()
    require(dimRow.nonEmpty, "pqSearch: no finite vectors to index — " +
      "every corpus embedding is NaN/Inf or the corpus is empty; " +
      "run embedding_stats (n_nonfinite) on the upstream table")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val books = codebooks(vectors, m, dsub, ksub, trainIters)
    // corpus → m codes per vector, re-packed to one row per vector
    val codes = assignCodes(subRows(vectors, m, dsub), books)
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(col("vec_id").as("nn_id"),
        expr("transform(sc, x -> x.code)").as("codes"))
    // per-query ADC tables: dot(q_sub, centroid) for every (sub, code).
    // The centroids land as a DENSE driver literal indexed sub·ksub +
    // code (a Lloyd code that attracted no members holds an empty
    // array → 0.0 — no corpus code ever references one: assignment
    // only picks existing entries), so the table is a single indexed
    // transform — no codebook crossJoin, no sparse scatter scan
    val denseCentroids = {
      val es = books.collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(b => (b.getInt(0) * ksub + b.getInt(1), b.getSeq[Double](2))).toMap
      typedLit((0 until m * ksub).map(i => es.getOrElse(i, Seq.empty[Double])))
    }
    val qrows = queries
      .withColumn("_qn", VectorOps.norm(col("embedding")))
      .withColumn("_qe", expr("transform(embedding, x -> x / _qn)"))
      .select(col("vec_id").as("q_id"), col("_qe"))
      .withColumn("_tab", transform(denseCentroids, (cemb, i) =>
        when(size(cemb) === 0, lit(0.0)).otherwise(
          aggregate(
            zip_with(
              slice(col("_qe"), (i / lit(ksub)).cast("int") * dsub + 1, lit(dsub)),
              cemb, (x, y) => x * y),
            lit(0.0), (a, x) => a + x).cast("double"))))
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
    // rerank width: the ONE shared candidates-then-verify floor
    // (Ann.rerankWidth — rationale there)
    val cand = Ann.topK(scored.select(col("q_id"), col("nn_id"), col("_score")),
        "q_id", Ann.rerankWidth(k))
      .select(col("q_id"), col("nn_id"))
    // float re-score of the candidate slice only — the ONE shared
    // refine scaffold (Ann.refineExact; broadcast rationale there)
    Ann.refineExact(cand, vectors, queries, k)
  }
}
