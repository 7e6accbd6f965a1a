package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup
import graft.sim.Ann
import graft.text.TextOps
import graft.multimodal.MM

/** SURVEY §2G–J — the LLM-training-data pipeline operators as verified
  * queries over `documents` / `embeddings`.
  *
  * Oracle policy: full DuckDB oracles wherever the computation is
  * engine-portable (exact dedup, n-gram Jaccard, all text ops, mm_meta,
  * brute-force ANN and the nearest-neighbor dedup report — vector math
  * is a sequential double fold in both engines, bit-identical).
  * MinHash-LSH / SimHash / IVF depend on xxhash64 and float averaging
  * with no DuckDB equivalent → rows-only (driver records the weaker
  * check), with specs asserting their candidate-join plans instead.
  */
object PipelineQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")
  private def emb(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2G dedup ----
    "dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d)).orderBy("keeper")),
    // pruneUnique=false: this corpus shares a ~30-word vocabulary, so
    // df=1 shingles are 0.08% — the pruning passes cost more than the
    // join they would shrink (flip on for natural corpora)
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(docs(s, d), 0.5, pruneUnique = false).orderBy("i", "j")),
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(docs(s, d), 0.5).orderBy("i", "j")),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(docs(s, d)).orderBy("i", "j")),
    "dedup_embedding" -> ((s, d) =>
      Ann.nearestNeighborReport(emb(s, d), 0.45).orderBy("vec_id")),
    // ---- §2H similarity ----
    "ann_bruteforce" -> ((s, d) =>
      Ann.bruteForce(emb(s, d), emb(s, d).where(col("vec_id") < 10), 5)
        .orderBy("q_id", "rank")),
    "ann_ivf" -> ((s, d) =>
      Ann.ivf(emb(s, d), emb(s, d).where(col("vec_id") < 10), 5)
        .orderBy("q_id", "rank")),
    // ---- §2I text ----
    "text_langid" -> ((s, d) => TextOps.langId(docs(s, d)).orderBy("doc_id")),
    "text_quality" -> ((s, d) => TextOps.quality(docs(s, d)).orderBy("doc_id")),
    "text_tokens" -> ((s, d) => TextOps.tokens(docs(s, d)).orderBy("doc_id")),
    "text_fingerprint" -> ((s, d) => TextOps.fingerprint(docs(s, d)).orderBy("doc_id")),
    // ---- §2J multimodal ----
    "mm_meta" -> ((s, d) => MM.meta(docs(s, d)).orderBy("doc_id")),
  )

  /** Shared DuckDB vector helpers (double-precision sequential folds —
    * identical to the Spark expressions). */
  private def ddCos(a: String, b: String): String =
    s"""(list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))
       | / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))
       |    * sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))))""".stripMargin

  private val markerIn = TextOps.EnMarkers.map(w => s"'$w'").mkString(", ")

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keeper, count(*) AS n_copies FROM documents
        |GROUP BY md5(text) ORDER BY keeper""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |                        for i in range(1, len(ts) - 1)]) AS shs
        |       FROM tok WHERE len(ts) >= 3),
        |ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
        |pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
        |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(shs) AS n FROM sh)
        |SELECT i, j, jaccard FROM (
        |  SELECT i, j, round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
        |  FROM pairs p JOIN sizes sa ON p.i = sa.doc_id JOIN sizes sb ON p.j = sb.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY i, j""".stripMargin,
    "dedup_embedding" ->
      (s"""WITH scored AS (
          |  SELECT a.vec_id, b.vec_id AS nn_id, ${ddCos("a.embedding", "b.embedding")} AS sc
          |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
          |top AS (SELECT vec_id, nn_id, sc,
          |          row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, nn_id) AS rn
          |        FROM scored)
          |SELECT vec_id, nn_id, round(sc, 4) AS cos, round(sc, 4) >= 0.45 AS is_dup
          |FROM top WHERE rn = 1 ORDER BY vec_id""".stripMargin),
    "ann_bruteforce" ->
      (s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
          |scored AS (
          |  SELECT q.q_id, e.vec_id AS nn_id, ${ddCos("q.q_emb", "e.embedding")} AS sc
          |  FROM q, embeddings e WHERE e.vec_id <> q.q_id),
          |top AS (SELECT q_id, nn_id, sc,
          |          row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, nn_id) AS rank
          |        FROM scored)
          |SELECT q_id, nn_id, round(sc, 4) AS score, rank FROM top
          |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),
    "text_langid" ->
      s"""SELECT doc_id,
         |       round(len(list_filter(string_split(text, ' '), x -> x IN ($markerIn)))
         |             * 1.0 / len(string_split(text, ' ')), 4) AS en_ratio,
         |       CASE WHEN round(len(list_filter(string_split(text, ' '), x -> x IN ($markerIn)))
         |                  * 1.0 / len(string_split(text, ' ')), 4) >= 0.05
         |            THEN 'en' ELSE 'other' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      (s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |freqs AS (SELECT doc_id, t, count(*) AS cnt FROM tok GROUP BY 1, 2),
         |st AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, count(*) AS n_distinct, max(cnt) AS max_freq,
         |              CAST(sum(CASE WHEN t IN ($markerIn) THEN cnt ELSE 0 END) AS BIGINT) AS n_stop
         |       FROM freqs GROUP BY doc_id),
         |pd AS (SELECT doc_id,
         |              len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1.0 / length(text) AS punct_ratio
         |       FROM documents)
         |SELECT st.doc_id, n_tokens,
         |       round(n_distinct * 1.0 / n_tokens, 4) AS distinct_ratio,
         |       round(max_freq * 1.0 / n_tokens, 4) AS repetition,
         |       round(n_stop * 1.0 / n_tokens, 4) AS stopword_ratio,
         |       round(punct_ratio, 4) AS punct_ratio,
         |       round(least(n_tokens / 100.0, 1.0) * (n_distinct * 1.0 / n_tokens), 4) AS quality
         |FROM st JOIN pd ON st.doc_id = pd.doc_id ORDER BY st.doc_id""".stripMargin),
    "text_tokens" ->
      """SELECT doc_id, length(text) AS n_chars,
        |       len(string_split(text, ' ')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
        |       round(length(text) * 1.0 / len(string_split(text, ' ')), 4) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |                   (h, c) -> (h * 31 + c) % 1000000007) AS fp,
        |       list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split(substring(text, 1, 64), ''), c -> CAST(ascii(c) AS BIGINT)),
        |                   (h, c) -> (h * 31 + c) % 1000000007) AS prefix_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id,
        |       octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       CASE WHEN doc_id % 3 = 0 THEN 'jpeg' WHEN doc_id % 3 = 1 THEN 'png'
        |            ELSE 'wav' END AS format,
        |       64 + doc_id % 512 AS width,
        |       64 + (doc_id * 7) % 512 AS height,
        |       CASE WHEN doc_id % 3 = 2 THEN 16000 ELSE NULL END AS sample_rate,
        |       octet_length(CAST(text AS BLOB)) > 0 AS decode_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // dedup_minhash_lsh, dedup_simhash, ann_ivf: rows-only (xxhash64 /
    // float-mean centroids have no portable SQL form) — no entries here.
  )
}
