package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

/** End-to-end training-set curation — the composition a 100 TB corpus
  * actually runs, as ONE declarative plan: language gate → quality
  * gate → exact-dedup survivorship → near-dup cluster survivorship.
  * Emits a per-document audit row (not just the survivors) so the
  * decision for every document is inspectable — the form a curation
  * report takes when you need to answer "why was this page dropped".
  *
  * Scale shape: langid/quality are projections + one (doc_id, token)
  * shuffle; exact keepers shuffle a 128-bit digest; the near-dup arm
  * rides the capped inverted index + pointer-jumping components — every
  * stage is the already-verified operator, joined back on doc_id. No
  * stage funnels rows to the driver.
  */
object Curation {

  /** @param minQuality  keep threshold on the composite quality score
    * @param minTokens   floor on whitespace-token count
    * @param dupThreshold ngram-Jaccard near-dup threshold
    * @param precomputedClusters (doc_id, cluster) near-dup components to
    *   reuse — a pipeline that already resolved duplicate clusters (the
    *   `dedup_clusters` stage) feeds the same table here instead of
    *   re-running the pair join + propagation inside the audit. Without
    *   it, the returned plan embeds a freshly pinned cluster table
    *   (connectedComponents' eager checkpoint); a caller invoking
    *   curate() repeatedly in one JVM should pass precomputedClusters
    *   (as every registered path does) or release the finished result
    *   via Dedup.releaseLabels. */
  def curate(docs: DataFrame, minQuality: Double = 0.3, minTokens: Long = 10,
             dupThreshold: Double = 0.5,
             precomputedClusters: Option[DataFrame] = None): DataFrame = {
    val lang = TextOps.langId(docs).select("doc_id", "pred_lang")
    val qual = TextOps.quality(docs).select("doc_id", "n_tokens", "quality")
    // exact-dedup survivors: THE registered operator, not an inline
    // re-derivation of its digest formula — a digest change in
    // Dedup.exact must move this flag with it (one-copy discipline,
    // r12 review)
    val exactKeep = Dedup.exact(docs)
      .select(col("keeper").as("doc_id"), lit(true).as("_ek"))
    // near-dup clusters (transitive) over the capped ngram pair list
    val clusters = precomputedClusters.getOrElse {
      val pairs = Dedup.ngramJaccard(docs, dupThreshold, pruneUnique = false,
        maxDf = Some(8), minShared = 2)
      val cc = Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("lbl").as("cluster"))
      // connectedComponents consumed `pairs` EAGERLY (its edge table is
      // checkpointed and already released), so the pair plan — and the
      // shingle pin ngramJaccard built inline because no shared shingle
      // table was passed — never executes again: free it here rather
      // than leak one shingle table per curate() call
      org.apache.spark.sql.graftbridge.CheckpointBridge.free(pairs)
      cc
    }
    // qual LEFT-joined: TextOps.quality emits NO row for a zero-token
    // document (its stats come from exploded tokens), and an inner
    // join silently dropped such docs from the audit — violating the
    // every-document contract this report exists for (r12 review; a
    // "why was this page dropped" lookup found NOTHING). Zero-token
    // docs report n_tokens 0 / quality 0.0 and kept = false.
    docs.select("doc_id")
      .join(lang, "doc_id")
      .join(qual, Seq("doc_id"), "left")
      .join(exactKeep, Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("pred_lang"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("quality"), lit(0.0)).as("quality"),
        coalesce(col("_ek"), lit(false)).as("exact_keeper"),
        col("cluster"),
        (col("pred_lang") === "en" &&
          coalesce(col("quality"), lit(0.0)) >= minQuality &&
          coalesce(col("n_tokens"), lit(0L)) >= minTokens &&
          coalesce(col("_ek"), lit(false)) &&
          (col("cluster").isNull || col("cluster") === col("doc_id"))).as("kept"))
  }
}
