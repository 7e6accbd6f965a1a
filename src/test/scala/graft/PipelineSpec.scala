package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup
import graft.sim.Ann
import graft.text.TextOps

class PipelineSpec extends SparkSpec {

  private def docs: DataFrame = Tables.load(spark, sfDir, "documents")
  private def emb: DataFrame = Tables.load(spark, sfDir, "embeddings")

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("dedup candidate generation is bucket-join shaped: no cartesian product") {
    for (df <- Seq(
        Dedup.ngramJaccard(docs, 0.5),
        Dedup.minhashLsh(docs, 0.5),
        Dedup.simhash(docs))) {
      val plan = physicalPlan(df)
      assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$plan")
    }
  }

  test("ann_ivf candidate join is equi-join shaped: no cartesian product") {
    val q = emb.where(col("vec_id") < 10)
    val plan = physicalPlan(Ann.ivf(emb, q, 5))
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    // the only nested-loop joins allowed are the intended tiny-broadcast
    // centroid scorings; the corpus-side candidate join must be an
    // equi-join on the probed cell
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), s"no equi-join on cell in:\n$plan")
  }

  test("minhash LSH finds the exact-jaccard pairs on planted near-dups") {
    val exact = Dedup.ngramJaccard(docs, 0.5).select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, 0.5).select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH verify stage must not emit sub-threshold pairs")
    assert(exact.nonEmpty && lsh.size >= exact.size * 9 / 10,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("ann_ivf agrees with brute force on most top-1 neighbors") {
    val q = emb.where(col("vec_id") < 10)
    val bf = Ann.bruteForce(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Ann.ivf(emb, q, 1).select("q_id", "nn_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = bf.count { case (k, v) => ivf.get(k).contains(v) }
    // nprobe=4 of 16 cells: recall can miss some, but must find most
    assert(agree >= 5, s"IVF top-1 recall $agree/10 vs brute force")
  }

  test("exact dedup collapses duplicate texts") {
    import spark.implicits._
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(d).orderBy("keeper").as[(Long, Long)].collect()
    assert(got.sameElements(Array((1L, 2L), (3L, 1L))))
  }

  test("text fingerprint matches the reference mod-fold") {
    import spark.implicits._
    val d = Seq((1L, "abc")).toDF("doc_id", "text")
    val fp = TextOps.fingerprint(d).select("fp").as[Long].head()
    // ((0*31+97)*31+98)*31+99 mod 1e9+7
    assert(fp == 96354L)
  }

  test("simhash of identical docs is identical; near-dup pairs have small hamming") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "x y z w q r s t"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhash(d, maxHamming = 0).as[(Long, Long, Int)].collect()
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._3 > 0))
  }
}
