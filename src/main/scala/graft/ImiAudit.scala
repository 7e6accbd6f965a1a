package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-volume + wall audit of the two IVF routing structures at
  * corpus sizes where the flat quantizer's 4096-cell cap BINDS
  * (√N > 4096 ⇔ N ≳ 16.8M) — the r13 verdict's one measured scale
  * frontier (dedup_embedding_ivf at ~N^1.07 against the 10× bar).
  *
  * The corpus is synthesized IN-PLAN (spark.range → hash-derived
  * floats in [-1, 1], deterministic, no RNG, no disk): this is a
  * ROUTING audit, not a correctness gate — what's measured is how
  * many scored pairs each index admits for the same 10 queries and
  * what the end-to-end search costs, at an N no driver-generated
  * table reaches. Generation costs N·d integer hashes per pass —
  * noise against the N·nCells·d assignment arithmetic under audit.
  *
  * Reads (written to stdout as one JSON line):
  *  - flat.cells = min(4096, ⌈√N⌉): capped past 16.8M, so its
  *    admitted candidates/query grow like nprobe·N/4096 — LINEAR in N
  *    — and its assignment costs N·4096·d madds.
  *  - imi.k_half = ⌈N^¼⌉ per half (cap 4096 binds past ~2.8e14):
  *    K² ≈ √N effective cells keep candidates/query ~nprobe·√N and
  *    assignment at N·K·d.
  *  Crossover at the registered operating points (flat nprobe=4, IMI
  *  nprobe=8 pairs): IMI admits fewer candidates once K² > 2·4096
  *  (N ≳ 6.9e7) and does ~4096/K ≈ 60× less assignment arithmetic
  *  already at 2e7.
  *
  * Usage: runMain graft.ImiAudit <N> [dim] [arms]
  *   arms: "both" (default) | "imi" (skip the flat arm — at N ≥ 5e7
  *   its N·4096·d assignment is the multi-ten-minute cost this audit
  *   exists to document, not to keep re-paying).
  */
object ImiAudit {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val dim = if (args.length > 1) args(1).toInt else 64
    val arms = if (args.length > 2) args(2) else "both"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic corpus: element (id, i) = a hash folded
    // to [-1, 1]; float-typed like the real embedding column
    val vectors = spark.range(n).toDF("vec_id")
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), " +
          "i -> CAST((pmod(xxhash64(vec_id, i), 2000001) - 1000000) / 1e6 AS FLOAT))"))
    val queries = vectors.where(col("vec_id") < 10)

    def timedCount(mk: => DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = mk.count()
      (c, (System.nanoTime() - t0) / 1e9)
    }
    val flatCells = math.min(4096,
      math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
    val kHalf = math.min(4096,
      math.max(4, math.ceil(math.sqrt(math.sqrt(n.toDouble))).toInt))

    // trainIters = 1 on both arms: the trained operating point (the
    // registered queries run 2) at half the audit's assignment passes;
    // candidate volume is routing-structural, not iteration-sensitive
    val (imiCand, imiSec) = timedCount(
      graft.sim.Ann.ivfImiScored(vectors, queries, trainIters = 1))
    val (flatCand, flatSec) =
      if (arms == "imi") (-1L, -1.0)
      else timedCount(
        graft.sim.Ann.ivfScored(vectors, queries, trainIters = 1))

    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    println(
      s"""{"n":$n,"dim":$dim,"queries":10,""" +
        s""""flat":{"cells":$flatCells,"nprobe":4,"cand":$flatCand,"sec":${num(flatSec)}},""" +
        s""""imi":{"k_half":$kHalf,"eff_cells":${kHalf.toLong * kHalf},"nprobe_pairs":8,""" +
        s""""cand":$imiCand,"sec":${num(imiSec)}}}""")
    spark.stop()
  }
}
