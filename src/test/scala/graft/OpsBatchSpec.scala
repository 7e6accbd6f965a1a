package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.analytics.Tools
import graft.text.TextOps

/** Behavior specs for the round-7 continuation batch: stochastic
  * balancer costs, BufferedMutator flush segmentation, delimited split
  * points, slow-request log, Gopher rules, bigram perplexity,
  * preference pairs and the mixture report. */
class OpsBatchSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // ---- stochasticCost -------------------------------------------------

  private def clusterDF(rows: Seq[(Long, Long, Long, Long, Long, Long, Long)]) =
    rows.toDF("bucket", "server", "init_server", "storefile", "read_req",
      "write_req", "locality_ppm")

  test("stochasticCost: a perfectly balanced cluster costs zero on every skew function") {
    // 2 servers, 2 identical regions each, no moves, full locality
    val df = clusterDF(Seq(
      (0L, 0L, 0L, 100L, 10L, 5L, 1000000L),
      (1L, 1L, 1L, 100L, 10L, 5L, 1000000L),
      (2L, 0L, 0L, 100L, 10L, 5L, 1000000L),
      (3L, 1L, 1L, 100L, 10L, 5L, 1000000L)))
    val out = Tools.stochasticCost(df, 2).collect()
      .map(r => r.getAs[String]("cost_function") -> r.getAs[Long]("cost_ppm")).toMap
    assert(out.size == 6)
    assert(out.values.forall(_ == 0L), out.toString)
  }

  test("stochasticCost: everything on one server is the 10^6 ceiling, absent servers counted") {
    // 4 regions all on server 0 of a 2-server cluster: worst case for
    // every skew function (server 1 never appears in the input — its
    // zero stat must still enter the cost array)
    val df = clusterDF(Seq(
      (0L, 0L, 0L, 100L, 10L, 5L, 1000000L),
      (1L, 0L, 1L, 100L, 10L, 5L, 1000000L),
      (2L, 0L, 0L, 100L, 10L, 5L, 1000000L),
      (3L, 0L, 1L, 100L, 10L, 5L, 1000000L)))
    val out = Tools.stochasticCost(df, 2).collect()
      .map(r => r.getAs[String]("cost_function") -> r.getAs[Long]("cost_ppm")).toMap
    for (f <- Seq("region_count_skew", "storefile_size", "read_request", "write_request"))
      assert(out(f) == 1000000L, s"$f = ${out(f)}")
    // 2 of 4 regions moved, maxMoves = max(1, 600) = 600 > moves:
    // scale(0, min(4, 600), 2) = 1/2
    assert(out("move") == 500000L, out.toString)
  }

  test("stochasticCost: locality cost is the mean (1 - locality), weighted by the 1.3.0 multipliers") {
    val df = clusterDF(Seq(
      (0L, 0L, 0L, 1L, 1L, 1L, 250000L),
      (1L, 1L, 1L, 1L, 1L, 1L, 750000L)))
    val rows = Tools.stochasticCost(df, 2).collect()
    val loc = rows.find(_.getAs[String]("cost_function") == "locality").get
    assert(loc.getAs[Long]("cost_ppm") == 500000L) // mean of 750000 and 250000 missing
    assert(loc.getAs[Long]("multiplier") == 25L)
    assert(loc.getAs[Long]("weighted_ppm") == 25L * 500000L)
    val rc = rows.find(_.getAs[String]("cost_function") == "region_count_skew").get
    assert(rc.getAs[Long]("multiplier") == 500L)
  }

  test("balancer_stochastic_cost: exactly the 6 cost rows, all within [0, 10^6]") {
    val rows = q("balancer_stochastic_cost").collect()
    assert(rows.length == 6)
    // round-robin deal of 16 regions to 5 servers is near-balanced:
    // region-count skew must be far from the ceiling
    val byF = rows.map(r => r.getAs[String]("cost_function") -> r.getAs[Long]("cost_ppm")).toMap
    assert(byF("region_count_skew") < 300000L, byF.toString)
    assert(byF.values.forall(v => v >= 0L && v <= 1000000L), byF.toString)
  }

  // ---- bufferedMutatorFlush -------------------------------------------

  test("bufferedMutatorFlush: size cuts inside an epoch, timer between epochs, end at close") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // client 0: 3 mutations of 600 B within one epoch (buffer 1000 B →
    // size flush after the second), then a 2h gap → new epoch
    val muts = Seq(
      (0L, 1L, ts(0L), 600L),
      (0L, 2L, ts(10L), 600L),
      (0L, 3L, ts(20L), 600L),
      (0L, 4L, ts(8000L), 600L))
      .toDF("client", "mut_id", "ts", "bytes")
    val out = Tools.bufferedMutatorFlush(muts, 1000L, 3600L * 1000000L)
      .orderBy("client", "epoch", "batch").collect()
    assert(out.length == 3, out.mkString("\n"))
    // batch 0 of epoch 1: mutations 1+2 (pre-sums 0 and 600 < 1000) —
    // closed by size
    assert(out(0).getAs[Long]("n_mutations") == 2L)
    assert(out(0).getAs[String]("closed_by") == "size")
    // batch 1 of epoch 1: mutation 3 (pre-sum 1200) — last of its
    // epoch, timer
    assert(out(1).getAs[Long]("n_mutations") == 1L)
    assert(out(1).getAs[String]("closed_by") == "timer")
    // epoch 2: the final mutation — closed by end
    assert(out(2).getAs[String]("closed_by") == "end")
    assert(out(2).getAs[Long]("epoch") == 2L)
  }

  test("buffered_mutator_flush: batch bytes re-sum to the corpus total") {
    val out = q("buffered_mutator_flush")
    val total = out.agg(sum("bytes")).head.getLong(0)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val want = ev.select(sum(length(col("event_type")) + lit(32L))).head.getLong(0)
    assert(total == want)
  }

  // ---- split_policy_delimited -----------------------------------------

  test("split_policy_delimited: split point is the median key truncated at the first delimiter") {
    val rows = q("split_policy_delimited").collect()
    assert(rows.length == 8)
    for (r <- rows) {
      val key = r.getAs[String]("split_key")
      val pt = r.getAs[String]("split_point")
      assert(key.startsWith(pt + "_"), s"$pt not a proper prefix of $key")
      assert(!pt.contains("_"))
    }
  }

  // ---- slow_request_log -----------------------------------------------

  test("slow_request_log: quantiles bracket correctly and slow counts match a direct filter") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type").as("method"),
        floor(col("value") * 1000).cast("bigint").as("proc_us"))
    val direct = ev.where(col("proc_us") > 200000L).groupBy("method")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Long]("n")).toMap
    for (r <- q("slow_request_log").collect()) {
      val m = r.getAs[String]("method")
      assert(r.getAs[Long]("n_slow") == direct.getOrElse(m, 0L), m)
      assert(r.getAs[Long]("p50") <= r.getAs[Long]("p99"), m)
      assert(r.getAs[Long]("p99") <= r.getAs[Long]("max_us"), m)
    }
  }

  // ---- gopherRules ----------------------------------------------------

  test("gopherRules: each rule fires on its own planted violation") {
    val good = (1 to 30).map(i => s"the and word$i city house").mkString(" ") // 150 words, stopwords, varied
    val docs = Seq(
      (1L, good),
      (2L, "the and " + Seq.fill(60)("x").mkString(" ")),          // repetition: 'x' dominates
      (3L, Seq.tabulate(60)(i => s"word$i").mkString(" ")),        // no stopwords
      (4L, "the of few words")                                     // too short
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, minWords = 20L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), out(1L).toString)
    assert(!out(2L).getAs[Boolean]("ok_repetition"))
    assert(out(2L).getAs[Boolean]("ok_stop"))
    assert(!out(3L).getAs[Boolean]("ok_stop"))
    assert(!out(4L).getAs[Boolean]("ok_words"))
    assert(Seq(2L, 3L, 4L).forall(i => !out(i).getAs[Boolean]("keep")))
  }

  // ---- bigramLogProb --------------------------------------------------

  test("bigramLogProb: hand-checked add-one bigram scores on a 2-doc corpus") {
    // corpus: "a b a b" and "a b" → bigrams: (a,b)x3, (b,a)x1; V = 2
    // c(a·)=3, c(b·)=1
    // P(b|a) = (3+1)/(3+2) = 4/5; P(a|b) = (1+1)/(1+2) = 2/3
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.bigramLogProb(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_bigrams") == 3L)
    assert(out(2L).getAs[Long]("n_bigrams") == 1L)
    def mlog(x: Double) = math.floor(math.log10(x) * 1e6).toLong
    val mAB = mlog(5.0) - mlog(4.0) // -log10 P(b|a) in micro
    val mBA = mlog(3.0) - mlog(2.0)
    assert(out(1L).getAs[Long]("sum_mneg") == 2 * mAB + mBA)
    assert(out(2L).getAs[Long]("sum_mneg") == mAB)
    // fluent text scores lower (less surprising) than the rarer path
    assert(out(2L).getAs[Double]("avg_neg_log10p") <
      out(1L).getAs[Double]("avg_neg_log10p"))
  }

  test("text_perplexity: model join is the only data-shaped shuffle; V rides a broadcast") {
    val p = q("text_perplexity").queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  // ---- preference_pairs ----------------------------------------------

  test("preference_pairs: every pair respects the margin and names the group's top candidate") {
    val rows = q("preference_pairs").collect()
    assert(rows.nonEmpty)
    val scored = TextOps.qualityClassifier(
        spark.read.parquet(s"$sfDir/documents.parquet"))
      .join(spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "source"), "doc_id")
      .select("source", "doc_id", "score_micro").collect()
      .groupBy(_.getAs[String]("source"))
    for (r <- rows) {
      val src = r.getAs[String]("source")
      val group = scored(src)
      val best = group.minBy(g => (-g.getAs[Long]("score_micro"), g.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("chosen_id") == best.getAs[Long]("doc_id"), src)
      assert(r.getAs[Long]("margin_micro") >= 400000L)
      assert(r.getAs[Long]("rejected_id") != r.getAs[Long]("chosen_id"))
    }
  }

  // ---- mine_hard_negatives -------------------------------------------

  test("mine_hard_negatives: every returned neighbor carries a different label than its query") {
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = q("mine_hard_negatives").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(labels(r.getAs[Long]("q_id")) != labels(r.getAs[Long]("nn_id")),
        s"q=${r.getAs[Long]("q_id")} nn=${r.getAs[Long]("nn_id")}")
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 5)
    }
    // scores descend within each query
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---- span_corruption ------------------------------------------------

  test("span_corruption: T5 length arithmetic holds row-by-row") {
    for (r <- q("span_corruption").collect()) {
      val n = r.getAs[Long]("n_tokens"); val c = r.getAs[Long]("n_corrupt")
      val sp = r.getAs[Long]("n_spans")
      assert(c == n * 15 / 100)
      assert(sp == (if (c == 0) 0L else math.max(1L, c / 3)))
      assert(r.getAs[Long]("input_len") == n - c + sp)
      assert(r.getAs[Long]("target_len") == c + sp + 1)
    }
  }

  // ---- hfile_index_plan ----------------------------------------------

  test("hfile_index_plan: index chain ceilings are consistent per region") {
    for (r <- q("hfile_index_plan").collect()) {
      val blocks = r.getAs[Long]("data_blocks")
      val levels = r.getAs[Long]("levels")
      val leaf = r.getAs[Long]("leaf_blocks")
      assert(blocks == (r.getAs[Long]("n_cells") + 63) / 64)
      if (blocks <= 128) assert(levels == 1L && leaf == 0L)
      else assert(levels >= 2L && leaf == (blocks + 127) / 128)
      // the root must hold what the top level feeds it, within fanout
      assert(r.getAs[Long]("root_entries") <= 128L ||
        levels == 3L, r.toString) // 3 levels caps at fanout^3 blocks
    }
  }

  // ---- heapTunerDirections -------------------------------------------

  test("heapTunerDirections: each branch fires on its crafted period") {
    // periods 1-6: identical steady load (warmup + stable stats);
    // period 7: cache-miss spike with flushes low  → grow block cache;
    // period 8: flush spike with misses low        → grow memstore;
    // period 9: memstore sufficient (used < 50%)   → grow block cache
    //           via the EARLY check (stats never consulted);
    // period 10: everything sufficient             → NEUTRAL.
    def row(p: Long, bf: Long, uf: Long, ev: Long, cm: Long,
            mem: Long, bc: Long) = (p, bf, uf, ev, cm, mem, bc)
    val steady = (1L to 6L).map(p => row(p, 1L, 9L, 50L, 20L, 900000L, 900000L))
    val crafted = steady ++ Seq(
      row(7L, 0L, 2L, 50L, 90L, 900000L, 900000L),
      row(8L, 10L, 40L, 50L, 2L, 900000L, 900000L),
      row(9L, 1L, 9L, 50L, 20L, 400000L, 900000L),
      row(10L, 0L, 0L, 0L, 0L, 100000L, 100000L))
    val out = Tools.heapTunerDirections(
        crafted.toDF("period", "blocked_flush", "unblocked_flush", "evict",
          "cache_miss", "mem_used_ppm", "cache_used_ppm"))
      .collect().map(r => r.getAs[Long]("period") -> r.getAs[String]("direction")).toMap
    assert(out(1L) == "NEUTRAL") // warmup: no trailing periods
    assert(out(7L) == "INCREASE_BLOCK_CACHE_SIZE", out.toString)
    assert(out(8L) == "INCREASE_MEMSTORE_SIZE", out.toString)
    assert(out(9L) == "INCREASE_BLOCK_CACHE_SIZE", out.toString)
    assert(out(10L) == "NEUTRAL", out.toString)
  }

  test("compaction_throughput: throttle formula identities per row") {
    val mib = 1048576L
    for (r <- q("compaction_throughput").collect()) {
      val p = r.getAs[Long]("pressure_ppm")
      assert(p == math.max(0L, (r.getAs[Long]("n_files") - 3) * 1000000L / 7))
      if (r.getAs[Boolean]("unlimited")) assert(r.isNullAt(r.fieldIndex("throttle_bps")))
      else if (r.getAs[Boolean]("offpeak"))
        assert(r.getAs[Long]("throttle_bps") == 40L * mib)
      else {
        val t = r.getAs[Long]("throttle_bps")
        assert(t >= 10L * mib && t <= 20L * mib)
        assert(t == 10L * mib + 10L * mib * p / 1000000L)
      }
    }
  }

  // ---- catalog_janitor ------------------------------------------------

  test("catalog_janitor: daughters pair as (2p, 2p+1) and deletable means both clean") {
    val rows = q("catalog_janitor").collect()
    assert(rows.length == 8)
    for (r <- rows) {
      val p = r.getAs[Long]("parent_id")
      assert(r.getAs[Long]("daughter_a") == 2 * p)
      assert(r.getAs[Long]("daughter_b") == 2 * p + 1)
      assert(r.getAs[Boolean]("deletable") ==
        (!r.getAs[Boolean]("refs_a") && !r.getAs[Boolean]("refs_b")))
    }
  }

  // ---- tokenizer_coverage / langid_eval -------------------------------

  test("tokenizer_coverage: ppm identities hold and token totals re-sum to the corpus") {
    val rows = q("tokenizer_coverage").collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(total == want)
    for (r <- rows) {
      val n = r.getAs[Long]("n_tokens"); val c = r.getAs[Long]("covered")
      assert(r.getAs[Long]("covered_ppm") == c * 1000000L / n)
      assert(r.getAs[Long]("oov_ppm") == (n - c) * 1000000L / n)
      assert(c <= n)
    }
  }

  test("langid_eval: confusion cells re-sum to the corpus and labels stay in domain") {
    val rows = q("langid_eval").collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows.forall(r => Set("en", "other")(r.getAs[String]("pred_lang"))))
  }

  // ---- mixture_report -------------------------------------------------

  test("mixture_report: shares are ppm floors of the group token totals and docs re-sum") {
    val rows = q("mixture_report").collect()
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(totalDocs == nDocs)
    val totalToks = rows.map(_.getAs[Long]("n_tokens")).sum
    for (r <- rows)
      assert(r.getAs[Long]("token_share_ppm") ==
        r.getAs[Long]("n_tokens") * 1000000L / totalToks)
  }
}
