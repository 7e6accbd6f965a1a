package graft

import org.apache.spark.sql.functions._

/** Behavior specs for the master-side placement/procedure batch:
  * rsgroup balancing, favored-node 3-replica placement, procedure-WAL
  * replay and the multi-table fanout write. Each asserts the invariant
  * the reference mechanism exists for, beyond the oracle's row parity. */
class MasterOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // ---- rsgroup_balance ------------------------------------------------

  test("rsgroup_balance: every destination is inside the table's group") {
    // the corrective half of GroupBasedLoadBalancer.correctAssignments:
    // after the plan, NO region may sit on a foreign-group server
    val rows = q("rsgroup_balance").collect()
    rows.foreach { r =>
      val grp = r.getAs[String]("grp")
      val dest = r.getAs[Int]("dest_server")
      if (grp == "g0") assert(dest >= 0 && dest <= 2, r.toString)
      else assert(dest == 3 || dest == 4, r.toString)
    }
    // and the group-blind current placement really did misplace some
    assert(rows.count(_.getAs[Boolean]("misplaced")) > 0)
  }

  test("rsgroup_balance: within-group region counts stay within one of even") {
    val rows = q("rsgroup_balance").collect()
    for ((grp, servers) <- Seq("g0" -> Seq(0, 1, 2), "g1" -> Seq(3, 4))) {
      val counts = servers.map(sv =>
        rows.count(r => r.getAs[String]("grp") == grp &&
          r.getAs[Int]("dest_server") == sv))
      assert(counts.max - counts.min <= 1, s"$grp: $counts")
    }
  }

  test("rsgroup_balance: misplaced flag matches the group boundary") {
    q("rsgroup_balance").collect().foreach { r =>
      val cur = r.getAs[Int]("cur_server")
      val inGroup =
        if (r.getAs[String]("grp") == "g0") cur <= 2 else cur >= 3
      assert(r.getAs[Boolean]("misplaced") == !inGroup, r.toString)
    }
  }

  // ---- favored_nodes --------------------------------------------------

  test("favored_nodes: three distinct servers, pair rack differs from primary rack") {
    // the fault-tolerance constraint the layout exists for: one rack
    // failure can never take 2 of a region's 3 replicas
    val rows = q("favored_nodes").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val p = r.getAs[Int]("primary_server")
      val sSec = r.getAs[Int]("secondary_server")
      val t = r.getAs[Int]("tertiary_server")
      assert(Set(p, sSec, t).size == 3, r.toString)
      assert(sSec / 2 == t / 2, s"pair split across racks: $r")
      assert(p / 2 != sSec / 2, s"pair shares the primary rack: $r")
    }
  }

  test("favored_nodes: primary load stays within one region across servers") {
    val rows = q("favored_nodes").collect()
    val byServer = (0 to 5).map(sv =>
      rows.count(_.getAs[Int]("primary_server") == sv))
    assert(byServer.max - byServer.min <= 1, byServer.toString)
  }

  // ---- procedure_replay -----------------------------------------------

  test("procedure_replay: root state machine — any rollback poisons, all-success completes") {
    val rows = q("procedure_replay").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_procs")
      val ok = r.getAs[Long]("n_success")
      val rb = r.getAs[Long]("n_rolledback")
      val st = r.getAs[String]("root_state")
      if (rb > 0) assert(st == "ROLLBACK", r.toString)
      else if (ok == n) assert(st == "SUCCESS", r.toString)
      else assert(st == "WAITING", r.toString)
    }
    // the synthetic corpus exercises all three states
    val states = rows.map(_.getAs[String]("root_state")).toSet
    assert(states == Set("ROLLBACK", "SUCCESS", "WAITING") ||
      states.contains("ROLLBACK"), states.toString)
  }

  test("procedure_replay: latest entry wins — replay of a reordered store converges") {
    import spark.implicits._
    import graft.analytics.Tools
    // crafted store: proc 0 ends SUCCESS (seq 5 supersedes the seq 1
    // rollback), proc 1 ends ROLLEDBACK (poisons root 0), proc 5 ends
    // RUNNABLE (root 1 stays WAITING), proc 6 SUCCESS alone on root 1
    val wal = Seq(
      (0L, 1L, "ROLLEDBACK"), (0L, 5L, "SUCCESS"),
      (1L, 2L, "SUCCESS"), (1L, 7L, "ROLLEDBACK"),
      (5L, 3L, "RUNNABLE"), (6L, 4L, "SUCCESS"))
      .toDF("proc_id", "seq", "state")
    def run(df: org.apache.spark.sql.DataFrame) =
      Tools.procedureReplay(df, expr("proc_id div 5")).collect()
        .map(r => r.getAs[Long]("root_id") -> r.getAs[String]("root_state"))
        .toMap
    val want = Map(0L -> "ROLLBACK", 1L -> "WAITING")
    assert(run(wal) == want)
    // replay must be INPUT-order free: shuffle the store rows before
    // the fold — the max-struct latest-wins makes any arrival order
    // converge to the same root states
    assert(run(wal.repartition(7).orderBy(col("state"))) == want)
  }

  // ---- multi_table_write ----------------------------------------------

  test("multi_table_write: fanout loses and duplicates nothing") {
    val audit = q("multi_table_write").collect()
    val src = graft.core.Tables.load(spark, sfDir, "events")
    val total = src.count()
    assert(audit.map(_.getAs[Long]("n_rows")).sum == total)
    // each produced table holds exactly the source's rows of its type
    val want = src.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    audit.foreach { r =>
      assert(r.getAs[Long]("n_rows") == want(r.getAs[String]("table_name")),
        r.toString)
    }
  }

  // ---- import_renamed -------------------------------------------------

  test("import_renamed: rename is total and the import filter dropped only low keys") {
    val rows = q("import_renamed").collect()
    // no unrenamed 'web' family survives the import, and the renamed
    // family exists (rename happened, not a drop)
    assert(!rows.exists(_.getAs[String]("family") == "web"))
    assert(rows.exists(_.getAs[String]("family") == "web_v2"))
    assert(rows.forall(_.getAs[Long]("rowkey") >= 5L))
    // cell conservation: per-key totals equal the source above the cut
    val want = graft.core.Tables.eventCellsTwoFamilies(spark, sfDir)
      .where(col("rowkey") >= 5).count()
    assert(rows.map(_.getAs[Long]("n_cells")).sum == want)
  }

  // ---- balancer_move_plan ---------------------------------------------

  test("balancer_move_plan: the chosen move's delta equals a direct cost recomputation") {
    val rows = q("balancer_move_plan").collect()
    // rebuild the placement and the skew cost directly
    val placement = rows.map(r =>
      r.getAs[Long]("bucket") -> r.getAs[Int]("src")).toMap
    val t = placement.size
    def cost(counts: Map[Int, Long]): Long =
      (0 until 5).map(sv => math.abs(counts.getOrElse(sv, 0L) * 5 - t)).sum
    val base = placement.values.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    rows.foreach { r =>
      val (b, src, dest) = (r.getAs[Long]("bucket"), r.getAs[Int]("src"),
        r.getAs[Int]("dest"))
      val moved = base + (src -> (base(src) - 1)) +
        (dest -> (base.getOrElse(dest, 0L) + 1))
      assert(cost(moved) - cost(base) == r.getAs[Long]("delta_num"), r.toString)
    }
    // exactly one chosen move, and it strictly improves (two servers
    // start empty, so an improving move must exist)
    val chosen = rows.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length == 1, chosen.mkString(","))
    assert(chosen.head.getAs[Long]("delta_num") < 0)
    assert(chosen.head.getAs[Int]("rank") == 1)
  }

  // ---- compaction_queue_split -----------------------------------------

  test("compaction_queue_split: queue routing brackets the throttle point exactly") {
    val rows = q("compaction_queue_split").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val large = r.getAs[Long]("tot_size") > r.getAs[Long]("throttle_point")
      assert(r.getAs[String]("queue") == (if (large) "large" else "small"), r.toString)
    }
    // the selections are EXACTLY compaction_select's (one shared chain)
    val sel = q("compaction_select").collect()
      .map(r => r.getAs[Long]("region") ->
        (r.getAs[Long]("first_seq"), r.getAs[Long]("n_files"),
          r.getAs[Long]("tot_size"))).toMap
    rows.foreach { r =>
      assert(sel(r.getAs[Long]("region")) ==
        (r.getAs[Long]("first_seq"), r.getAs[Long]("n_files"),
          r.getAs[Long]("tot_size")), r.toString)
    }
  }

  // ---- schema_sanity --------------------------------------------------

  test("schema_sanity: violation count reconciles with flags, both outcomes occur") {
    val rows = q("schema_sanity").collect()
    val flags = Seq("v_max_filesize", "v_flush_size", "v_ttl", "v_blocksize",
      "v_min_versions", "v_version_order", "v_scope")
    rows.foreach { r =>
      val n = flags.count(r.getAs[Boolean])
      assert(r.getAs[Long]("n_violations") == n, r.toString)
      assert(r.getAs[Boolean]("valid") == (n == 0), r.toString)
    }
    // the synthesized descriptors exercise the gate both ways
    assert(rows.exists(_.getAs[Boolean]("valid")))
    assert(rows.exists(!_.getAs[Boolean]("valid")))
  }

  // ---- retain_assignment ----------------------------------------------

  test("retain_assignment: live-host regions stay put, dead spread within one") {
    val rows = q("retain_assignment").collect()
    rows.foreach { r =>
      val (old, dest) = (r.getAs[Int]("old_server"), r.getAs[Int]("dest_server"))
      assert(dest != 2, s"assigned to the dead server: $r")
      if (r.getAs[Boolean]("retained")) assert(dest == old, r.toString)
      else assert(old == 2, r.toString)
    }
    // the re-dealt regions stay within one of even across survivors
    val redealt = rows.filter(!_.getAs[Boolean]("retained"))
      .groupBy(_.getAs[Int]("dest_server")).view.mapValues(_.length)
    if (redealt.nonEmpty)
      assert(redealt.values.max - redealt.values.min <= 1, redealt.toMap.toString)
  }

  // ---- wal_player_bulk ------------------------------------------------

  test("wal_player_bulk: bulk files are key-sorted within each region partition") {
    // the KeyValueSortReducer guarantee: every physical file ascends
    // by rowkey (bulk load requires it — HFiles must be sorted)
    q("wal_player_bulk").count() // ensure the bulk output exists
    val path = graft.core.Indexes.ensure(spark, sfDir, "walp_bulk")(_ => ())
    val withFile = spark.read.parquet(path)
      .select(col("rowkey"), input_file_name().as("f"))
      .collect()
    withFile.groupBy(_.getAs[String]("f")).foreach { case (_, rows) =>
      // parquet preserves row order within a file: read order = write order
      val keys = rows.map(_.getAs[Long]("rowkey"))
      assert(keys.zip(keys.tail).forall { case (a, b) => a <= b })
    }
    // and region dirs are disjoint in key space
    val ranges = withFile.groupBy(r => r.getAs[String]("f")
        .replaceAll(".*region=([0-9]+).*", "$1").toInt)
      .view.mapValues(rs => (rs.map(_.getAs[Long]("rowkey")).min,
        rs.map(_.getAs[Long]("rowkey")).max)).toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, (_, hiA)), (_, (loB, _))) => assert(hiA <= loB)
      case _ => ()
    }
  }

  // ---- rit_audit ------------------------------------------------------

  test("rit_audit: latest transition wins and the stuck flag brackets correctly") {
    val rows = q("rit_audit").collect()
    assert(rows.nonEmpty && rows.length <= 16)
    rows.foreach { r =>
      val inT = r.getAs[Boolean]("in_transition")
      assert(inT == (r.getAs[String]("state") != "OPEN"), r.toString)
      if (r.getAs[Boolean]("stuck"))
        assert(inT && r.getAs[Long]("age_s") > 86400L, r.toString)
      assert(r.getAs[Long]("age_s") >= 0L)
    }
  }

  // ---- presplit_hex ---------------------------------------------------

  test("presplit_hex: regions tile the hex keyspace and contain their rows") {
    val rows = q("presplit_hex").collect().sortBy(_.getAs[Long]("region"))
    def hx(s: String): Long = java.lang.Long.parseLong(s, 16)
    rows.foreach { r =>
      val (lo, hi) = (hx(r.getAs[String]("start_hex")), hx(r.getAs[String]("end_hex")))
      assert(lo <= r.getAs[Long]("min_hv") && r.getAs[Long]("max_hv") <= hi,
        r.toString)
    }
    // adjacent boundaries touch exactly: start(r+1) = end(r) + 1
    rows.sliding(2).foreach {
      case Array(a, b)
        if b.getAs[Long]("region") == a.getAs[Long]("region") + 1 =>
        assert(hx(b.getAs[String]("start_hex")) ==
          hx(a.getAs[String]("end_hex")) + 1, s"$a | $b")
      case _ => ()
    }
    // RegionSplitter.split(n) exactness (r10 reference audit): split i
    // = floor(range/n)·i — every region exactly floor(2^32/12) =
    // 357913941 wide, the LAST takes the slop up to ffffffff
    rows.foreach { r =>
      val reg = r.getAs[Long]("region")
      assert(hx(r.getAs[String]("start_hex")) == reg * 357913941L, r.toString)
      if (reg < 11)
        assert(hx(r.getAs[String]("end_hex")) == (reg + 1) * 357913941L - 1,
          r.toString)
      else assert(r.getAs[String]("end_hex") == "ffffffff", r.toString)
    }
  }

  // ---- snapshot_info --------------------------------------------------

  test("snapshot_info: copy-on-write accounting — v2 is a subset, counts reconcile") {
    val rows = q("snapshot_info").collect()
      .map(r => r.getAs[Int]("version") -> r).toMap
    val (v1, v2) = (rows(1), rows(2))
    // deleteRows only removes: everything in v2 is shared with v1
    assert(v2.getAs[Long]("n_unique") == 0L)
    assert(v1.getAs[Long]("n_shared") == v2.getAs[Long]("n_rows"))
    assert(v1.getAs[Long]("n_rows") ==
      v1.getAs[Long]("n_shared") + v1.getAs[Long]("n_unique"))
  }

  // ---- hfile_stats ----------------------------------------------------

  test("hfile_stats: footprints reconcile — cells, bytes, rows add up") {
    val rows = q("hfile_stats").collect()
    val cells = graft.core.Tables.customerCells(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_cells")).sum == cells.count())
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      cells.select("rowkey").distinct().count())
    rows.foreach { r =>
      // avg can never exceed max, and the biggest row is a real key
      assert(r.getAs[Long]("avg_row_bytes") <= r.getAs[Long]("max_row_bytes"))
      assert(r.getAs[String]("biggest_row").nonEmpty)
    }
  }

  // ---- jvm_pause_monitor ----------------------------------------------

  test("jvm_pause_monitor: intervals = beats minus one per server; counts bracket") {
    val rows = q("jvm_pause_monitor").collect()
    val beats = graft.core.Tables.load(spark, sfDir, "events")
      .groupBy(pmod(col("user_id"), lit(4)).as("server")).count().collect()
      .map(r => r.getAs[Long]("server") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val sv = r.getAs[Long]("server")
      assert(r.getAs[Long]("n_intervals") == beats(sv) - 1, r.toString)
      // warn ⊂ pauses: warn intervals are NOT double-counted as info
      assert(r.getAs[Long]("n_warn") + r.getAs[Long]("n_info") <=
        r.getAs[Long]("n_intervals"))
      assert(r.getAs[Long]("max_pause_ms") <= r.getAs[Long]("total_pause_ms"))
    }
  }

  // ---- hbck_repair_plan ----------------------------------------------

  test("hbck_repair_plan: replaying the plan onto the catalog audits clean") {
    import graft.analytics.{AnalyticsQueries, Tools}
    import spark.implicits._
    val catalog = AnalyticsQueries.corruptedCatalog(spark, sfDir)
    val plan = q("hbck_repair_plan").collect()
    def keyOpt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    // regions the plan removes from the chain: sidelined ones and
    // every merge-group member (replaced by the merged region below)
    val removed = plan.filter(r => r.getString(0).startsWith("SIDELINE") ||
        r.getString(0) == "MERGE_OVERLAP")
      .map(_.getString(1)).toSet
    // fabricated hole-fillers enter verbatim; each merge group enters
    // once at its target bounds
    val adds =
      plan.filter(_.getString(0) == "CREATE_HOLE_REGION")
        .map(r => (r.getString(1), keyOpt(r, 2), keyOpt(r, 3))).toSeq ++
      plan.filter(_.getString(0) == "MERGE_OVERLAP")
        .map(r => (keyOpt(r, 2), keyOpt(r, 3))).distinct
        .map { case (s, e) => (s"merged_${s.getOrElse("open")}", s, e) }
    val repaired = catalog
      .where(!col("region_id").isin(removed.toSeq: _*))
      .unionByName(adds.toDF("region_id", "start_key", "end_key"))
    assert(Tools.hbckRegionChain(repaired).collect().isEmpty,
      Tools.hbckRegionChain(repaired).collect().mkString("\n"))
  }

  test("hbckRepairPlan: an EMPTY catalog fabricates the whole-keyspace open region") {
    import spark.implicits._
    val cat = Seq.empty[(String, Option[Long], Option[Long])]
      .toDF("region_id", "start_key", "end_key")
    val plan = graft.analytics.Tools.hbckRepairPlan(cat).collect()
    assert(plan.length == 1, plan.mkString(","))
    assert(plan(0).getString(0) == "CREATE_HOLE_REGION" &&
      plan(0).isNullAt(2) && plan(0).isNullAt(3), plan(0).toString)
    // the fixed point holds: applying the fabricated region audits clean
    val repaired = Seq(("fab_open", None: Option[Long], None: Option[Long]))
      .toDF("region_id", "start_key", "end_key")
    assert(graft.analytics.Tools.hbckRegionChain(repaired).collect().isEmpty)
  }

  test("hbckRepairPlan: oversize overlap group sidelines the capped middle slice") {
    import spark.implicits._
    // 7 regions stacked over one range: > maxMerge (5), so
    // sidelineBigOverlaps takes min(7-5, maxOverlapsToSideline=2) = 2
    // members by findBigRanges: all 7 overlap all 7 (one count chunk),
    // chunk order (s, e, id) = g,f,e,d,c,b,a, middle slice of width 2
    // starts at (7-2)/2 = 2 -> e, d; the other five stay RESIDUAL
    val cat = (Seq(("a", 0L, 100L)) ++
      (1 to 6).map(i => (('a' + i).toChar.toString, 0L, 100L - i * 10L)))
      .toDF("region_id", "start_key", "end_key")
    val plan = graft.analytics.Tools.hbckRepairPlan(cat).collect()
    val side = plan.filter(_.getString(0) == "SIDELINE_OVERLAP")
    val resid = plan.filter(_.getString(0) == "RESIDUAL_OVERLAP")
    assert(side.map(_.getString(1)).sorted.toSeq == Seq("d", "e"),
      plan.mkString("\n"))
    assert(resid.map(_.getString(1)).sorted.toSeq ==
      Seq("a", "b", "c", "f", "g"))
    assert(!plan.exists(_.getString(0) == "MERGE_OVERLAP"))
  }

  test("hbckRepairPlan: big-group repair converges over reruns like the reference") {
    import graft.analytics.Tools
    import spark.implicits._
    // 8-member stack: run 1 sidelines 2 (the cap), run 2 sidelines
    // min(6-5, 2) = 1 more, run 3 merges the surviving 5 --
    // ceil((8-5)/2)+1 = 3 runs, the reference's rerun-flag loop.
    // Open-boundary edge regions wrap [0,100) so only the overlap
    // defect is in play.
    var cat = ((0 to 7).map(i =>
        (('a' + i).toChar.toString, Some(0L), Some(100L - i * 5L))) ++
      Seq(("lo", None, Some(0L)), ("hi", Some(100L), None)))
      .toDF("region_id", "start_key", "end_key")
    def keyOpt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    var rounds = 0
    while (Tools.hbckRegionChain(cat).limit(1).collect().nonEmpty) {
      rounds += 1
      assert(rounds <= 3, s"did not converge in 3 reruns")
      val plan = Tools.hbckRepairPlan(cat).collect()
      val removed = plan.filter(r => r.getString(0) == "SIDELINE_OVERLAP" ||
          r.getString(0) == "SIDELINE_DEGENERATE" ||
          r.getString(0) == "MERGE_OVERLAP")
        .map(_.getString(1)).toSet
      val adds =
        plan.filter(_.getString(0) == "CREATE_HOLE_REGION")
          .map(r => (r.getString(1), keyOpt(r, 2), keyOpt(r, 3))).toSeq ++
        plan.filter(_.getString(0) == "MERGE_OVERLAP")
          .map(r => (keyOpt(r, 2), keyOpt(r, 3))).distinct
          .map { case (s, e) => (s"merged_${s.getOrElse("open")}", s, e) }
      cat = cat.where(!col("region_id").isin(removed.toSeq: _*))
        .unionByName(adds.toDF("region_id", "start_key", "end_key"))
    }
    assert(rounds == 3, s"expected exactly 3 rerun rounds, got $rounds")
  }

  test("hbckRepairPlan: a straddler transitively connects disjoint neighbors") {
    import spark.implicits._
    // A and B never overlap each other, but X straddles both — the
    // reference's group walk puts all three in ONE merge group
    val cat = Seq(("A", 0L, 10L), ("B", 10L, 20L), ("X", 5L, 15L))
      .toDF("region_id", "start_key", "end_key")
    val plan = graft.analytics.Tools.hbckRepairPlan(cat).collect()
    val merges = plan.filter(_.getString(0) == "MERGE_OVERLAP")
    assert(merges.map(_.getString(1)).sorted.toSeq == Seq("A", "B", "X"),
      plan.mkString("\n"))
    // one group, spanning the union [0, 20)
    assert(merges.map(r => (r.getLong(2), r.getLong(3))).distinct.toSeq ==
      Seq((0L, 20L)))
  }

  // ---- canary_write ---------------------------------------------------

  test("canary_write: read-only regions fail the put, writable ones round-trip") {
    val rows = q("canary_write").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val region = r.getAs[Long]("region")
      val writable = r.getAs[Boolean]("writable")
      assert(writable == !Set(3L, 6L).contains(region), r.toString)
      assert(r.getAs[Boolean]("put_ok") == writable, r.toString)
      assert(r.getAs[Boolean]("roundtrip_ok") == writable, r.toString)
      assert(r.getAs[Long]("n_cells") > 0, s"empty region in canary table: $r")
    }
  }

  test("canaryWriteProbe: the probe key lands in its own region (boundary arithmetic)") {
    import spark.implicits._
    // skewed keyspace [3, 45]: ceil-boundary probes must still map
    // back to their region through totalOrderBucket
    val cells = Seq((3L, "f", "q"), (17L, "f", "q"), (45L, "f", "q"))
      .toDF("rowkey", "family", "qualifier")
    val got = graft.analytics.Tools.canaryWriteProbe(cells, 4).collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getAs[Boolean]("put_ok"), r.toString)
      assert(r.getAs[Boolean]("roundtrip_ok"), r.toString)
    }
  }

  // ---- alter_table_plan -----------------------------------------------

  test("alterTablePlan: TTL tighten and version cut count exactly the newly-hit cells") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def daysAgo(d: Int) =
      new java.sql.Timestamp(ts0.getTime - d * 86400000L)
    // f: 4 versions of one cell at ages 0/5/20/40 days
    val cells = Seq(
      (1L, "f", "q", daysAgo(0), 10.0, 4L),
      (1L, "f", "q", daysAgo(5), 9.0, 3L),
      (1L, "f", "q", daysAgo(20), 8.0, 2L),
      (1L, "f", "q", daysAgo(40), 7.0, 1L))
      .toDF("rowkey", "family", "qualifier", "ts", "value", "event_id")
    val oldP = Seq(("f", 30L, 3, "NONE", 65536L), ("gone", 30L, 3, "NONE", 65536L))
      .toDF("family", "ttl_days", "max_versions", "encoding", "blocksize_b")
    val newP = Seq(("f", 10L, 2, "NONE", 65536L), ("added", 30L, 3, "NONE", 65536L))
      .toDF("family", "ttl_days", "max_versions", "encoding", "blocksize_b")
    val got = graft.analytics.Tools.alterTablePlan(cells, oldP, newP)
      .collect().map(r => r.getAs[String]("family") -> r).toMap
    val f = got("f")
    // TTL 30→10: the 20-day cell newly expires (40-day was already
    // out under 30); versions 3→2: rank-3 newly drops (rank-4 was
    // already beyond old max)
    assert(f.getAs[Long]("newly_expired") == 1, f.toString)
    assert(f.getAs[Long]("newly_dropped_versions") == 1, f.toString)
    assert(f.getAs[String]("action") == "MODIFY")
    assert(f.getAs[Long]("rewrite_bytes") == 0, "no encoding/blocksize change")
    assert(got("gone").getAs[String]("action") == "DROP_FAMILY")
    assert(got("gone").getAs[Long]("n_cells") == 0)
    assert(got("added").getAs[String]("action") == "ADD_FAMILY")
    assert(got("added").getAs[Long]("n_cells") == 0)
  }

  test("alterTablePlan: NULL-to-value encoding change prices its rewrite (null-safe diff)") {
    import spark.implicits._
    // encoding NULL = unset/default, a legitimate property state per
    // the NULL-property convention; setting it to PREFIX rewrites the
    // family's whole footprint — the r11 review caught plain =!=
    // reporting rewrite_bytes 0 here (NULL diff fell through coalesce)
    val cells = Seq(
      (1L, "f", "qq", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 1.0, 1L))
      .toDF("rowkey", "family", "qualifier", "ts", "value", "event_id")
    val oldP = Seq(("f", Some(30L), 3, None: Option[String], 65536L))
      .toDF("family", "ttl_days", "max_versions", "encoding", "blocksize_b")
    val newP = Seq(("f", Some(30L), 3, Some("PREFIX"), 65536L))
      .toDF("family", "ttl_days", "max_versions", "encoding", "blocksize_b")
    val r = graft.analytics.Tools.alterTablePlan(cells, oldP, newP).collect().head
    assert(r.getAs[String]("action") == "MODIFY", r.toString)
    assert(r.getAs[Boolean]("encoding_changed"), r.toString)
    assert(r.getAs[Long]("rewrite_bytes") == 8L + 2L, r.toString)
  }

  test("syncTable: a digest-sum collision with unequal row counts is NOT a match") {
    import spark.implicits._
    // side A: two rows hashing to 5 and 7 (digest 12, rows 2); side
    // B: one row hashing to 12 (digest 12, rows 1) — the sum-digest
    // collides, the row count is the witness
    val a = graft.analytics.Tools.hashTable(
      Seq((1L, 5L), (2L, 7L)).toDF("k", "h"), "k", col("h"), 1000L)
    val b = graft.analytics.Tools.hashTable(
      Seq((3L, 12L)).toDF("k", "h"), "k", col("h"), 1000L)
    val r = graft.analytics.Tools.syncTable(a, b).collect().head
    assert(r.getAs[Long]("digest_a") == r.getAs[Long]("digest_b"))
    assert(!r.getAs[Boolean]("is_match"), r.toString)
  }

  test("verifyReplication: empty ranges report four ZEROS, never NULL counters") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val r = graft.analytics.Tools
      .verifyReplication(empty, empty, "k", Seq("v")).collect().head
    for (c <- Seq("good_rows", "only_in_source", "only_in_peer",
        "content_different"))
      assert(!r.isNullAt(r.fieldIndex(c)) && r.getAs[Long](c) == 0L, s"$c: $r")
  }

  test("multi_table_write: each table reads back from its own pruned directory") {
    // the routed layout is real: filtering one table prunes the scan
    // to that table's partition directory (no full re-scan)
    q("multi_table_write").count() // the query's own builder writes the layout
    val path = graft.core.Indexes.ensure(spark, sfDir, "mtw_events")(_ => ())
    val one = spark.read.parquet(path).where(col("table_name") === "click")
    val p = one.queryExecution.executedPlan.toString()
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*table_name[^\\]]*\\].*"),
      p.take(800))
    assert(one.count() ==
      graft.core.Tables.load(spark, sfDir, "events")
        .where(col("event_type") === "click").count())
  }
}
