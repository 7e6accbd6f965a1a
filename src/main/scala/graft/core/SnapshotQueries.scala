package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kv.Mutations

/** SURVEY §2F — snapshots and region metadata as verified queries. */
object SnapshotQueries {

  /** Collision-safe per-dataset suffix: 32-bit String.hashCode has
    * collisions among ordinary path strings, and a collision would
    * silently serve one dataset's snapshot/bucket artifacts to the
    * other (same once()-guard, same table name). 64 md5 bits keep the
    * suffix identifier-safe and collision odds negligible. */
  private[graft] def dirKey(sfDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  /** Per-sfDir temp path (concurrent runs over different SFs isolate).
    * private[graft]: AnalyticsQueries shares THIS helper — its former
    * byte-identical copy had to be hand-synced through the r10 dirKey
    * fix, which is the evidence duplication costs. */
  private[graft] def tmp(name: String, sfDir: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/" + name + "_" +
      dirKey(sfDir)

  /** Setup-once guard: snapshot/bucket layouts are written once per JVM
    * per input dir — the verified operator is the READ/JOIN over the
    * layout, and re-paying the ingest write on every (warmup + timed)
    * invocation times the wrong thing. Per-JVM, so a fresh process never
    * trusts stale on-disk leftovers from an earlier run. */
  private val prepared =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  /** NO-NESTING INVARIANT: `setup` runs INSIDE computeIfAbsent, which
    * holds the map bin lock for the (multi-second) ingest — a setup
    * that itself calls once() for another key throws
    * IllegalStateException or deadlocks, and unrelated keys hashing to
    * the same bin block behind it. Every current setup is a leaf
    * (plain writes); keep it that way, or switch to the per-key-future
    * shape (putIfAbsent of a lazy holder) before composing setups.
    * The lock-held form is kept deliberately: it preserves
    * throw-caches-nothing atomically, with no half-registered state. */
  private def once(key: String)(setup: => Unit): Unit =
    // computeIfAbsent, NOT add-then-run: a THROWN setup must cache
    // nothing, or every later call in the JVM reads a missing/partial
    // layout (the same failed-build discipline as Indexes.ensure)
    prepared.computeIfAbsent(key, _ => { setup; java.lang.Boolean.TRUE })

  /** Per-region stats: regions = n equal key ranges (the split table)
    * — the total-order bucketing from analytics.Tools with a payload
    * aggregate, renamed to region vocabulary. */
  def regionStats(df: DataFrame, keyCol: String, n: Int, valueCol: String): DataFrame =
    graft.analytics.Tools.totalOrderBuckets(df, keyCol, n,
        extraAggs = Seq(round(sum(col(valueCol)), 4).as("sum_v")),
        bucketName = "region")
      .withColumnRenamed("min_key", "start_key")
      .withColumnRenamed("max_key", "end_key")

  /** Snapshot base for `sfDir`, written once per JVM: v1 = the events
    * snapshot; v2 = post-mutation state written copy-on-write. Shared
    * by snapshot_read and export_snapshot (whichever runs first pays
    * the ingest). */
  private def ensureSnapshots(s: SparkSession, d: String): String = {
    val base = tmp("graft_snapshots", d)
    once(base) {
      val ev = Tables.load(s, d, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
      Snapshots.write(ev, "user_id", base, 1)
      // "delete the even users" IS the parity filter (user_id is a
      // non-null key, so the deleteRows anti-join and the plain
      // where() agree) — the filter is shuffle-free where the
      // anti-join scanned ev twice; deleteRows itself is exercised by
      // the delete_rows query, not this fixture
      Snapshots.write(ev.where(col("user_id") % 2 =!= 0), "user_id", base, 2)
    }
    base
  }

  /** Engine-portable per-row digest for the events snapshot: Knuth hash
    * of the (unique) event_id plus value cents plus epoch seconds —
    * same overflow guard and floor() discipline as the hash_sync_table
    * digest, so DuckDB reproduces it bit-for-bit. */
  private val eventRowHash =
    Hashes.knuth(col("event_id")) +
      floor(col("value") * 100).cast("bigint") + unix_timestamp(col("ts"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snapshot_read" -> ((s, d) =>
      // the point-in-time read: v1 must be byte-identical to the original
      Snapshots.read(s, ensureSnapshots(s, d), 1).orderBy("event_id")),
    // ExportSnapshot: file-level copy of the v1 snapshot dir, verified
    // by per-bucket digests over source vs export (SyncTable over the
    // two reads) — every bucket must match, proving the shipped files
    // carry the identical row set
    "export_snapshot" -> ((s, d) => {
      val base = ensureSnapshots(s, d)
      val exp = tmp("graft_snap_export", d)
      once(exp)(Snapshots.exportSnapshot(base, 1, exp))
      def digests(df: DataFrame) =
        graft.analytics.Tools.hashTable(df, "user_id", eventRowHash, 10L)
      graft.analytics.Tools.syncTable(
          digests(Snapshots.read(s, base, 1)), digests(Snapshots.read(s, exp, 1)))
        .orderBy("bucket")
    }),
    // row-level diff of snapshot v1 vs the post-mutation v2: the setup
    // deleted every even-user row copy-on-write, so the diff is exactly
    // those rows, flagged removed
    "snapshot_diff" -> ((s, d) => {
      val base = ensureSnapshots(s, d)
      Snapshots.diff(
          Snapshots.read(s, base, 1), Snapshots.read(s, base, 2),
          "event_id", Seq("user_id", "event_type", "ts", "value"))
        .orderBy("event_id")
    }),
    // In-place restoreSnapshot (RestoreSnapshotHandler.java:63): the
    // EXISTING table rolls back to the v1 snapshot, and the query is
    // the rollback AUDIT — the dual of snapshot_diff: the current
    // state (v2) drifted from the snapshot three ways (even-user rows
    // deleted, user%7 values bumped, user%9 rows re-inserted under
    // fresh ids), so the restore resurrects the deletes, reverts the
    // updates and DISCARDS the post-snapshot inserts (the
    // mutation-loss class the handler's javadoc warns about). The
    // restore itself writes v3 = snapshot content copy-on-write; the
    // spec asserts v3 equals v1 row-for-row and that a clone taken
    // from the snapshot is unaffected by the origin's rollback.
    "restore_snapshot" -> ((s, d) => {
      // the shared fixture resolves OUTSIDE once(): its own once()
      // would nest inside this one's bin lock (the no-nesting
      // invariant above)
      val src = ensureSnapshots(s, d)
      val base = tmp("graft_snap_restore", d)
      once(base) {
        // v1 is byte-equivalent to the shared fixture's v1 — a file
        // copy, not a second multi-second Spark ingest of the same
        // rows (the snapshot_clone pattern)
        Snapshots.exportSnapshot(src, 1, base)
        val ev = Tables.load(s, d, "events")
          .select("event_id", "user_id", "event_type", "ts", "value")
        val survivors = ev.where(col("user_id") % 2 =!= 0)
        val updated = survivors.withColumn("value",
          when(col("user_id") % 7 === 0, round(col("value") + 1, 4))
            .otherwise(col("value")))
        // synthetic insert ids must stay DISJOINT from real ids or the
        // audit's full-outer join merges an insert with an unrelated
        // v1 row — guard rides the id column (the pruning-proof
        // placement), loud past 1e9 instead of silently colliding
        val inserted = survivors.where(col("user_id") % 9 === 0)
          .withColumn("event_id", expr(
            "CASE WHEN event_id < 1000000000 THEN event_id + 1000000000 " +
              "ELSE raise_error('restore_snapshot: event_id >= 1e9 collides " +
              "with the synthetic insert offset — raise the offset') END"))
        Snapshots.write(updated.unionByName(inserted), "user_id", base, 2)
        Snapshots.restore(base, 1, 3)
      }
      Snapshots.restoreAudit(
          Snapshots.read(s, base, 1), Snapshots.read(s, base, 2),
          "event_id", Seq("user_id", "event_type", "ts", "value"))
        .orderBy("event_id")
    }),
    // CloneSnapshot (snapshot/CloneSnapshotProcedure): a new table
    // seeded from the v1 snapshot by FILE copy, then mutated
    // independently — diffing source v1 against the clone's own v2
    // shows EXACTLY the clone-side mutation, proving the clone is
    // copy-on-write independent of its origin
    "snapshot_clone" -> ((s, d) => {
      val base = ensureSnapshots(s, d)
      val cloneBase = tmp("graft_snap_clone", d)
      once(cloneBase) {
        Snapshots.exportSnapshot(base, 1, cloneBase)
        val mutated = Snapshots.read(s, cloneBase, 1)
          .withColumn("value",
            when(col("user_id") % 5 === 0, round(col("value") + 1, 4))
              .otherwise(col("value")))
        Snapshots.write(mutated, "user_id", cloneBase, 2)
      }
      Snapshots.diff(
          Snapshots.read(s, base, 1), Snapshots.read(s, cloneBase, 2),
          "event_id", Seq("user_id", "event_type", "ts", "value"))
        .orderBy("event_id")
    }),
    // TableSnapshotInputFormat analogue: scan the v1 snapshot dir
    // DIRECTLY — split planning over the per-file region manifest picks
    // only the part files overlapping [3, 8), non-overlapping regions
    // never enter the read (plan-audited: inputFiles strictly shrink)
    "snapshot_scan_direct" -> ((s, d) => {
      val base = ensureSnapshots(s, d)
      Snapshots.scanDirect(s, base, 1, "user_id", 3L, 8L).orderBy("event_id")
    }),
    // MultiTableSnapshotInputFormat: ONE scan over BOTH snapshot
    // versions, each contributing only its overlapping region files
    // (v2 is the post-delete state, so its half of the union is odd
    // users only) — provenance rides the snapshot name column
    "multi_snapshot_scan" -> ((s, d) => {
      val base = ensureSnapshots(s, d)
      Snapshots.multiSnapshotScan(s,
          Seq(("v1", base, 1), ("v2", base, 2)), "user_id", 3L, 8L)
        .orderBy("snapshot", "event_id")
    }),
    "region_split_stats" -> ((s, d) =>
      regionStats(Tables.load(s, d, "lineitem"), "l_orderkey", 16, "l_quantity")
        .orderBy("region")),
    // the 100 TB fact-fact join story: both sides written bucketed on
    // the join key into the same bucket count, so the SortMergeJoin (and
    // the groupBy on the same key) run with ZERO Exchange — the
    // co-located join HBase gets from co-partitioned regions.
    // Plan-asserted (no shuffle) in LayoutSpec; verified vs oracle here.
    // HBase major compaction: rewrite the store dropping deleted cells,
    // TTL-expired versions (minVersions guarantee intact) and versions
    // beyond maxVersions, emitting a fresh rowkey-sorted snapshot — the
    // full storage-lifecycle composition (delete markers → TTL →
    // version GC → sorted rewrite) as one verified query.
    "major_compaction" -> ((s, d) => {
      val v = Tables.eventCells(s, d)
      // delete markers: drop qualifier 'click' for every 11th user
      val afterDelete = v.where(
        !(pmod(col("rowkey"), lit(11)) === 0 && col("qualifier") === "click"))
      val afterTtl = Mutations.ttlExpireMinVersions(afterDelete, "15 DAYS", minVersions = 1)
      val kept = graft.kv.Scans.maxVersions(afterTtl, 3)
      val base = tmp("graft_compact", d)
      // once(): every other layout write here is guarded — an
      // unguarded overwrite lets concurrent runs over the same sfDir
      // delete the directory under each other's reads
      once(base) {
        Layout.writeSorted(
          kept.select("rowkey", "qualifier", "ts", "value", "event_id"),
          "rowkey", base)
      }
      Layout.read(s, base).orderBy("event_id")
    }),
    "bucket_join" -> ((s, d) => {
      val sfx = dirKey(d)
      val (ot, lt) = (s"orders_bkt_$sfx", s"lineitem_bkt_$sfx")
      Layout.ensureBucketed(Tables.load(s, d, "orders")
        .select("o_orderkey", "o_totalprice"), "o_orderkey", 8, ot)(s)
      Layout.ensureBucketed(Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_quantity"), "l_orderkey", 8, lt)(s)
      val (o, l) = (s.table(ot), s.table(lt))
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy("o_orderkey")
    }),
    // Exchange-free AGGREGATE on the bucketed layout (the other half
    // of the co-located story bucket_join tells for joins): grouping
    // by the bucket key, the scan's hash distribution already
    // satisfies the aggregate — zero hash exchanges in the plan
    // (asserted in spec; the orderBy's range exchange over the result
    // is the only shuffle). At 100 TB this is the difference between
    // re-shuffling the fact table per rollup and reading it in place.
    "bucket_agg" -> ((s, d) => {
      val sfx = dirKey(d)
      val lt = s"lineitem_bkt_$sfx"
      Layout.ensureBucketed(Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_quantity"), "l_orderkey", 8, lt)(s)
      s.table(lt)
        .where(col("l_orderkey") < 5000)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy("l_orderkey")
    }),
    // SnapshotInfo (hbase-server/.../snapshot/SnapshotInfo.java — the
    // admin tool answering "what does this snapshot hold, and how much
    // of it is shared?"): copy-on-write means rows unchanged between
    // versions sit in files both snapshots reference, so the
    // shared/unique split is the snapshot's real storage cost. Per
    // version: row count, rows shared with the other version, rows
    // unique to it — one full outer key join + ONE aggregate whose
    // single row explodes into the 2-row report (no double evaluation
    // of the join subtree). Physical file counts are layout metadata,
    // spec-asserted rather than oracled.
    "snapshot_info" -> ((s, d) => {
      val base = ensureSnapshots(s, d)
      val v1 = Snapshots.read(s, base, 1)
        .select(col("event_id"), lit(1L).as("_a"))
      val v2 = Snapshots.read(s, base, 2)
        .select(col("event_id"), lit(1L).as("_b"))
      v1.join(v2, Seq("event_id"), "full_outer")
        .agg(
          sum(coalesce(col("_a"), lit(0L))).as("n1"),
          sum(coalesce(col("_b"), lit(0L))).as("n2"),
          sum(when(col("_a").isNotNull && col("_b").isNotNull, 1L)
            .otherwise(0L)).as("ns"))
        .select(explode(array(
          struct(lit(1).as("version"), col("n1").as("n_rows"),
            col("ns").as("n_shared"), (col("n1") - col("ns")).as("n_unique")),
          struct(lit(2).as("version"), col("n2").as("n_rows"),
            col("ns").as("n_shared"), (col("n2") - col("ns")).as("n_unique"))
        )).as("r"))
        .select("r.*")
        .orderBy("version")
    }),
  )

  val oracles: Map[String, String] = Map(
    "snapshot_read" ->
      "SELECT event_id, user_id, event_type, ts, value FROM events ORDER BY event_id",
    // the export is a byte copy, so both sides carry the source digest
    // and every bucket matches
    "export_snapshot" ->
      """WITH h AS (
        |  SELECT user_id // 10 AS bucket,
        |         CAST(sum(((event_id % 2147483648) * 2654435761) % 4294967296
        |             + CAST(floor(value * 100) AS BIGINT)
        |             + CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS digest,
        |         count(*) AS n FROM events GROUP BY 1)
        |SELECT bucket, digest AS digest_a, n AS rows_a,
        |       digest AS digest_b, n AS rows_b, true AS is_match
        |FROM h ORDER BY bucket""".stripMargin,
    "snapshot_diff" ->
      """SELECT event_id, 'removed' AS change FROM events
        |WHERE user_id % 2 = 0 ORDER BY event_id""".stripMargin,
    // the rollback audit mirror: deletes resurrect, surviving %7
    // updates revert, %9 re-inserts (ids offset 10^9) are discarded
    "restore_snapshot" ->
      """SELECT event_id, 'resurrected' AS change FROM events
        |WHERE user_id % 2 = 0
        |UNION ALL
        |SELECT event_id, 'reverted_update' FROM events
        |WHERE user_id % 2 <> 0 AND user_id % 7 = 0
        |UNION ALL
        |SELECT event_id + 1000000000, 'discarded_insert' FROM events
        |WHERE user_id % 2 <> 0 AND user_id % 9 = 0
        |ORDER BY event_id""".stripMargin,
    // v1 is the events snapshot, so the direct region-file scan must
    // equal the plain range filter over the base table
    "snapshot_scan_direct" ->
      """SELECT event_id, user_id, event_type, ts, value FROM events
        |WHERE user_id >= 3 AND user_id < 8 ORDER BY event_id""".stripMargin,
    // v1 = the events snapshot, v2 = the copy-on-write state after
    // deleting even users; the multi-snapshot scan is their union
    // restricted to the key range, tagged by source snapshot
    "multi_snapshot_scan" ->
      """SELECT event_id, user_id, event_type, ts, value, 'v1' AS snapshot
        |FROM events WHERE user_id >= 3 AND user_id < 8
        |UNION ALL
        |SELECT event_id, user_id, event_type, ts, value, 'v2' AS snapshot
        |FROM events WHERE user_id >= 3 AND user_id < 8 AND user_id % 2 <> 0
        |ORDER BY snapshot, event_id""".stripMargin,
    // the clone's only divergence from its origin is its own mutation
    "snapshot_clone" ->
      """SELECT event_id, 'changed' AS change FROM events
        |WHERE user_id % 5 = 0 ORDER BY event_id""".stripMargin,
    "region_split_stats" ->
      """WITH b AS (SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi FROM lineitem)
        |SELECT CAST(floor((l_orderkey - lo) * 16 / (hi - lo + 1)) AS BIGINT) AS region,
        |       count(*) AS n_rows, min(l_orderkey) AS start_key, max(l_orderkey) AS end_key,
        |       round(sum(l_quantity), 4) AS sum_v
        |FROM lineitem, b GROUP BY 1 ORDER BY region""".stripMargin,
    "bucket_join" ->
      """SELECT o_orderkey, o_totalprice, count(*) AS n_items,
        |       round(sum(l_quantity), 4) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey""".stripMargin,
    "bucket_agg" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |       round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem WHERE l_orderkey < 5000
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "major_compaction" ->
      ("WITH " + Tables.eventCellsSql + s""",
         |af AS (SELECT * FROM vcells WHERE NOT (rowkey % 11 = 0 AND qualifier = 'click')),
         |ttl AS (SELECT *, row_number() OVER (PARTITION BY rowkey, family, qualifier
         |                                     ORDER BY ts DESC, event_id DESC) AS rn
         |        FROM af),
         |keep1 AS (SELECT * FROM ttl
         |          WHERE ts >= (SELECT max(ts) - INTERVAL 15 DAY FROM af) OR rn <= 1),
         |ranked AS (SELECT rowkey, qualifier, ts, value, event_id,
         |                  row_number() OVER (PARTITION BY rowkey, family, qualifier
         |                                     ORDER BY ts DESC, event_id DESC) AS rn2
         |           FROM keep1)
         |SELECT rowkey, qualifier, ts, value, event_id FROM ranked
         |WHERE rn2 <= 3 ORDER BY event_id""".stripMargin),
    // v1 = the full events snapshot, v2 = after deleting even users,
    // so shared = v2's rows and each side's unique count follows
    "snapshot_info" ->
      """WITH n AS (SELECT (SELECT count(*) FROM events) AS n1,
        |                  (SELECT count(*) FROM events WHERE user_id % 2 <> 0) AS n2)
        |SELECT 1 AS version, n1 AS n_rows, n2 AS n_shared,
        |       n1 - n2 AS n_unique FROM n
        |UNION ALL
        |SELECT 2, n2, n2, 0 FROM n ORDER BY version""".stripMargin,
  )
}
