package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kv.Mutations

/** SURVEY §2F — snapshots and region metadata as verified queries. */
object SnapshotQueries {

  /** Per-sfDir temp path (concurrent runs over different SFs isolate). */
  private def tmp(name: String, sfDir: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/" + name + "_" +
      Integer.toHexString(sfDir.hashCode)

  /** Per-region stats: regions = n equal key ranges (the split table)
    * — the total-order bucketing from analytics.Tools with a payload
    * aggregate, renamed to region vocabulary. */
  def regionStats(df: DataFrame, keyCol: String, n: Int, valueCol: String): DataFrame =
    graft.analytics.Tools.totalOrderBuckets(df, keyCol, n,
        extraAggs = Seq(round(sum(col(valueCol)), 4).as("sum_v")),
        bucketName = "region")
      .withColumnRenamed("min_key", "start_key")
      .withColumnRenamed("max_key", "end_key")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snapshot_read" -> ((s, d) => {
      val base = tmp("graft_snapshots", d)
      val ev = Tables.load(s, d, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
      // v1 = snapshot; v2 = post-mutation state written copy-on-write.
      Snapshots.write(ev, "user_id", base, 1)
      val v2 = Mutations.deleteRows(ev,
        ev.where(col("user_id") % 2 === 0).select("user_id"), "user_id")
      Snapshots.write(v2, "user_id", base, 2)
      // the point-in-time read: v1 must be byte-identical to the original
      Snapshots.read(s, base, 1).orderBy("event_id")
    }),
    "region_split_stats" -> ((s, d) =>
      regionStats(Tables.load(s, d, "lineitem"), "l_orderkey", 16, "l_quantity")
        .orderBy("region")),
    // the 100 TB fact-fact join story: both sides written bucketed on
    // the join key into the same bucket count, so the SortMergeJoin (and
    // the groupBy on the same key) run with ZERO Exchange — the
    // co-located join HBase gets from co-partitioned regions.
    // Plan-asserted (no shuffle) in LayoutSpec; verified vs oracle here.
    "bucket_join" -> ((s, d) => {
      val sfx = Integer.toHexString(d.hashCode)
      val (ot, lt) = (s"orders_bkt_$sfx", s"lineitem_bkt_$sfx")
      Layout.writeBucketed(Tables.load(s, d, "orders")
        .select("o_orderkey", "o_totalprice"), "o_orderkey", 8, ot)
      Layout.writeBucketed(Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_quantity"), "l_orderkey", 8, lt)
      val (o, l) = (s.table(ot), s.table(lt))
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy("o_orderkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "snapshot_read" ->
      "SELECT event_id, user_id, event_type, ts, value FROM events ORDER BY event_id",
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
  )
}
