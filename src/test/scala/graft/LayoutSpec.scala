package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Layout, Snapshots, Tables}

class LayoutSpec extends SparkSpec {

  test("sorted layout: rowkey predicate reaches the parquet scan (region pruning)") {
    val dir = Files.createTempDirectory("graft_layout").toString
    Layout.writeSorted(Tables.load(spark, sfDir, "orders"), "o_orderkey", dir, buckets = 4)
    val scan = Layout.read(spark, dir)
      .where(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000)
      .select("o_orderkey", "o_totalprice")
    val plan = scan.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThanOrEqual(o_orderkey,1000)"),
      s"rowkey range not pushed:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("o_orderdate"),
      "projection not pruned to the selected columns")
    // file-level key ranges are disjoint (regions): every file's [min,max]
    // must not overlap any other's
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import org.apache.spark.sql.functions.sum
    import scala.reflect.io.Directory
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      new Directory(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$t"))
        .deleteRecursively()
    }
    Layout.writeBucketed(Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice"), "o_orderkey", 4, "b_orders")
    Layout.writeBucketed(Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity"), "l_orderkey", 4, "b_lineitem")
    // force the non-broadcast path so the bucketing (not a tiny-table
    // broadcast) is what eliminates the shuffle — at real scale neither
    // side fits in a broadcast anyway
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity"))
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // the join inputs must come straight from the bucketed scans — the
      // only allowed exchange is the one AFTER the join for the groupBy
      val joinSection = p.split("SortMergeJoin", 2)(1)
      assert(!joinSection.contains("Exchange"),
        s"shuffle under the bucketed join:\n$p")
      assert(joined.collect().nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("snapshot versions are immutable point-in-time reads") {
    val dir = Files.createTempDirectory("graft_snap").toString
    val v1 = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    Snapshots.write(v1, "o_orderkey", dir, 1)
    Snapshots.write(v1.where(col("o_orderkey") % 2 === 0), "o_orderkey", dir, 2)
    assert(Snapshots.read(spark, dir, 1).count() == v1.count())
    assert(Snapshots.read(spark, dir, 2).count() < v1.count())
  }
}
