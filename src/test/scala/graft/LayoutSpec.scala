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

  test("snapshot versions are immutable point-in-time reads") {
    val dir = Files.createTempDirectory("graft_snap").toString
    val v1 = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    Snapshots.write(v1, "o_orderkey", dir, 1)
    Snapshots.write(v1.where(col("o_orderkey") % 2 === 0), "o_orderkey", dir, 2)
    assert(Snapshots.read(spark, dir, 1).count() == v1.count())
    assert(Snapshots.read(spark, dir, 2).count() < v1.count())
  }
}
