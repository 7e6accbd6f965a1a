package graft

import org.apache.spark.sql.functions._
import graft.core.{Salt, Tables}

/** Explain-audit: the plans the 100 TB story depends on, asserted so a
  * regression (lost pushdown, surprise sort, cartesian product) fails
  * CI rather than surfacing as a cluster incident. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString()

  test("scan_range: rowkey range + projection reach the parquet scan") {
    val p = plan("scan_range")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThanOrEqual(o_orderkey,1000), LessThan(o_orderkey,2000)"), p)
    assert(!p.contains("o_orderdate"), "projection not pruned")
  }

  test("multi_get: IN-list is a pushed predicate, no join") {
    val p = plan("multi_get")
    assert(p.contains("PushedFilters: [In(o_orderkey"), p)
    assert(!p.contains("Join"), p)
  }

  test("scan_reversed compiles to TakeOrderedAndProject (top-N, not global sort)") {
    val p = plan("scan_reversed")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("agg_grouped: single hash aggregate with map-side partials") {
    val p = plan("agg_grouped")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("whileMatch: threshold side is broadcast, not shuffled") {
    val p = plan("filter_while_match")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("weighted median plan has no unpartitioned window over the data") {
    val df = graft.agg.Aggregates.weightedMedian(
      Tables.load(spark, sfDir, "lineitem"), "l_extendedprice", "l_quantity")
    val p = df.queryExecution.executedPlan.toString()
    // every window must carry a partition spec (the final in-bucket
    // window partitions by _b; nothing windows the whole table)
    val windowSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windowSpecs.nonEmpty)
    windowSpecs.foreach(l => assert(l.contains("_b"), s"unpartitioned window: $l"))
  }

  test("salted aggregation matches direct aggregation") {
    import spark.implicits._
    val df = Tables.load(spark, sfDir, "lineitem")
    val direct = df.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").as[(String, Double, Long)].collect()
    val salted = Salt.saltedAggregate(df, Seq("l_returnflag"), salts = 8,
        partials = Seq(sum("l_quantity").as("s"), count(lit(1)).as("c")),
        merges = Seq(sum("s").as("sum_v"), sum("c").as("n")))
      .orderBy("l_returnflag").as[(String, Double, Long)].collect()
    assert(salted.map(_._1).sameElements(direct.map(_._1)))
    salted.zip(direct).foreach { case ((_, s1, n1), (_, s2, n2)) =>
      assert(n1 == n2 && math.abs(s1 - s2) < 1e-6)
    }
  }

  test("custom Expressions registered as SQL functions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       fuzzy_match('abc99', 'a?c') AS f,
        |       simhash64(array(named_struct('h', 5L, 'cnt', 2L))) AS s,
        |       minhash_sig(array(7L, 11L), 4) AS m""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getBoolean(1))
    assert(r.getLong(2) != 0L)
    assert(r.getSeq[Long](3).length == 4)
  }

  test("ParseFilter extended grammar: ranges, multi-prefix, fuzzy, long comparator") {
    import spark.implicits._
    val cells = Seq(
      ("101", "f", "aa", "5"), ("101", "f", "bb", "6"),
      ("202", "f", "cc", "7"), ("1x3", "f", "dd", "8")
    ).toDF("rowkey", "family", "qualifier", "value")
    def run(s: String): Set[String] =
      cells.where(graft.filters.ParseFilter.parse(s))
        .select("rowkey").distinct().as[String].collect().toSet
    assert(run("MultipleColumnPrefixFilter('aa', 'cc')") == Set("101", "202"))
    assert(run("ColumnRangeFilter('bb', true, 'cc', false)") == Set("101"))
    assert(run("FuzzyRowFilter('1?3')") == Set("1x3"))
    assert(run("ValueFilter(>=, 'long:7')") == Set("202", "1x3"))
  }
}
