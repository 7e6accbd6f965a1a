package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native equivalents of HBase's server-side aggregation
  * coprocessor (hbase-server/.../coprocessor/AggregateImplementation.java;
  * client: hbase-client/.../client/coprocessor/AggregationClient.java).
  *
  * In HBase each region computes a partial (max/min/sum/count/avg parts/
  * std parts) and the client merges — exactly Spark's partial-aggregation
  * model, so `groupBy().agg()` with built-in functions is the faithful
  * *and* optimal translation (map-side combine per partition ≈ per-region
  * partials; final merge in the reduce stage ≈ AggregationClient).
  */
object Aggregates {

  /** getMax (AggregateImplementation.java:74) / getMin (:129). */
  def minMax(df: DataFrame, c: String): DataFrame =
    df.agg(min(col(c)).as("min_v"), max(col(c)).as("max_v"))

  /** getSum (:182) + getAvg (:293). Avg in HBase is sum/rowcount merged
    * client-side — identical to Spark's partial avg. */
  def sumAvg(df: DataFrame, c: String): DataFrame =
    df.agg(round(sum(col(c)), 4).as("sum_v"), round(avg(col(c)), 4).as("avg_v"))

  /** getStd (:353) — population std (sqrt(E[x²] − E[x]²) in the
    * reference's client-side merge). */
  def std(df: DataFrame, c: String): DataFrame =
    df.agg(round(stddev_pop(col(c)), 4).as("std_v"))

  /** getMedian (:418) — the reference does a two-pass exact median
    * (sum pass, then re-scan to the weighted midpoint). Spark-side we
    * use exact `percentile` (interpolated), plus the weighted variant
    * below for parity with the weight-column mode. */
  def median(df: DataFrame, c: String): DataFrame =
    df.agg(round(expr(s"percentile($c, 0.5)"), 4).as("median_v"))

  /** Weighted median (AggregateImplementation.java:418 with a weight
    * column): smallest value v such that the cumulative weight of all
    * rows ≤ v reaches half the total weight. Two-phase: window
    * cumulative sum + global total, both shuffle-on-sort once. */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String): DataFrame = {
    val w = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = df.select(col(valueCol), col(weightCol))
      .withColumn("_cum", sum(col(weightCol)).over(w))
    val half = df.agg((sum(col(weightCol)) / 2).as("_half"))
    withCum.crossJoin(broadcast(half))
      .where(col("_cum") >= col("_half"))
      .agg(min(col(valueCol)).as("wmedian_v"))
  }

  /** All coprocessor aggregates, grouped by dimensions — the
    * GroupingTableMapper (hbase-server/.../mapreduce/GroupingTableMapper
    * .java) + AggregationClient composition, i.e. the flagship query. */
  def grouped(df: DataFrame, keys: Seq[String], c: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(c)).as("min_v"),
        max(col(c)).as("max_v"),
        round(sum(col(c)), 4).as("sum_v"),
        round(avg(col(c)), 4).as("avg_v"),
        round(stddev_pop(col(c)), 4).as("std_v"),
        round(expr(s"percentile($c, 0.5)"), 4).as("median_v"))
      .orderBy(keys.map(col): _*)
}
