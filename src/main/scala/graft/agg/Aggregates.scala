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
    df.agg(round(expr(s"percentile(`$c`, 0.5)"), 4).as("median_v"))

  /** Weighted median (AggregateImplementation.java:418 with a weight
    * column): smallest value v such that the cumulative weight of all
    * rows ≤ v reaches half the total weight.
    *
    * Distributed two-pass form — the reference's own shape (a sum scan,
    * then a re-scan to the weighted midpoint), never a global window:
    *  1. bucket rows by value range (broadcast min/max — no sampling);
    *  2. per-bucket weight sums (B tiny rows) + triangular prefix sum
    *     → the single bucket that straddles half the total weight;
    *  3. exact rows-ordered cumulative ONLY inside that bucket
    *     (a window over one ~N/B-row partition, partition key defined).
    * Every shuffle is hash/bucket-wide; no stage moves N rows to one
    * partition, so the op survives a 100× scale-up. */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String,
                     buckets: Int = 256): DataFrame = {
    // NULL values are excluded up front: least() skips nulls, so an
    // unfiltered null row would land in the LAST bucket with its full
    // weight while also inflating the half-total — a silently shifted
    // median. The weighted median is defined over non-null values.
    val vw = df.select(col(valueCol).as("_v"), col(weightCol).as("_w"))
      .where(col("_v").isNotNull)
    val bounds = vw.agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
      (sum(col("_w")) / 2).as("_half"))
    val bucketed = vw.crossJoin(broadcast(bounds))
      .withColumn("_b", least(
        floor((col("_v") - col("_lo")) / (col("_hi") - col("_lo") + lit(1e-9)) * buckets)
          .cast("int"),
        lit(buckets - 1)))
      .drop("_lo", "_hi", "_half")
    // no cache: the duplicate aggregate subtrees dedupe via ReusedExchange
    // within the one plan, and a cache() here would accumulate entries
    // across repeated query invocations
    val perBucket = bucketed.groupBy("_b").agg(sum(col("_w")).as("_bw"))
    // prefix weight strictly before each bucket: triangular join over B rows
    val prior = perBucket.select(col("_b").as("_b2"), col("_bw").as("_bw2"))
    val withPrior = perBucket.join(prior, col("_b2") < col("_b"), "left")
      .groupBy("_b", "_bw").agg(coalesce(sum(col("_bw2")), lit(0.0)).as("_before"))
    val target = withPrior.crossJoin(broadcast(bounds.select(col("_half"))))
      .where(col("_before") + col("_bw") >= col("_half"))
      .orderBy(col("_b")).limit(1)
      .select(col("_b").as("_tb"), col("_before"), col("_half"))
    val win = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(target), col("_b") === col("_tb"))
      .withColumn("_cum", col("_before") + sum(col("_w")).over(win))
      .where(col("_cum") >= col("_half"))
      .agg(min(col("_v")).as("wmedian_v"))
  }

  /** Bounded-memory scale path for median: percentile_approx keeps a
    * fixed-size sketch per group (the 100 TB-safe form; exact
    * `percentile` buffers every value — oracle-only). */
  def medianApprox(df: DataFrame, c: String): DataFrame =
    df.agg(round(expr(s"percentile_approx(`$c`, 0.5, 10000)"), 4).as("median_v"))

  /** groupBy flagship with the bounded-memory median term. */
  def groupedApprox(df: DataFrame, keys: Seq[String], c: String): DataFrame =
    groupedWith(df, keys, c, expr(s"percentile_approx(`$c`, 0.5, 10000)"))

  /** All coprocessor aggregates, grouped by dimensions — the
    * GroupingTableMapper (hbase-server/.../mapreduce/GroupingTableMapper
    * .java) + AggregationClient composition, i.e. the flagship query.
    * The median term is pluggable so the oracle path (exact) and the
    * bench path (sketch) share every other aggregate. */
  private def groupedWith(df: DataFrame, keys: Seq[String], c: String,
                          medianTerm: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(c)).as("min_v"),
        max(col(c)).as("max_v"),
        round(sum(col(c)), 4).as("sum_v"),
        round(avg(col(c)), 4).as("avg_v"),
        round(stddev_pop(col(c)), 4).as("std_v"),
        round(medianTerm, 4).as("median_v"))
      .orderBy(keys.map(col): _*)

  def grouped(df: DataFrame, keys: Seq[String], c: String): DataFrame =
    groupedWith(df, keys, c, expr(s"percentile(`$c`, 0.5)"))
}
