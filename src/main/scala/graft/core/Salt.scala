package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (the HBase analogue: a hot row/region
  * that one regionserver absorbs; on Spark, a shuffle key whose
  * partition dominates the stage).
  *
  * `saltedAggregate` is the classic two-phase form: append a salt to
  * the group key, aggregate the salted key (spreads one hot key over
  * `salts` reducers), then aggregate the partials without the salt.
  * Correct for any algebraic aggregate (sum/count/min/max — supply the
  * partial and merge forms). AQE's skew-join handling covers joins;
  * this covers aggregations, which AQE does not re-balance.
  */
object Salt {

  /** Two-phase salted aggregation.
    *
    * @param partials salted-phase aggregates, e.g.
    *                 `Seq(sum("v").as("s"), count(lit(1)).as("c"))`
    * @param merges   merge-phase aggregates over the partial columns,
    *                 e.g. `Seq(sum("s").as("sum_v"), sum("c").as("n"))`
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merges.head, merges.tail: _*)
  }
}
