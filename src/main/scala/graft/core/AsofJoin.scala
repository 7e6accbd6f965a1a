package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each probe row, the single latest quote
  * row with the same key at or before the probe's timestamp — HBase's
  * `Get.setTimeRange(0, ts) + setMaxVersions(1)` ("newest cell no newer
  * than ts", reference Get.java / TimeRange.java) generalized from one
  * point lookup to a whole-stream join.
  *
  * Scale shape: the naive formulation is a range join
  * (`p.key = q.key AND q.ts <= p.ts` then argmax) — O(|P|·|Q|) per key,
  * the classic 100 TB blow-up. This implementation never builds that
  * pair set: probes and quotes are UNIONED, shuffled ONCE on the key,
  * and a running `max(struct(ts, tiebreak…))` window carries the
  * latest-quote-so-far forward — each input row is touched exactly
  * once after the single shuffle. Quotes sort before probes at equal
  * ts (tag 0 < 1), so "at or before" includes same-instant quotes.
  * Determinism: the quote payload struct leads with (ts, then the
  * caller's columns — put a unique id right after ts), so the running
  * max has a total order.
  */
object AsofJoin {

  /** @param probes    rows asking "what was current as of my ts"
    * @param quotes    rows carrying the versioned state
    * @param key       join key column name (present in both)
    * @param ts        event-time column name (present in both)
    * @param quoteCols quote payload columns returned as `_last` struct
    *                  fields (ts is prepended automatically; make the
    *                  first entry a unique id for a total order).
    * @return the probe rows + `_last` struct (null when no quote at or
    *         before the probe). */
  def asof(probes: DataFrame, quotes: DataFrame, key: String, ts: String,
           quoteCols: Seq[String]): DataFrame = {
    val pcols = probes.columns.toSeq
    val qStruct = struct((col(ts) +: quoteCols.map(col)): _*)
    // NULL-key quotes never match anything: the equi-join this
    // generalizes (p.key = q.key) is never true on NULL, but
    // Window.partitionBy co-locates NULL keys — without this filter a
    // NULL-key probe would silently take a NULL-key quote as _last
    // (r12 core review). NULL-key probes still flow through (alone in
    // their partition) and report _last = null, the no-match verdict.
    // NULL-TS quotes are equally unmatchable ("q.ts <= p.ts" is never
    // true on NULL) but sorted FIRST by the window's null ordering —
    // unfiltered, an undated quote became _last for every probe that
    // had no real quote at-or-before it, instead of the no-match NULL
    // (and asofNearest then mis-resolved its forward arm).
    val qSide = quotes.where(col(key).isNotNull && col(ts).isNotNull).select(
      Seq(col(key).as("_k"), col(ts).as("_t"), lit(0).as("_tag"), qStruct.as("_q")) ++
        pcols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val pSide = probes.select(
      Seq(col(key).as("_k"), col(ts).as("_t"), lit(1).as("_tag"),
        lit(null).cast(qSide.schema("_q").dataType).as("_q")) ++ pcols.map(col): _*)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pSide.unionByName(qSide)
      .withColumn("_last", max(col("_q")).over(w))
      .where(col("_tag") === 1)
      .select((pcols.map(col) :+ col("_last")): _*)
  }

  /** NEAREST-neighbor temporal join (sensor alignment): for each probe,
    * the quote minimizing |Δt| — built as the backward [[asof]] plus a
    * second asof over NEGATED integer timestamps (backward on -t is
    * forward on t), joined on the probe id and resolved by a pure
    * projection. Two single-shuffle passes, never a per-key range join.
    * Ties (equal |Δt|) resolve backward (the earlier quote); equal-ts
    * quotes are reachable from both sides.
    *
    * @param tsUs   integer (µs) event-time column name in both inputs
    * @param probeId unique probe id column (join key between passes)
    * @param quoteId unique quote id column (returned). */
  def asofNearest(probes: DataFrame, quotes: DataFrame, key: String,
                  tsUs: String, probeId: String, quoteId: String): DataFrame = {
    val back = asof(probes, quotes, key, tsUs, Seq(quoteId))
      .select(col(probeId), col("_last").as("_b"))
    val fwd = asof(
        probes.withColumn(tsUs, -col(tsUs)),
        quotes.withColumn(tsUs, -col(tsUs)), key, tsUs, Seq(quoteId))
      .select(col(probeId), col("_last").as("_f"))
    // LEFT joins (r13 review): a NULL probeId never matches an inner
    // equi-join, so its probe row VANISHED from the output even though
    // both asof passes had kept it — breaking the one-output-row-per-
    // probe shape the backward asof establishes. It now surfaces with
    // nn_id/dt_us NULL, the same no-match verdict a quote-less key gets.
    probes.join(back, Seq(probeId), "left").join(fwd, Seq(probeId), "left")
      .withColumn("_bdt", col(tsUs) - col(s"_b.$tsUs"))
      .withColumn("_fdt", -col(s"_f.$tsUs") - col(tsUs))
      .withColumn("nn_id",
        when(col("_b").isNull && col("_f").isNull, lit(null))
          .when(col("_f").isNull, col(s"_b.$quoteId"))
          .when(col("_b").isNull, col(s"_f.$quoteId"))
          .when(col("_bdt") <= col("_fdt"), col(s"_b.$quoteId"))
          .otherwise(col(s"_f.$quoteId")))
      .withColumn("dt_us",
        when(col("_f").isNull, col("_bdt"))
          .when(col("_b").isNull, col("_fdt"))
          .otherwise(least(col("_bdt"), col("_fdt"))))
      .drop("_b", "_f", "_bdt", "_fdt")
  }
}
