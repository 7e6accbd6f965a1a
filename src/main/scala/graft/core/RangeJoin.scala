package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join without an equi-key, expressed as an equi-join
  * on time bins — the scale-safe form of `fact.ts BETWEEN w.lo AND
  * w.hi`.
  *
  * Catalyst has no hash strategy for a pure range predicate: the
  * declarative form plans as BroadcastNestedLoopJoin (every fact row
  * tested against every window — O(F·W) compares, and a driver OOM once
  * the window side outgrows the broadcast threshold). Binning restores
  * an equi-key: each window explodes over the bins it covers, facts
  * compute their bin in place, the join is an ordinary shuffled hash /
  * sort-merge join on `_bin`, and the exact BETWEEN runs as a
  * post-join filter on the tiny per-bin candidate set. Work is
  * O(F + W·bins_per_window + candidates) — the 100 TB shape, assuming
  * `binSeconds` is chosen near the typical window length so a window
  * covers O(1) bins.
  *
  * Reference semantics analogue: time-range scans narrowed by store
  * files' time ranges (hbase-server/.../StoreFile.java:1205's
  * passesTimerangeFilter) — the same "prune by coarse time bucket,
  * verify exactly" two-phase shape.
  *
  * Correctness of the bin prune: both sides bin by truncated epoch
  * seconds (`unix_timestamp` floors toward −∞ for non-negative epochs,
  * and `div` is floor division), and truncation + floor-div are
  * monotone, so lo ≤ ts ≤ hi implies bin(lo) ≤ bin(ts) ≤ bin(hi) — no
  * candidate is ever pruned that the exact filter would keep.
  *
  * A window spanning more than `maxBinsPerWindow` bins fails loudly
  * (the sequence explode is the one place this operator could amplify
  * data quadratically; a mis-sized bin must not silently produce a
  * billion-row window side).
  */
object RangeJoin {

  /** Join `facts` to every window whose `[loCol, hiCol]` interval
    * (inclusive both ends) contains `facts(tsCol)`. Returns the fact
    * columns plus the window's columns except its bounds. */
  def rangeJoinBinned(facts: DataFrame, tsCol: String,
                      windows: DataFrame, loCol: String, hiCol: String,
                      binSeconds: Long,
                      maxBinsPerWindow: Int = 10000): DataFrame = {
    require(binSeconds >= 1, s"binSeconds ($binSeconds) must be at least 1")
    // the dqAudit identifier rule for column splices (Hashes.md5Fold60 /
    // Tables.toCells apply the same guard): these names land inside
    // generated SQL, and a backtick-bearing name would re-tokenize it
    Seq(tsCol, loCol, hiCol).foreach(c =>
      Hashes.requireIdentifier(c, "rangeJoinBinned column"))
    val loBin = expr(s"unix_timestamp(`$loCol`) div $binSeconds")
    val hiBin = expr(s"unix_timestamp(`$hiCol`) div $binSeconds")
    // a NULL bound is a malformed window, not an oversized one: it
    // explodes to zero bins and drops (the row could never satisfy the
    // exact [lo, hi] filter anyway) — without the isNotNull arm the
    // null span would fall into raise_error, whose concat'd message
    // is itself null, killing the job with a message-less error
    // an INVERTED window (hi < lo) joins the null arm too: the row can
    // never satisfy lo <= ts <= hi, and Spark's sequence(start, stop)
    // would otherwise generate a DESCENDING run — a negative span also
    // passes the `< maxBinsPerWindow` check, so one corrupted row
    // could explode to epoch-scale bins instead of dropping
    val guarded =
      when(loBin.isNull || hiBin.isNull || hiBin < loBin,
        lit(null).cast("bigint"))
        .when(hiBin - loBin < maxBinsPerWindow, hiBin)
        .otherwise(raise_error(concat(lit("rangeJoinBinned: window spans "),
          (hiBin - loBin + 1).cast("string"),
          lit(s" bins (max $maxBinsPerWindow); raise binSeconds"))))
    val wb = windows.withColumn("_bin", explode(sequence(loBin, guarded)))
    facts
      .withColumn("_bin", expr(s"unix_timestamp(`$tsCol`) div $binSeconds"))
      .join(wb, Seq("_bin"))
      .where(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("_bin", loCol, hiCol)
  }
}
