package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Scan-side parallelism helper for CPU-heavy per-row passes.
  *
  * The sf test corpora ship as single flat parquet files (one row
  * group → one scan partition), so any expensive per-row projection —
  * tokenize/shingle, byte-walk decodes, codebook scans — runs on ONE
  * thread regardless of core count, and a `localCheckpoint` pin taken
  * over such a plan freezes the single partition into every consumer
  * (wall ≈ task, the eval_edit_ratio class from the r12 notes). One
  * thin keyed shuffle before the heavy pass (or before the pin)
  * spreads it across the session's shuffle parallelism.
  *
  * The count is EXPLICIT (the session's `spark.sql.shuffle.partitions`
  * — conf-driven, so it scales with deployment rather than a local
  * constant): a countless keyed repartition is fair game for AQE
  * partition coalescing, which sees ~KB of thin rows and folds the
  * exchange back to ONE partition, re-serializing exactly the work
  * the shuffle exists to spread (measured on dedup_embedding: the
  * coalesced form timed the same as no repartition at all; the
  * explicit count ran 3.5× faster).
  *
  * At 100 TB scans arrive many-partitioned and the shuffle is a no-op
  * cost-wise — one row move of keys+payload against the superlinear
  * (per-pair / per-token / per-byte) work it parallelizes; callers
  * whose per-row work is CHEAP should not pay it (the scoredPairs
  * `spread` flag is per-consumer for the same reason).
  */
object Par {
  def spread(df: DataFrame, key: String): DataFrame = spread(df, col(key))

  def spread(df: DataFrame, key: Column): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, key)
}
