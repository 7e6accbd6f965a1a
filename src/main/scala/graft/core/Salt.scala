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

  /** The salted-ROWKEY pattern — the write-hotspot fix every HBase
    * schema guide prescribes for monotonically increasing keys (a
    * sequential key writes to ONE region; prefixing a small salt
    * spreads ingest over `salts` regions): stored key =
    * `salt + "-" + zero-padded key`, salt = key mod salts. Engine-
    * portable (modulo + lpad) so oracles rebuild it exactly. */
  def saltedKey(key: Column, salts: Int, width: Int = 12): Column = {
    require(salts >= 1, s"salts ($salts) must be at least 1")
    // the same bound saltedRangeScan enforces: a width-19 layout would
    // WRITE fine and then be permanently unscannable through the API
    // (discovered only at read time) — the write side must refuse the
    // widths the read side refuses
    require(width >= 1 && width <= 18,
      s"width ($width) must be in [1, 18] — 10^width must fit a Long")
    // lpad TRUNCATES past `width`, which would silently collide keys,
    // and a NEGATIVE key ("-5" lpads to "000…0-5") sorts out of
    // numeric order — either silently breaks the scan-bound format
    // saltedRangeScan relies on (it requires start >= 0), so refuse
    // loudly (the guard is a codegen'd branch, free on the valid path)
    // NORMALIZE on the STRING rendering (casting to string never
    // throws, unlike ANSI numeric casts on malformed input, so every
    // refusal carries THIS guard's diagnostic): strip an integral
    // fraction tail ("7.0" → "7" — a double/decimal-typed integral
    // key stores the identical key as the bigint) and leading zeros
    // ("007" → "7" — zero-padded string keys are fine, and stripping
    // keeps a 13-zero-padded 7 from silently lpad-TRUNCATING to key
    // 0). What survives must be pure digits: fractional values
    // ("5.5" — truncation would collide distinct keys), negatives,
    // scientific double renderings ("7.0E10" — use a bigint key), and
    // unparseable strings all refuse loudly.
    val digits = regexp_replace(
      regexp_replace(key.cast("string"), "\\.0+$", ""), "^0+(?=.)", "")
    // ≤18 digits always fits a Long, so the salt cast below is safe
    val valid = digits.rlike("^[0-9]{1,18}$") && length(digits) <= width
    // coalesce in the MESSAGE: a NULL key would turn raise_error's
    // diagnostic into a message-less abort — the exact opacity this
    // guard exists to avoid
    val guarded = when(valid, digits).otherwise(
      raise_error(concat(lit("saltedKey: key "),
        coalesce(key.cast("string"), lit("NULL")),
        lit(s" must be a non-negative integer of at most $width digits"))))
    // salt from the NORMALIZED value so the prefix is always an
    // integer rendering (pmod on a raw string/double key coerces to
    // double and prefixes "3.0-", a format no saltedRangeScan bound
    // ever matches); the otherwise-arm value is never stored — the
    // guarded lpad raises first on invalid rows
    val norm = when(valid, digits).otherwise(lit("0")).cast("bigint")
    concat_ws("-", pmod(norm, lit(salts.toLong)).cast("string"),
      lpad(guarded, width, "0"))
  }

  /** The read-side price of rowkey salting: a range scan on the
    * ORIGINAL key becomes `salts` per-prefix range scans — here ONE
    * disjunctive predicate on the stored sorted key, which Catalyst
    * pushes to the scan (each disjunct min/max-prunes its salt's key
    * range, exactly the per-region scanner fan-out an HBase client
    * runs), no shuffle, no post-hoc reparse of the key. */
  def saltedRangeScan(df: DataFrame, saltedKeyCol: String, salts: Int,
                      start: Long, stop: Long, width: Int = 12): DataFrame = {
    require(salts >= 1, s"salts ($salts) must be at least 1")
    require(start >= 0 && stop >= start, s"bad range [$start, $stop)")
    // 10^width must itself be a representable Long or maxExclusive
    // silently saturates (math.pow → Long.MaxValue for width ≥ 19) and
    // the whole-keyspace carve-out plus the start guard below compare
    // against the wrong value; 18 is the widest long-exact power of 10
    require(width >= 1 && width <= 18,
      s"width ($width) must be in [1, 18] — 10^width must fit a Long")
    // bounds past the pad width would format wider than stored keys
    // and silently match nothing — same contract saltedKey enforces.
    // stop == 10^width is allowed as "whole keyspace above start": the
    // maximum storable key is 10^width − 1, and with the exclusive
    // stop bound it would otherwise be UNREACHABLE by any valid scan —
    // that case becomes an inclusive <= on the max representable key.
    val maxExclusive = math.pow(10, width).toLong
    require(stop.toString.length <= width || stop == maxExclusive,
      s"range bound $stop wider than $width digits — widen `width`")
    // start must itself be a REPRESENTABLE key: start == 10^width
    // would format a width+1-digit lower bound that compares above
    // most stored keys lexicographically — the 'empty' range
    // [10^width, 10^width) would silently match nearly everything
    require(start < maxExclusive,
      s"range start $start is past the widest $width-digit key")
    def bound(s: Int, k: Long): String = {
      val p = k.toString
      s.toString + "-" + ("0" * (width - p.length)) + p
    }
    val pred = (0 until salts).map { s =>
      val lo = col(saltedKeyCol) >= bound(s, start)
      if (stop == maxExclusive)
        lo && col(saltedKeyCol) <= bound(s, maxExclusive - 1)
      else lo && col(saltedKeyCol) < bound(s, stop)
    }.reduce(_ || _)
    df.where(pred)
  }

  /** Two-phase salted aggregation.
    *
    * Caveats of the content-derived salt (deliberate trade-offs):
    *  - EXACT duplicate rows of a hot key hash to one salt, so they
    *    collapse into a single (key, salt) partial — skew mitigation
    *    degrades precisely on heavily-duplicated hot rows. If the
    *    caller has a distinguishing column (an event id, an offset),
    *    pre-project it into the row before calling so duplicates
    *    spread; with none, the collapse is the price of determinism.
    *  - `xxhash64` rejects MapType columns at analysis time; project
    *    maps away (or to `map_entries(...)`) before salting.
    *
    * @param partials salted-phase aggregates, e.g.
    *                 `Seq(sum("v").as("s"), count(lit(1)).as("c"))`
    * @param merges   merge-phase aggregates over the partial columns,
    *                 e.g. `Seq(sum("s").as("sum_v"), sum("c").as("n"))`
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    // its three siblings all guard this; salts = 0 would make pmod
    // yield NULL salts — one partial per key, the exact unsalted
    // hot-partition skew this function exists to prevent, silently
    require(salts >= 1, s"salts ($salts) must be at least 1")
    // salt from row CONTENT, never monotonically_increasing_id: the id
    // is nondeterministic under partial stage recompute (a lost map
    // task re-salts its rows differently, and a row merged into two
    // different (key, salt) partials double-counts in phase 2 — the
    // same determinism discipline saltedJoin documents for saltOf).
    // Identical rows share a salt; they only narrow the spread, never
    // break correctness.
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merges.head, merges.tail: _*)
  }

  /** Explicit salted JOIN for a skewed fact key: facts take a
    * deterministic salt in [0, salts), the (small) dim side replicates
    * `salts`× so the join key becomes (key, salt) — one hot key's rows
    * spread over `salts` reducers instead of one. Result set is
    * IDENTICAL to the unsalted join (each fact row meets exactly the
    * one dim replica carrying its salt).
    *
    * When to reach for it: AQE re-splits skewed SORT-MERGE join
    * partitions automatically, but salting is the portable fix for the
    * paths AQE cannot re-balance — streaming stateful joins (state is
    * hash-partitioned by key for the stream's lifetime), bucketed
    * tables (layout fixed at write), or a deliberately-pinned
    * partitioning reused across stages. The salt must be deterministic
    * per fact ROW (here: a row-id mod — NOT the key, which would just
    * rename the hot partition). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 salts: Int, saltOf: Column): DataFrame = {
    require(salts >= 1, s"salts ($salts) must be at least 1")
    // coalesce before pmod: a NULL saltOf value would give a NULL
    // salt, and the (key, _salt) equi-join silently DROPS the fact
    // row — breaking the identical-to-unsalted contract (r12 core
    // review). Bucket 0 is as good as any: the dim side replicates
    // into every bucket, so the row still meets exactly one replica.
    val saltedFacts = facts.withColumn("_salt",
      pmod(coalesce(saltOf.cast("long"), lit(0L)), lit(salts.toLong)))
    val replicated = dims.withColumn("_salt",
      explode(expr(s"sequence(0L, ${salts - 1}L)")))
    saltedFacts.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
