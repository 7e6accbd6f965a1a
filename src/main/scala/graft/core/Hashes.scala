package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod}

/** ONE copy of the engine-portable Knuth multiplicative row hash the
  * digest/sampling operators share (sync digests, random-row filters,
  * stratified samplers). Fold into [0, 2^31) BEFORE the golden-ratio
  * multiply so the product stays under Long.MaxValue
  * (2^31 · 2654435761 ≈ 5.7e18) for ANY key — no ANSI
  * ARITHMETIC_OVERFLOW at 100 TB key ranges — and pmod (never %) so
  * negative keys land in the canonical residue; DuckDB mirrors it as
  * `((k % 2147483648) * 2654435761) % 4294967296` on non-negative
  * keys and the `((k % m + m) % m)` form where keys can be negative.
  * Four modules hand-rolled this identically before r11; a fix that
  * must be hand-synced through four files is how the r10 dirKey
  * divergence happened. */
object Hashes {
  def knuth(key: Column): Column = knuth(key, 0L)

  /** Salted form for COMPOSED sampling stages: every consumer of the
    * unsalted hash draws the same [0, 2³²) order over keys, so a
    * second sampling pass over a first pass's survivors is fully
    * CORRELATED with it (the survivors all hash below the first
    * threshold, and the second stage's per-source keep fractions skew
    * accordingly — the r12 review's nested-sampler finding). A
    * distinct salt per stage decorrelates the orders while keeping
    * every engine/run/partitioning reproducible. Salt folds to
    * [0, 2³⁰) so (2³¹ + 2³⁰)·2654435761 stays under Long.MaxValue;
    * the DuckDB mirror is
    * `((((k % m + m) % m) + salt) * 2654435761) % 4294967296`. */
  def knuth(key: Column, salt: Long): Column =
    pmod((pmod(key, lit(2147483648L)) + lit(((salt % 1073741824L) + 1073741824L) % 1073741824L))
      * lit(2654435761L), lit(4294967296L))

  /** ONE copy of the md5 → 60-bit fold → mod split/shard hash
    * (content-independent, stable across runs/engines — unlike
    * hash()/xxhash64, whose seeds are Spark-private). 15 hex chars =
    * 60 bits, always non-negative in a long. Previously hand-rolled
    * identically in splitLeakageSafe AND shuffle_shard (the r10
    * dirKey hand-sync class this object exists to prevent, r12
    * review). `keyCol` is spliced into SQL — identifier rule applies.
    * DuckDB mirror:
    * `CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT) % mod`. */
  /** ONE copy of the SQL-splice identifier guard (r13 review: the
    * identical require was hand-rolled at ten sites across five files
    * — the r10 dirKey hand-sync class this object exists to prevent).
    * Returns the name so call sites can splice inline. */
  def requireIdentifier(name: String, context: String): String = {
    require(name != null && name.matches("[A-Za-z0-9_]+"),
      s"$context: identifier '$name' must match [A-Za-z0-9_]+ — " +
        "it is spliced into generated SQL")
    name
  }

  def md5Fold60(keyCol: String, mod: Int): org.apache.spark.sql.Column = {
    requireIdentifier(keyCol, "md5Fold60 key")
    require(mod >= 1, s"md5Fold60 mod ($mod) must be positive")
    org.apache.spark.sql.functions.expr(
      "cast(conv(substring(md5(cast(cast(" +
        s"`$keyCol` as string) as binary)), 1, 15), 16, 10) as bigint) % $mod")
  }
}
