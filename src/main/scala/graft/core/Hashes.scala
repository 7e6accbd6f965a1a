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
  def knuth(key: Column): Column =
    pmod(pmod(key, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))
}
