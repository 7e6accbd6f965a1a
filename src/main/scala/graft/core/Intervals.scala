package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** ONE copy of the interval-literal splice every duration-taking
  * operator uses (TTLs, replica lags, watermark horizons, funnel
  * windows). The caller's string lands inside generated SQL, so it is
  * validated against the interval-literal grammar first — a free-form
  * value would otherwise reach the parser as an arbitrary SQL fragment
  * instead of failing loudly with a named error (the same discipline
  * as the dqAudit identifier rule for column splices).
  *
  * Grammar: one or more `<n> <unit>` groups — so the multi-unit
  * literals ("1 DAY 2 HOURS") Spark's own INTERVAL parser accepts
  * pass through (the first r11 cut accepted only a single group,
  * silently narrowing every duration-taking operator's input
  * language — the r12 ADVICE catch). A fraction is allowed ONLY on
  * SECONDS ("1.5 SECONDS"), exactly the multi-unit parser's own rule
  * (INVALID_INTERVAL_FORMAT.INVALID_FRACTION for every other unit) —
  * the guard rejects "0.5 HOURS" with a named error instead of
  * letting the parser's throw replace it. Still only digits, dots
  * and unit words reach the parser.
  */
object Intervals {
  private val Lit =
    ("(?i)\\s*(\\d+\\s+(microsecond|millisecond|minute|hour|day|week|month|year)s?\\s*" +
      "|\\d+(\\.\\d+)?\\s+seconds?\\s*)+").r

  def literal(s: String): Column = {
    require(s != null && Lit.matches(s),
      s"interval '$s' must be interval literal groups like '10 DAYS' or '1 DAY 12 HOURS'")
    expr(s"INTERVAL $s")
  }
}
