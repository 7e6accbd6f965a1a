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
  * Grammar: one or more whitespace-separated `<n> <unit>` groups — so
  * the multi-unit literals ("1 DAY 2 HOURS") Spark's own INTERVAL
  * parser accepts pass through (the first r11 cut accepted only a
  * single group, silently narrowing every duration-taking operator's
  * input language — the r12 ADVICE catch). The guard mirrors the
  * ANSI parser's OWN restrictions so bad shapes fail with THIS named
  * error, not an unnamed ParseException from inside the plan:
  *  - groups are all year-month (year/month) OR all day-time
  *    (week..microsecond) — ANSI interval types cannot mix;
  *  - a fraction is allowed ONLY on SECONDS ("1.5 SECONDS") —
  *    INVALID_INTERVAL_FORMAT.INVALID_FRACTION everywhere else;
  *  - groups are separated by real whitespace ("1 DAY2 HOURS" is the
  *    parser's error, not two groups).
  * A duplicated unit ("1 DAY 2 DAYS") still reaches the parser and
  * fails there — loud, just not renamed. Only digits, dots and unit
  * words ever reach the parser.
  */
object Intervals {
  private val Lit = {
    val n = "\\d+"
    val ym = s"$n\\s+(?:month|year)s?"
    val dt = s"(?:$n\\s+(?:microsecond|millisecond|minute|hour|day|week)s?" +
      s"|$n(?:\\.\\d+)?\\s+seconds?)"
    (s"(?i)\\s*(?:$ym(?:\\s+$ym)*|$dt(?:\\s+$dt)*)\\s*").r
  }

  def literal(s: String): Column = {
    require(s != null && Lit.matches(s),
      s"interval '$s' must be interval literal groups like '10 DAYS' or '1 DAY 12 HOURS'")
    expr(s"INTERVAL $s")
  }
}
