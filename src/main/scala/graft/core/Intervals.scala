package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** ONE copy of the interval-literal splice every duration-taking
  * operator uses (TTLs, replica lags, watermark horizons, funnel
  * windows). The caller's string lands inside generated SQL, so it is
  * validated against the simple `<n> <unit>` literal grammar first —
  * a free-form value would otherwise reach the parser as an arbitrary
  * SQL fragment instead of failing loudly with a named error (the
  * same discipline as the dqAudit identifier rule for column
  * splices). */
object Intervals {
  private val Lit =
    "(?i)\\s*\\d+\\s+(microsecond|millisecond|second|minute|hour|day|week|month|year)s?\\s*".r

  def literal(s: String): Column = {
    require(s != null && Lit.matches(s),
      s"interval '$s' must be a simple literal like '10 DAYS'")
    expr(s"INTERVAL $s")
  }
}
