package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The HBase filter-string DSL (hbase-client/.../filter/ParseFilter.java:52)
  * — the grammar every shell/REST/Thrift user goes through — re-expressed
  * as a recursive-descent parser producing a Catalyst `Column` predicate
  * over the standard cell view (rowkey / family / qualifier / value).
  *
  * Supported grammar (the Column-expressible subset of the reference):
  *
  *   expr    := term ( 'OR' term )*
  *   term    := factor ( 'AND' factor )*
  *   factor  := '(' expr ')' | filter
  *   filter  := Name '(' args ')'
  *
  * Filters: RowFilter(op, cmp) · ValueFilter(op, cmp) ·
  * QualifierFilter(op, cmp) · FamilyFilter(op, cmp) ·
  * PrefixFilter('p') · ColumnPrefixFilter('p') ·
  * MultipleColumnPrefixFilter('p1', 'p2', ...) ·
  * ColumnRangeFilter('min', minInc, 'max', maxInc) ·
  * FuzzyRowFilter('pat') · InclusiveStopFilter('k') ·
  * SingleColumnValueFilter('f','q',op,cmp).
  * Ops: `<  <=  =  !=  >=  >`. Comparators: `binary:` `binaryprefix:`
  * `substring:` `regexstring:` `long:` (ParseFilter.java prefixes).
  * SKIP/WHILE and page-stateful filters carry scanner state and are
  * deliberately not part of the Column grammar (see Filters.skipFilter /
  * whileMatch for the DataFrame-transform forms).
  */
object ParseFilter {
  import CompareOp._

  def parse(s: String): Column = {
    val p = new P(s)
    val c = p.expr()
    p.ws()
    require(p.eof, s"trailing input at ${p.pos}: '${s.drop(p.pos)}'")
    c
  }

  /** Apply a filter string to a cell view. Unlike `df.where(parse(s))`,
    * this works for grammars containing row-level filters
    * (SingleColumnValueFilter compiles to a window expression, which
    * Spark forbids directly inside WHERE): the predicate is
    * materialized as a column first, then filtered on. */
  def filter(df: org.apache.spark.sql.DataFrame, s: String): org.apache.spark.sql.DataFrame =
    df.withColumn("_pf", parse(s)).where(org.apache.spark.sql.functions.col("_pf")).drop("_pf")

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    def peekWord: String = {
      ws()
      val e = s.indexWhere(c => !c.isLetterOrDigit, pos)
      s.substring(pos, if (e < 0) s.length else e)
    }
    def eat(tok: String): Unit = {
      ws()
      require(s.startsWith(tok, pos), s"expected '$tok' at $pos in '$s'")
      pos += tok.length
    }

    def expr(): Column = {
      var c = term()
      while (peekWord == "OR") { eat("OR"); c = c || term() }
      c
    }
    def term(): Column = {
      var c = factor()
      while (peekWord == "AND") { eat("AND"); c = c && factor() }
      c
    }
    def factor(): Column = {
      ws()
      if (!eof && s.charAt(pos) == '(') { eat("("); val c = expr(); eat(")"); c }
      else filter()
    }

    def filter(): Column = {
      val name = peekWord; pos += name.length
      eat("(")
      val c = name match {
        case "PrefixFilter"        => val p = quoted(); col("rowkey").startsWith(p)
        case "ColumnPrefixFilter"  => val p = quoted(); col("qualifier").startsWith(p)
        case "MultipleColumnPrefixFilter" =>
          val ps = scala.collection.mutable.ListBuffer(quoted())
          while ({ ws(); !eof && s.charAt(pos) == ',' }) { eat(","); ps += quoted() }
          ps.map(col("qualifier").startsWith(_)).reduce(_ || _)
        case "ColumnRangeFilter" =>
          val lo = quoted(); eat(","); val loInc = word() == "true"
          eat(","); val hi = quoted(); eat(","); val hiInc = word() == "true"
          Filters.columnRange(lo, loInc, hi, hiInc)
        case "FuzzyRowFilter" =>
          val p = quoted(); Filters.fuzzyRowFilter(col("rowkey"), p)
        case "InclusiveStopFilter" => val k = quoted(); col("rowkey") <= lit(k)
        case "RowFilter"           => cmpFilter(col("rowkey"))
        case "ValueFilter"         => cmpFilter(col("value"))
        case "QualifierFilter"     => cmpFilter(col("qualifier"))
        case "FamilyFilter"        => cmpFilter(col("family"))
        case "SingleColumnValueFilter" =>
          // ROW-level semantics like the reference: the row passes when
          // its (family, qualifier) cell satisfies the comparator, and
          // ALL the row's cells are emitted. Expressed as a window-max
          // flag over the rowkey — composable under AND/OR with the
          // other filters. A Column carrying a window expression cannot
          // go straight into where(); use ParseFilter.filter(df, s),
          // which materializes the predicate first.
          val f = quoted(); eat(","); val q = quoted(); eat(",")
          val isTarget = col("family") === f && col("qualifier") === q
          val cellHit = isTarget && coalesce(cmpFilter(col("value")), lit(false))
          val w = org.apache.spark.sql.expressions.Window.partitionBy("rowkey")
          // reference default filterIfMissing=false: rows LACKING the
          // column pass through, rows having it pass iff the value hits
          max(when(cellHit, 1).otherwise(0)).over(w) === 1 ||
            max(when(isTarget, 1).otherwise(0)).over(w) === 0
        case other => throw new IllegalArgumentException(
          s"ParseFilter: unsupported filter '$other'")
      }
      eat(")")
      c
    }

    /** `op, 'comparator:value'` argument pair. */
    private def cmpFilter(target: Column): Column = {
      ws()
      val op = opToken()
      eat(",")
      val arg = quoted()
      val (kind, v) = arg.indexOf(':') match {
        case -1 => ("binary", arg)
        case i  => (arg.substring(0, i), arg.substring(i + 1))
      }
      kind match {
        case "binary"       => Comparators.binary(v)(target, op)
        case "binaryprefix" => Comparators.binaryPrefix(v)(target, op)
        case "substring"    => Comparators.substr(v)(target, op)
        case "regexstring"  => Comparators.regex(v)(target, op)
        case "long"         => Comparators.long(v.toLong)(target.cast("bigint"), op)
        case other => throw new IllegalArgumentException(
          s"ParseFilter: unsupported comparator '$other:'")
      }
    }

    /** bare word token (e.g. the booleans in ColumnRangeFilter args). */
    private def word(): String = {
      val w = peekWord
      pos += w.length
      w
    }

    private def opToken(): CompareOp.Value = {
      ws()
      val two = if (pos + 1 < s.length) s.substring(pos, pos + 2) else ""
      val (tok, op) = two match {
        case "<=" => ("<=", LESS_OR_EQUAL)
        case ">=" => (">=", GREATER_OR_EQUAL)
        case "!=" => ("!=", NOT_EQUAL)
        case _ => s.charAt(pos) match {
          case '<' => ("<", LESS)
          case '>' => (">", GREATER)
          case '=' => ("=", EQUAL)
          case c => throw new IllegalArgumentException(s"ParseFilter: bad op '$c' at $pos")
        }
      }
      pos += tok.length
      op
    }

    /** Single-quoted string; a doubled '' unescapes to a literal quote
      * (the reference grammar's escape). */
    private def quoted(): String = {
      ws()
      require(!eof && s.charAt(pos) == '\'', s"expected quote at $pos in '$s'")
      pos += 1
      val sb = new StringBuilder
      var done = false
      while (!done) {
        require(!eof, s"unterminated quote in '$s'")
        val c = s.charAt(pos)
        if (c == '\'') {
          if (pos + 1 < s.length && s.charAt(pos + 1) == '\'') { sb += '\''; pos += 2 }
          else { pos += 1; done = true }
        } else { sb += c; pos += 1 }
      }
      sb.toString
    }
  }
}
