package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The HBase filter-string DSL (hbase-client/.../filter/ParseFilter.java:52)
  * — the grammar every shell/REST/Thrift user goes through — re-expressed
  * as a recursive-descent parser over the standard cell view
  * (rowkey / family / qualifier / value [/ ts]).
  *
  * Supported grammar (now the FULL reference grammar, stateful filters
  * included):
  *
  *   expr    := term ( 'OR' term )*
  *   term    := factor ( 'AND' factor )*
  *   factor  := '(' expr ')' | 'SKIP' factor | 'WHILE' factor | filter
  *   filter  := Name '(' args ')'
  *
  * Cell-shaped filters (compile to a Column, composable anywhere) — the
  * FULL ParseFilter.java:56-100 registry:
  * RowFilter(op, cmp) · ValueFilter(op, cmp) · QualifierFilter(op, cmp) ·
  * FamilyFilter(op, cmp) · PrefixFilter('p') · ColumnPrefixFilter('p') ·
  * MultipleColumnPrefixFilter('p1', ...) ·
  * ColumnRangeFilter('min', minInc, 'max', maxInc) · FuzzyRowFilter('pat') ·
  * InclusiveStopFilter('k') · SingleColumnValueFilter('f','q',op,cmp) ·
  * SingleColumnValueExcludeFilter('f','q',op,cmp) ·
  * DependentColumnFilter('f','q') · RandomRowFilter(chance) ·
  * MultiRowRangeFilter('a','b', 'c','d', ...) · ColumnCountGetFilter(n) ·
  * FirstKeyOnlyFilter() · ColumnPaginationFilter(limit, offset) ·
  * TimestampsFilter('ts', ...) ·
  * SKIP f (drop the whole row if any cell fails f — a rowkey-partitioned
  * window, like SingleColumnValueFilter).
  * KeyOnlyFilter() rewrites emitted cells to zero-length values, so it
  * lowers in [[filter]] only (a Column cannot rewrite a column) and,
  * like the scan-stateful filters, must sit in the top-level AND chain
  * (inside an OR it would blank values for only one branch).
  * Ops: `<  <=  =  !=  >=  >`. Comparators: `binary:` `binaryprefix:`
  * `substring:` `regexstring:` `long:` (ParseFilter.java prefixes).
  *
  * Scan-stateful filters (carry scanner position, so they compile to
  * DataFrame TRANSFORMS inside [[filter]], not to a Column):
  * `WHILE f` (WhileMatchFilter: emit rows until the first row failing f,
  * lowered to the broadcast min-failing-rowkey join — no unpartitioned
  * window) and `PageFilter(n)` (first n rows of the passing stream,
  * lowered to a broadcast semi-join against the first n distinct
  * rowkeys). Evaluation semantics, documented because a FilterList
  * evaluates members in order while a DataFrame has no list position:
  * WHILE's predicate is judged against the FULL scan (its usual role is
  * the outermost wrapper), and PageFilter counts rows that passed every
  * OTHER filter (its usual role is the final limiter). Both may appear
  * only as top-level AND-terms — inside an OR their stream semantics
  * are evaluation-order-defined even in the reference, so we reject
  * rather than guess.
  */
object ParseFilter {
  import CompareOp._

  // ---- AST: pure Column predicates vs scan-stateful transforms ----
  private sealed trait Node
  // `win = true` marks a WINDOW-SHAPED predicate (the SCVF family,
  // SKIP, pagination): composable under AND/OR like any Column, but
  // it cannot nest inside another window or an aggregate — SKIP and
  // WHILE reject it at parse time instead of dying in the analyzer.
  private final case class Pred(c: Column, win: Boolean = false) extends Node
  // Order-DEPENDENT window predicates (pagination / column-count /
  // first-key-only) defer Column construction until the scan order is
  // known: ParseFilter.filter supplies the VIEW's schema-aware order
  // (version columns appended — fkOrder), the pure parse() API the
  // single-version (family, qualifier) default. A fixed parse-time
  // order would tie version duplicates nondeterministically, the same
  // hazard FirstMatch defers for.
  private final case class WinPred(mk: Seq[Column] => Column) extends Node
  private final case class While(inner: Column) extends Node
  private final case class Page(n: Long) extends Node
  private case object KeyOnly extends Node
  // FirstKeyValueMatchingQualifiersFilter defers to lowering: its scan
  // order must include the version columns (ts desc, unique tiebreak)
  // WHEN the view carries them, and only the DataFrame's schema can
  // tell — a fixed (family, qualifier) Column would order version ties
  // arbitrarily (nondeterministic output on versioned views)
  private final case class FirstMatch(qualifiers: Seq[String]) extends Node
  private final case class AndN(l: Node, r: Node) extends Node
  private final case class OrN(l: Node, r: Node) extends Node

  /** Parse a pure (Column-shaped) filter string. Stateful WHILE /
    * PageFilter grammars cannot become a single Column — use
    * [[filter]], which lowers them to DataFrame transforms. */
  def parse(s: String): Column = toColumn(parseNode(s))

  /** Apply a filter string to a cell view — the full grammar. Pure
    * predicates (including window-shaped ones like
    * SingleColumnValueFilter and SKIP) are materialized as a column
    * first (Spark forbids window expressions directly inside WHERE);
    * WHILE and PageFilter become broadcast-join transforms. */
  def filter(df: DataFrame, s: String): DataFrame = lower(df, parseNode(s))

  private def parseNode(s: String): Node = {
    val p = new P(s)
    val n = p.expr()
    p.ws()
    require(p.eof, s"trailing input at ${p.pos}: '${s.drop(p.pos)}'")
    n
  }

  private val defaultFkOrder: Seq[Column] = Seq(col("family"), col("qualifier"))

  private def toColumn(n: Node, order: Seq[Column] = defaultFkOrder): Column =
    n match {
      case Pred(c, _)  => c
      case WinPred(mk) => mk(order)
      case AndN(l, r)  => toColumn(l, order) && toColumn(r, order)
      case OrN(l, r)   => toColumn(l, order) || toColumn(r, order)
      case While(_) | Page(_) | KeyOnly | FirstMatch(_) =>
        throw new IllegalArgumentException(
          "ParseFilter: WHILE / PageFilter / KeyOnlyFilter / " +
            "FirstKeyValueMatchingQualifiersFilter carry scanner state, " +
            "rewrite cells, or need the view's schema and cannot compile " +
            "to a Column — apply them with ParseFilter.filter(df, s)")
    }

  private def pure(n: Node): Boolean = n match {
    case Pred(_, _)  => true
    case WinPred(_)  => true
    case AndN(l, r)  => pure(l) && pure(r)
    case OrN(l, r)   => pure(l) && pure(r)
    case _           => false
  }

  /** Does the subtree contain a window-shaped predicate? SKIP/WHILE
    * must refuse those — nesting a window inside SKIP's own row
    * window or WHILE's min() aggregate is rejected by the analyzer. */
  private def windowed(n: Node): Boolean = n match {
    case Pred(_, w) => w
    case WinPred(_) => true
    case AndN(l, r) => windowed(l) || windowed(r)
    case OrN(l, r)  => windowed(l) || windowed(r)
    case _          => false
  }

  /** Lower the AST onto a DataFrame. Stateful nodes must sit in the
    * top-level AND chain; everything else folds into one predicate. */
  private def lower(df: DataFrame, root: Node): DataFrame = {
    // flatten the top-level AND chain
    def terms(n: Node): Seq[Node] = n match {
      case AndN(l, r) => terms(l) ++ terms(r)
      case other      => Seq(other)
    }
    val ts = terms(root)
    ts.foreach {
      case o: OrN => require(pure(o),
        "ParseFilter: WHILE / PageFilter inside OR have evaluation-order-" +
          "defined semantics even in the reference FilterList, " +
          "KeyOnlyFilter inside OR would blank values for only one " +
          "branch, and FirstKeyValueMatchingQualifiersFilter carries " +
          "scan position — place them as top-level AND terms instead")
      case _ =>
    }
    // FirstKeyValueMatchingQualifiersFilter's scan order, chosen from
    // the VIEW's schema: versioned views get HBase's newest-first
    // version order plus the unique tiebreak, single-version views the
    // plain (family, qualifier) — a ROWS-frame window over a non-unique
    // order would be nondeterministic
    lazy val fkOrder: Seq[Column] = {
      val have = df.columns.toSet
      Seq(col("family"), col("qualifier")) ++
        (if (have("ts")) Seq(col("ts").desc) else Nil) ++
        (if (have("event_id")) Seq(col("event_id").desc) else Nil)
    }
    val preds  = ts.collect { case p: Pred => p.c } ++
                 ts.collect { case wp: WinPred => wp.mk(fkOrder) } ++
                 ts.collect { case f: FirstMatch =>
                   Filters.firstKeyValueMatchingQualifiers(f.qualifiers, fkOrder) } ++
                 ts.collect { case o: OrN => toColumn(o, fkOrder) }
    val whiles = ts.collect { case w: While => w.inner }
    val pages  = ts.collect { case pg: Page => pg.n }
    val keyOnly = ts.contains(KeyOnly)

    // WHILE first (judged on the full scan): rows strictly before the
    // first failing rowkey — THE Filters.whileMatchOver shape (one
    // copy; the former inline twin had already drifted in mechanics)
    val afterWhile = whiles.foldLeft(df) { (cur, inner) =>
      Filters.whileMatchOver(df, cur, "rowkey", inner)
    }
    // pure predicates (window-shaped ones need materialization)
    val afterPred =
      if (preds.isEmpty) afterWhile
      else afterWhile.withColumn("_pf", preds.reduce(_ && _))
        .where(col("_pf")).drop("_pf")
    // PageFilter last: first n distinct rowkeys of the passing stream
    val afterPage = pages.reduceOption(_ min _) match {
      case None => afterPred
      case Some(n) =>
        val topKeys = afterPred.select("rowkey").distinct()
          .orderBy("rowkey").limit(n.toInt)
        afterPred.join(broadcast(topKeys), Seq("rowkey"), "leftsemi")
    }
    // KeyOnlyFilter.java rewrites every emitted cell to a zero-length
    // value: blank the value, keep the schema (coordinates intact) —
    // ONE copy, shared with the DataFrame API (Filters.keyOnly)
    if (keyOnly) Filters.keyOnly(afterPage)
    else afterPage
  }

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

    def expr(): Node = {
      var n = term()
      while (peekWord == "OR") { eat("OR"); n = OrN(n, term()) }
      n
    }
    def term(): Node = {
      var n = factor()
      while (peekWord == "AND") { eat("AND"); n = AndN(n, factor()) }
      n
    }
    def factor(): Node = {
      ws()
      if (!eof && s.charAt(pos) == '(') { eat("("); val n = expr(); eat(")"); n }
      else peekWord match {
        case "SKIP" =>
          eat("SKIP")
          val inner = factor()
          require(pure(inner) && !windowed(inner),
            "ParseFilter: SKIP wraps a plain cell predicate — scan-" +
              "stateful and window-shaped filters (the SCVF family, " +
              "pagination, first-key) cannot nest inside SKIP's row window")
          // SkipFilter.java semantics live in Filters.skipPredicate —
          // one source for the DSL and the DataFrame API
          Pred(Filters.skipPredicate(toColumn(inner)), win = true)
        case "WHILE" =>
          eat("WHILE")
          val inner = factor()
          require(pure(inner) && !windowed(inner),
            "ParseFilter: WHILE wraps a plain cell predicate — scan-" +
              "stateful and window-shaped filters (the SCVF family, " +
              "pagination, first-key) cannot nest inside WHILE's " +
              "first-fail aggregate")
          While(toColumn(inner))
        case _ => filter()
      }
    }

    def filter(): Node = {
      val name = peekWord; pos += name.length
      eat("(")
      val n: Node = name match {
        // each arm delegates to the Filters helper — ONE source of the
        // filter's semantics for the DSL and the DataFrame API (two
        // hand-synced copies would drift, the codebase's own rule for
        // the window-shaped predicates)
        case "PrefixFilter" =>
          Pred(Filters.prefixFilter(col("rowkey"), quoted()))
        case "ColumnPrefixFilter" => Pred(Filters.columnPrefix(quoted()))
        case "MultipleColumnPrefixFilter" => Pred {
          val ps = scala.collection.mutable.ListBuffer(quoted())
          while ({ ws(); !eof && s.charAt(pos) == ',' }) { eat(","); ps += quoted() }
          Filters.columnPrefix(ps.toSeq: _*)
        }
        case "ColumnRangeFilter" => Pred {
          val lo = quoted(); eat(","); val loInc = bool()
          eat(","); val hi = quoted(); eat(","); val hiInc = bool()
          Filters.columnRange(lo, loInc, hi, hiInc)
        }
        case "FuzzyRowFilter" =>
          Pred { val p = quoted(); Filters.fuzzyRowFilter(col("rowkey"), p) }
        case "InclusiveStopFilter" =>
          Pred(Filters.inclusiveStop(col("rowkey"), quoted()))
        case "RowFilter"           => Pred(cmpFilter(col("rowkey")))
        case "ValueFilter"         => Pred(cmpFilter(col("value")))
        case "QualifierFilter"     => Pred(cmpFilter(col("qualifier")))
        case "FamilyFilter"        => Pred(cmpFilter(col("family")))
        case "PageFilter" =>
          // PageFilter.java: at most n rows. Scanner state — lowered in
          // ParseFilter.filter to a broadcast semi-join on the first n
          // passing rowkeys.
          Page(number())
        case "ColumnPaginationFilter" =>
          // ColumnPaginationFilter.java(limit, offset): per row, `limit`
          // COLUMNS starting at 0-based column `offset`, newest version
          // each (NEXT_COL semantics) — order-deferred so
          // ParseFilter.filter can tie version duplicates
          // deterministically with the view's schema-aware order
          val limit = number(); eat(","); val offset = number()
          WinPred(ord =>
            Filters.columnPaginationPredicate(limit.toInt, offset.toInt, ord))
        case "TimestampsFilter" => Pred {
          // TimestampsFilter.java: cell version ts ∈ explicit list.
          // The REFERENCE grammar is bare epoch-millis longs —
          // TimestampsFilter (1526353465000) — which the old quoted()
          // parse rejected (r13 review); quoted datetime strings stay
          // as the extension. Either form is LOUD on malformed input:
          // bare values fail tsLong()'s digit check positionally, and
          // a quoted string that Spark cannot cast raises at plan time
          // (constant folding evaluates the literal guard) instead of
          // becoming ts IN (NULL) — a silently empty scan under
          // non-ANSI, the failure class the number() guard documents.
          def tsArg(): Column = { ws()
            if (!eof && s.charAt(pos).isDigit) {
              org.apache.spark.sql.functions.expr(
                s"timestamp_millis(${tsLong()}L)")
            } else {
              val v = quoted()
              val c = lit(v).cast("timestamp")
              when(c.isNull, raise_error(lit(
                s"TimestampsFilter: unparseable timestamp '$v'"))
                .cast("timestamp")).otherwise(c)
            }
          }
          val ts = scala.collection.mutable.ListBuffer(tsArg())
          while ({ ws(); !eof && s.charAt(pos) == ',' }) { eat(","); ts += tsArg() }
          Filters.timestampsFilter(col("ts"), ts.toSeq)
        }
        case "SingleColumnValueFilter" => Pred {
          // ROW-level semantics like the reference: the row passes when
          // its (family, qualifier) cell satisfies the comparator, and
          // ALL the row's cells are emitted (window-max flag over the
          // rowkey — composable under AND/OR; materialized by
          // ParseFilter.filter since Spark forbids windows in WHERE).
          // The reference's 6-arg form adds (filterIfMissing,
          // latestVersionOnly); filterIfMissing is honored directly.
          // latestVersionOnly gates WHICH version is tested — that is a
          // property of the scan, not the predicate: compose
          // Scans.maxVersions(1) upstream for latest-only semantics
          // (the parse accepts the flag for grammar compatibility; on a
          // single-version view both settings coincide).
          val (f, q, vp, ifMissing) = scvfArgs()
          Filters.singleColumnValuePredicate(f, q, vp, ifMissing)
        }.copy(win = true)
        case "SingleColumnValueExcludeFilter" => Pred {
          // SingleColumnValueExcludeFilter.java: SCVF row semantics,
          // minus the tested cell itself from the emitted rows; accepts
          // SCVF's 6-arg form too (it inherits createFilterFromArguments)
          val (f, q, vp, ifMissing) = scvfArgs()
          Filters.singleColumnValuePredicate(f, q, vp, ifMissing) &&
            !(col("family") === f && col("qualifier") === q)
        }.copy(win = true)
        case "DependentColumnFilter" => Pred {
          // DependentColumnFilter.java: cells whose version ts matches a
          // reference cell's ts in the same row (windowed form). The
          // reference's richer arities compose the same predicate:
          // 3-arg adds dropDependentColumn (remove the reference cell
          // itself), 5-arg adds a value comparator the reference cell
          // must satisfy to contribute its ts.
          val f = quoted(); eat(","); val q = quoted()
          var drop = false
          var vp: Option[Column] = None
          ws()
          if (!eof && s.charAt(pos) == ',') {
            eat(","); drop = bool()
            ws()
            if (!eof && s.charAt(pos) == ',') {
              eat(","); vp = Some(cmpFilter(col("value")))
            }
          }
          val base = Filters.dependentColumnPredicate(f, q, vp)
          if (drop) base && !(col("family") === f && col("qualifier") === q)
          else base
        }.copy(win = true)
        case "RandomRowFilter" => Pred {
          // RandomRowFilter.java(chance): reference uses Random per row;
          // cluster determinism needs a key hash — the string rowkey
          // rides the shared xxhash64 fold into the Knuth sampler
          val chance = decimal()
          Filters.randomRowFilterAnyKey(col("rowkey"), chance)
        }
        case "MultiRowRangeFilter" => Pred {
          // MultiRowRangeFilter.java: OR of [start, stop) rowkey ranges,
          // args as quoted bound pairs: ('a','c', 'x','z')
          val rs = scala.collection.mutable.ListBuffer.empty[(String, String)]
          val a0 = quoted(); eat(","); val b0 = quoted(); rs += ((a0, b0))
          while ({ ws(); !eof && s.charAt(pos) == ',' }) {
            eat(","); val a = quoted(); eat(","); val b = quoted(); rs += ((a, b))
          }
          Filters.multiRowRange(col("rowkey"), rs.toSeq)
        }
        case "ColumnCountGetFilter" =>
          // ColumnCountGetFilter.java: at most n columns per row =
          // pagination at offset 0 (order-deferred, see above)
          val n = number().toInt
          WinPred(ord => Filters.columnPaginationPredicate(n, 0, ord))
        case "FirstKeyOnlyFilter" =>
          WinPred(ord => Filters.firstKeyOnlyPredicate(ord))
        case "FirstKeyValueMatchingQualifiersFilter" =>
          // FirstKeyValueMatchingQualifiersFilter.java:49 — qualifier
          // set as quoted args; cells pass until the first match, then
          // the rest of the row is skipped. Schema-dependent scan
          // order, so lowered in ParseFilter.filter like KeyOnly.
          val qs = scala.collection.mutable.ListBuffer(quoted())
          while ({ ws(); !eof && s.charAt(pos) == ',' }) {
            eat(","); qs += quoted()
          }
          FirstMatch(qs.toSeq)
        case "KeyOnlyFilter" =>
          // rewrites cell content (zero-length values) rather than
          // selecting cells — lowered in ParseFilter.filter
          KeyOnly
        case other => throw new IllegalArgumentException(
          s"ParseFilter: unsupported filter '$other'")
      }
      eat(")")
      n
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
        case "long"         =>
          // positioned error, not a raw NumberFormatException — the
          // decimal() discipline (r13 review)
          require(v.matches("-?\\d+") &&
            scala.util.Try(v.toLong).isSuccess,
            s"expected long after 'long:', got '$v' in '$s'")
          Comparators.long(v.toLong)(target.cast("bigint"), op)
        case other => throw new IllegalArgumentException(
          s"ParseFilter: unsupported comparator '$other:'")
      }
    }

    /** bare word token. */
    private def word(): String = {
      val w = peekWord
      pos += w.length
      w
    }

    /** strict boolean literal — anything but true/false throws, like
      * the reference's convertByteArrayToBoolean (a lenient "not-true
      * means false" would silently flip filterIfMissing on a typo). */
    private def bool(): Boolean = {
      val w = word()
      require(w == "true" || w == "false", s"expected true/false, got '$w' in '$s'")
      w == "true"
    }

    /** decimal literal (RandomRowFilter's chance). */
    private def decimal(): Double = {
      ws()
      val start = pos
      while (!eof && (s.charAt(pos).isDigit || s.charAt(pos) == '.')) pos += 1
      val w = s.substring(start, pos)
      // at least one DIGIT: a lone "." passed nonEmpty and then threw
      // a raw positionless NumberFormatException from toDouble
      require(w.exists(_.isDigit) && w.count(_ == '.') <= 1,
        s"expected decimal at $start in '$s'")
      w.toDouble
    }

    /** bare integer literal (PageFilter / ColumnPaginationFilter args).
      * Bounded to Int range: the values feed limit()/row_number bounds,
      * and a silent .toInt wrap would turn PageFilter(2^32) into
      * limit(0) — an empty scan instead of an error. */
    private def number(): Long = {
      val w = word()
      require(w.nonEmpty && w.forall(_.isDigit), s"expected number, got '$w'")
      val n = BigInt(w)
      require(n.isValidInt, s"filter argument $w exceeds Int range")
      n.toLong
    }

    /** bare epoch-millis literal (TimestampsFilter's reference form) —
      * full Long range, positioned error (number() caps at Int, which
      * any epoch-millis value exceeds). */
    private def tsLong(): Long = {
      val w = word()
      require(w.nonEmpty && w.forall(_.isDigit),
        s"expected epoch-millis number, got '$w' in '$s'")
      val n = BigInt(w)
      require(n.isValidLong, s"timestamp $w exceeds Long range in '$s'")
      n.toLong
    }

    /** SCVF / SingleColumnValueExcludeFilter shared argument block:
      * family, qualifier, value comparator, optional (filterIfMissing
      * [, latestVersionOnly — accepted and swallowed; see the SCVF
      * arm's scaladoc]). ONE copy so the Exclude variant cannot drift
      * from SCVF's optional-argument handling. */
    private def scvfArgs(): (String, String, Column, Boolean) = {
      val f = quoted(); eat(","); val q = quoted(); eat(",")
      val vp = cmpFilter(col("value"))
      var ifMissing = false
      ws()
      if (!eof && s.charAt(pos) == ',') {
        eat(","); ifMissing = bool()
        ws()
        // latestVersionOnly parses (strict bool — a typo still throws)
        // but the LOWERING tests whatever versions the cells view
        // carries: on a single-version view both settings coincide;
        // on a multi-version view this is latestVersionOnly=FALSE
        // semantics, and a caller needing TRUE pre-applies
        // Scans.maxVersions(1) to the view — rejecting the flag would
        // break parsing the reference's own 6-arg filter strings
        if (!eof && s.charAt(pos) == ',') { eat(","); bool() }
      }
      (f, q, vp, ifMissing)
    }

    private def opToken(): CompareOp.Value = {
      ws()
      // eof guard like every other primitive: a filter string ending
      // where an op is expected must raise the parser's positioned
      // error, not leak a StringIndexOutOfBoundsException
      require(pos < s.length,
        s"ParseFilter: expected compare op at $pos, got end of input")
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
