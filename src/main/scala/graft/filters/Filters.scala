package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HBase's filter algebra (hbase-client/.../filter/) re-expressed
  * as Catalyst `Column` predicates and DataFrame transforms.
  *
  * Design: every per-cell / per-row filter returns a `Column`, so
  * Catalyst sees a declarative predicate — predicate pushdown to the
  * parquet scan, column pruning and codegen all apply. Filters that in
  * HBase carry scanner *state* (PageFilter, SkipFilter, WhileMatchFilter,
  * ColumnPaginationFilter) become whole-DataFrame transforms built from
  * limits, windows and two-phase aggregations — never driver loops.
  */
object CompareOp extends Enumeration {
  val LESS, LESS_OR_EQUAL, EQUAL, NOT_EQUAL, GREATER_OR_EQUAL, GREATER = Value
}

/** Comparators (hbase-client/.../filter/{Binary,BinaryPrefix,Bit,Long,
  * Null,RegexString,Substring}Comparator.java). Each yields a predicate
  * for (column op comparator). */
object Comparators {
  import CompareOp._

  private def ordered(c: Column, op: CompareOp.Value, v: Column): Column = op match {
    case LESS             => c < v
    case LESS_OR_EQUAL    => c <= v
    case EQUAL            => c === v
    case NOT_EQUAL        => c =!= v
    case GREATER_OR_EQUAL => c >= v
    case GREATER          => c > v
  }

  /** BinaryComparator: lexicographic compare of the (string-encoded) value. */
  def binary(v: String)(c: Column, op: CompareOp.Value): Column = ordered(c, op, lit(v))

  /** LongComparator: numeric compare. */
  def long(v: Long)(c: Column, op: CompareOp.Value): Column = ordered(c, op, lit(v))

  /** BinaryPrefixComparator: compares only up to the prefix length. */
  def binaryPrefix(prefix: String)(c: Column, op: CompareOp.Value): Column =
    ordered(substring(c, 1, prefix.length), op, lit(prefix))

  /** SubstringComparator: EQUAL means "contains" (case-insensitive in
    * HBase). BOTH sides lower through Spark's `lower()` so they share
    * ONE case-folding rule (r13 review: lowering the literal with
    * Locale.ROOT while the column side ran Spark's lower() was only
    * half a fix — UTF8String.toLowerCase falls back to DEFAULT-locale
    * String.toLowerCase for values containing any non-ASCII char, so
    * under tr_TR a capital I in such a value folded to dotless ı
    * while the literal's I folded to i, and the two sides silently
    * never matched; folding the literal through the same engine
    * function makes divergence impossible — the literal side constant-
    * folds, so there is no per-row cost). */
  def substr(s: String)(c: Column, op: CompareOp.Value): Column = op match {
    case EQUAL     => lower(c).contains(lower(lit(s)))
    case NOT_EQUAL => !lower(c).contains(lower(lit(s)))
    case _ => throw new IllegalArgumentException(s"SubstringComparator: $op")
  }

  /** RegexStringComparator: EQUAL means "matches". */
  def regex(re: String)(c: Column, op: CompareOp.Value): Column = op match {
    case EQUAL     => c.rlike(re)
    case NOT_EQUAL => !c.rlike(re)
    case _ => throw new IllegalArgumentException(s"RegexStringComparator: $op")
  }

  /** BitComparator over integral columns: EQUAL matches when
    * (value bitop mask) is non-zero (BitComparator.java semantics). */
  def bitAnd(mask: Long)(c: Column, op: CompareOp.Value): Column = op match {
    case EQUAL     => (c.bitwiseAND(lit(mask))) =!= 0
    case NOT_EQUAL => (c.bitwiseAND(lit(mask))) === 0
    case _ => throw new IllegalArgumentException(s"BitComparator: $op")
  }

  /** NullComparator: EQUAL matches null cells. */
  def nul(c: Column, op: CompareOp.Value): Column = op match {
    case EQUAL     => c.isNull
    case NOT_EQUAL => c.isNotNull
    case _ => throw new IllegalArgumentException(s"NullComparator: $op")
  }
}

object Filters {
  type Cmp = (Column, CompareOp.Value) => Column

  // ---- rowkey-level filters (apply to the rowkey column of a scan) ----

  /** RowFilter.java — compare the rowkey. */
  def rowFilter(keyCol: Column, op: CompareOp.Value, cmp: Cmp): Column = cmp(keyCol, op)

  /** PrefixFilter.java — rowkey starts with prefix. */
  def prefixFilter(keyCol: Column, prefix: String): Column = keyCol.startsWith(prefix)

  /** FuzzyRowFilter.java:58 — fixed-position wildcard match ('?' = any
    * char). Implemented as a codegen'd Catalyst Expression. */
  def fuzzyRowFilter(keyCol: Column, pattern: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(FuzzyMatch(ColumnBridge.expression(keyCol), pattern))
  }

  /** MultiRowRangeFilter.java — OR of [start, stop) rowkey ranges.
    * Bounds lift through `lit`, so numeric and string rowkeys share one
    * implementation (the DSL passes quoted strings, the DataFrame API
    * passes longs). An EMPTY string bound is UNBOUNDED, as in the
    * reference's RowRange (r13 review: `keyCol < ''` is always false,
    * so MultiRowRangeFilter('5','') — expressible in the DSL — meant
    * [5, ∞) but silently matched nothing). */
  def multiRowRange(keyCol: Column, ranges: Seq[(Any, Any)]): Column = {
    require(ranges.nonEmpty, "multiRowRange needs at least one range")
    ranges.map { case (a, b) =>
      val lo = a match { case "" => lit(true); case _ => keyCol >= a }
      val hi = b match { case "" => lit(true); case _ => keyCol < b }
      lo && hi
    }.reduce(_ || _)
  }

  /** InclusiveStopFilter.java — scan up to and including the stop row. */
  def inclusiveStop(keyCol: Column, stop: Any): Column = keyCol <= lit(stop)

  /** RandomRowFilter.java — row sample. HBase uses Random.nextFloat();
    * we need cluster-determinism, so use a multiplicative (Knuth) hash
    * of the rowkey — same result on every executor, every run, and
    * expressible in plain SQL for the oracle. The key is folded into
    * [0, 2^31) BEFORE the multiply so the product stays under
    * Long.MaxValue (2^31 · 2654435761 ≈ 5.7e18) — no ANSI
    * ARITHMETIC_OVERFLOW at 100 TB key ranges, and the fold period
    * (2^31) is far beyond any structured-key stride, so the sample
    * stays uncorrelated.
    *
    * `keyCol` must be INTEGRAL (r13 review — the old scaladoc said
    * "any rowkey"): pmod over a STRING key coerces both operands to
    * DOUBLE, so the hash silently runs in floating point (the Knuth
    * product far exceeds double's 2^53 exact range, diverging from
    * the exact-integer oracle mirror) and a non-numeric key is an
    * ANSI cast error. String/arbitrary rowkeys go through
    * [[randomRowFilterAnyKey]], which pre-folds with xxhash64 — the
    * same path the DSL's RandomRowFilter arm has always used. */
  def randomRowFilter(keyCol: Column, chance: Double): Column =
    graft.core.Hashes.knuth(keyCol) < lit((chance * 4294967296L).toLong)

  /** [[randomRowFilter]] for NON-integral rowkeys: fold any key type
    * into the sampler's [0, 2^31) domain via xxhash64 first. ONE copy
    * of the fold, shared with the DSL arm. */
  def randomRowFilterAnyKey(keyCol: Column, chance: Double): Column =
    randomRowFilter(pmod(xxhash64(keyCol), lit(2147483648L)), chance)

  // ---- cell-level filters (apply to a cells view:
  //      rowkey / family / qualifier / value [/ ts]) ----

  /** ValueFilter.java — compare the cell value. */
  def valueFilter(op: CompareOp.Value, cmp: Cmp): Column = cmp(col("value"), op)

  /** QualifierFilter.java — compare the qualifier. */
  def qualifierFilter(op: CompareOp.Value, cmp: Cmp): Column = cmp(col("qualifier"), op)

  /** FamilyFilter.java — compare the family. */
  def familyFilter(op: CompareOp.Value, cmp: Cmp): Column = cmp(col("family"), op)

  /** ColumnPrefixFilter.java / MultipleColumnPrefixFilter.java. */
  def columnPrefix(prefixes: String*): Column = {
    require(prefixes.nonEmpty, "columnPrefix needs at least one prefix")
    prefixes.map(col("qualifier").startsWith(_)).reduce(_ || _)
  }

  /** ColumnRangeFilter.java — [minQual, maxQual) on qualifier. */
  def columnRange(min: String, minInclusive: Boolean,
                  max: String, maxInclusive: Boolean): Column = {
    val lo = if (minInclusive) col("qualifier") >= min else col("qualifier") > min
    val hi = if (maxInclusive) col("qualifier") <= max else col("qualifier") < max
    lo && hi
  }

  /** TimestampsFilter.java — cell version timestamp ∈ explicit list. */
  def timestampsFilter(tsCol: Column, versions: Seq[Column]): Column =
    tsCol.isInCollection(versions)

  // ---- stateful scanner filters as DataFrame transforms ----

  /** PageFilter.java — at most `n` rows, in rowkey order (a scan is
    * key-ordered, so "first n" is well-defined). */
  def pageFilter(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
    df.orderBy(keyCols.map(col): _*).limit(n)

  /** ColumnPaginationFilter's cell predicate as a composable Column —
    * the single source of the pagination semantics, shared by
    * [[columnPagination]] and the ParseFilter DSL (two hand-synced
    * copies would drift). Reference-faithful COLUMN pagination
    * (ColumnPaginationFilter.java:135-141): the filter returns
    * NEXT_COL / INCLUDE_AND_NEXT_COL, so `count` increments once per
    * COLUMN, extra versions are skipped by the scanner, and columns
    * [offset, offset+limit) surface with their NEWEST version only —
    * pagination is over distinct (family, qualifier), not over cells
    * (r9 reference-semantics audit; the two coincide on one-version
    * views). `colCols` is the column identity, `orderCols` the cell
    * scan order — on a VERSIONED view (family, qualifier) alone is
    * not unique and the version tie would be partition-order
    * nondeterministic, so such callers append ts desc + a unique
    * tiebreak (the same contract as
    * [[firstKeyValueMatchingQualifiers]]). One rowkey-partitioned
    * window carries all three functions (the scanner's own walk:
    * column starts flagged by lag, the running start count IS the
    * column index). Window-shaped: materialize before WHERE. */
  def columnPaginationPredicate(limit: Int, offset: Int,
      orderCols: Seq[Column] = Seq(col("family"), col("qualifier")),
      colCols: Seq[Column] = Seq(col("family"), col("qualifier"))): Column = {
    // the reference constructor rejects negatives; here they would
    // make the scan silently empty (the exact failure class the
    // overflow comment below defends against) — the DSL path is
    // digit-guarded, the public API must be too
    require(limit >= 0 && offset >= 0,
      s"ColumnPagination limit ($limit) and offset ($offset) must be >= 0")
    val w = Window.partitionBy("rowkey").orderBy(orderCols: _*)
    val colKey = struct(colCols: _*)
    val prev = lag(colKey, 1).over(w)
    // first cell of its column in scan order = the version that survives
    val firstVer = prev.isNull || prev =!= colKey
    val colIdx = sum(when(firstVer, 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // offset + limit in LONG: both args pass the DSL's per-argument
    // Int guard individually, but their Int sum can wrap negative and
    // turn the scan silently empty — the exact failure class that
    // guard exists to prevent
    firstVer && colIdx > offset && colIdx <= offset.toLong + limit.toLong
  }

  /** ColumnPaginationFilter.java — per row, `limit` COLUMNS starting
    * at column `offset` in (family, qualifier) order, newest version
    * each (see [[columnPaginationPredicate]]). Window over (rowkey),
    * no shuffle beyond the hash partition on rowkey. */
  def columnPagination(cells: DataFrame, limit: Int, offset: Int,
      orderCols: Seq[Column] = Seq(col("family"), col("qualifier")),
      colCols: Seq[Column] = Seq(col("family"), col("qualifier"))): DataFrame =
    cells.withColumn("_keep",
        columnPaginationPredicate(limit, offset, orderCols, colCols))
      .where(col("_keep")).drop("_keep")

  /** FirstKeyOnlyFilter's cell predicate as a composable Column (the
    * DSL form of [[firstKeyOnly]]): true only for the row's first cell
    * in `orderCols` order — versioned views append ts desc + a unique
    * tiebreak, as [[columnPaginationPredicate]] documents. Window-
    * shaped: materialize before WHERE (ParseFilter.filter does). */
  def firstKeyOnlyPredicate(
      orderCols: Seq[Column] = Seq(col("family"), col("qualifier"))): Column = {
    val w = Window.partitionBy("rowkey").orderBy(orderCols: _*)
    row_number().over(w) === 1
  }

  /** FirstKeyOnlyFilter.java — only the first cell of each row (used by
    * RowCounter to avoid materializing values). Relationally: min
    * (family, qualifier) per rowkey via an aggregate, which Spark
    * executes with map-side partial aggregation. */
  def firstKeyOnly(cells: DataFrame): DataFrame =
    cells.groupBy("rowkey")
      .agg(min(struct(col("family"), col("qualifier"))).as("fk"))
      .select(col("rowkey"), col("fk.family").as("family"),
        col("fk.qualifier").as("qualifier"))

  /** KeyOnlyFilter.java — rewrite every emitted cell to a ZERO-LENGTH
    * value, coordinates intact (the reference keeps the KeyValue and
    * drops the value bytes — the SCHEMA does not change). ONE copy:
    * the DSL's KeyOnlyFilter() lowers through this (r13 review: the
    * old form here DROPPED the value column — a second, divergent,
    * untested KeyOnly semantics beside the DSL's faithful one). */
  def keyOnly(cells: DataFrame): DataFrame =
    cells.withColumn("value", lit(""))

  /** FirstKeyValueMatchingQualifiersFilter.java:49 — emit a row's
    * cells in scan order UP TO AND INCLUDING the first cell whose
    * qualifier is in the set; after that match the rest of the row is
    * skipped (ReturnCode.NEXT_ROW). A row with NO matching qualifier
    * emits every cell — the reference's documented caveat ("may emit
    * KVs which do not have the given columns in them"; it exists for
    * RowCounter-style early-out, not projection). Relationally: a cell
    * survives iff no matching cell PRECEDES it, i.e. one running count
    * over the preceding-rows frame — a single window function, one
    * shuffle on rowkey. `orderCols` is the cell scan order; versioned
    * views append ts desc + a unique tiebreak for the HBase
    * newest-first order. Window-shaped: materialize before WHERE. */
  def firstKeyValueMatchingQualifiers(
      qualifiers: Seq[String],
      orderCols: Seq[Column] = Seq(col("family"), col("qualifier"))): Column = {
    require(qualifiers.nonEmpty, "need at least one qualifier to match")
    val w = Window.partitionBy("rowkey").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    coalesce(sum(when(col("qualifier").isInCollection(qualifiers), 1)
      .otherwise(0)).over(w), lit(0)) === 0
  }

  /** SkipFilter's row predicate as a composable Column — the single
    * source of the SKIP semantics, shared by [[skipFilter]] and the
    * ParseFilter DSL. A null predicate result (e.g. a null cell under a
    * value comparator) counts as a FAILURE, matching SkipFilter's
    * drop-row-on-any-non-match. Window-shaped: materialize before WHERE. */
  def skipPredicate(cellPred: Column): Column = {
    val w = Window.partitionBy("rowkey")
    max(when(coalesce(cellPred, lit(false)) === false, 1).otherwise(0)).over(w) === 0
  }

  /** SkipFilter.java — if ANY cell of a row fails the wrapped predicate,
    * drop the WHOLE row. Window max over the violation flag — one hash
    * shuffle on rowkey, no self-join. */
  def skipFilter(cells: DataFrame, cellPred: Column): DataFrame =
    cells.withColumn("_keep", skipPredicate(cellPred))
      .where(col("_keep")).drop("_keep")

  /** SingleColumnValueFilter's row predicate as a composable Column —
    * the single source of the SCVF semantics for the ParseFilter DSL
    * (SingleColumnValueFilter and its Exclude variant);
    * [[singleColumnValue]] is the DataFrame form. Reference default
    * `filterIfMissing=false`: rows LACKING the column pass through.
    * Window-shaped: materialize before WHERE. */
  def singleColumnValuePredicate(family: String, qualifier: String,
                                 valuePred: Column,
                                 filterIfMissing: Boolean = false): Column = {
    val isTarget = col("family") === family && col("qualifier") === qualifier
    val cellHit = isTarget && coalesce(valuePred, lit(false))
    val w = Window.partitionBy("rowkey")
    if (filterIfMissing) max(when(cellHit, 1).otherwise(0)).over(w) === 1
    else max(when(cellHit, 1).otherwise(0)).over(w) === 1 ||
      max(when(isTarget, 1).otherwise(0)).over(w) === 0
  }

  /** DependentColumnFilter's cell predicate as a composable Column (the
    * DSL form of [[dependentColumn]]): keep cells whose version ts
    * matches ANY reference-cell ts of the same row — a windowed
    * collect_set instead of the self-semi-join, so it composes under
    * AND/OR with the other filters. With `valuePred` (the reference's
    * 5-arg form) only reference cells whose value satisfies the
    * comparator contribute their ts. Window-shaped: materialize before
    * WHERE. */
  def dependentColumnPredicate(refFamily: String, refQualifier: String,
                               valuePred: Option[Column] = None): Column = {
    val w = Window.partitionBy("rowkey")
    val isRef = col("family") === refFamily && col("qualifier") === refQualifier
    val contributes = valuePred.fold(isRef)(vp => isRef && coalesce(vp, lit(false)))
    array_contains(collect_set(when(contributes, col("ts"))).over(w), col("ts"))
  }

  /** SingleColumnValueFilter.java:73 — the row-level predicate: emit ALL
    * cells of rows whose (family, qualifier) cell value satisfies the
    * comparator. The default `filterIfMissing=false` matches the
    * reference's: rows LACKING the column pass through. One window
    * shuffle on rowkey. `excludeChecked=true` is
    * SingleColumnValueExcludeFilter.java: the tested cell itself is
    * removed from the emitted rows. */
  def singleColumnValue(cells: DataFrame, family: String, qualifier: String,
                        op: CompareOp.Value, cmp: Cmp,
                        filterIfMissing: Boolean = false,
                        excludeChecked: Boolean = false): DataFrame = {
    // the row predicate lives in singleColumnValuePredicate (shared
    // with the DSL) — one source, per this file's no-drift rule
    val keep = singleColumnValuePredicate(family, qualifier,
      cmp(col("value"), op), filterIfMissing)
    val kept = cells.withColumn("_keep", keep).where(col("_keep")).drop("_keep")
    if (excludeChecked) kept.where(!(col("family") === family && col("qualifier") === qualifier))
    else kept
  }

  /** ColumnCountGetFilter.java — at most `n` COLUMNS per row, newest
    * version each, in (family, qualifier) order (pagination with
    * offset 0 — the reference likewise returns INCLUDE_AND_NEXT_COL
    * while counting). */
  def columnCount(cells: DataFrame, n: Int): DataFrame = {
    require(n >= 0, s"ColumnCountGetFilter n ($n) must be >= 0")
    columnPagination(cells, limit = n, offset = 0)
  }

  /** FilterList.java:56 — MUST_PASS_ALL / MUST_PASS_ONE composition of
    * Column-shaped filters, arbitrarily nested (a FilterList is itself
    * a filter, so members can be other FilterLists). */
  sealed trait FList { def toColumn: Column }
  final case class Leaf(c: Column) extends FList { def toColumn: Column = c }
  final case class MustPassAll(members: FList*) extends FList {
    def toColumn: Column = members.map(_.toColumn).reduce(_ && _)
  }
  final case class MustPassOne(members: FList*) extends FList {
    def toColumn: Column = members.map(_.toColumn).reduce(_ || _)
  }

  /** WhileMatchFilter.java — scan (key-ordered) until the first row that
    * fails the predicate, then stop. Two-phase: aggregate the min failing
    * key (map-side combinable), then filter below it. No sort needed.
    * A null predicate result counts as a FAILURE (stops the scan) —
    * the same convention as skipFilter and the ParseFilter WHILE
    * lowering, so the two WhileMatch entry points cannot diverge on
    * null-producing comparators. */
  def whileMatch(df: DataFrame, keyCol: String, pred: Column): DataFrame =
    whileMatchOver(df, df, keyCol, pred)

  /** The min-fail prune with the JUDGING relation split from the
    * pruned one — ONE copy of the WhileMatch shape shared with the
    * ParseFilter WHILE lowering (which judges each WHILE on the FULL
    * scan while pruning the already-filtered stream; two hand-synced
    * copies of this join had already drifted in mechanics). */
  private[filters] def whileMatchOver(judge: DataFrame, cur: DataFrame,
                                      keyCol: String, pred: Column): DataFrame = {
    val firstFail = judge.where(coalesce(pred, lit(false)) === false)
      .agg(min(col(keyCol)).as("_wm_first_fail"))
    // NULL first-fail (nothing failed) keeps EVERY row via isNull, not
    // a max-value sentinel: coalesce(…, Long.MaxValue) would type-
    // coerce to string on a VARCHAR rowkey and turn the stop condition
    // into a lexicographic compare against "92233…", silently dropping
    // high-sorting keys — the no-fail branch must be type-free
    cur.join(broadcast(firstFail),
        firstFail("_wm_first_fail").isNull ||
          cur(keyCol) < firstFail("_wm_first_fail"), "inner")
      .drop("_wm_first_fail")
  }

  /** DependentColumnFilter.java — keep cells whose version timestamp
    * equals the timestamp of the reference (family, qualifier) cell in
    * the same row. A self-semi-join on (rowkey, ts). */
  def dependentColumn(vcells: DataFrame, refFamily: String, refQualifier: String): DataFrame = {
    val ref = vcells.where(col("family") === refFamily && col("qualifier") === refQualifier)
      .select(col("rowkey").as("r_rowkey"), col("ts").as("r_ts")).distinct()
    vcells.join(ref, vcells("rowkey") === ref("r_rowkey") && vcells("ts") === ref("r_ts"), "leftsemi")
  }
}
