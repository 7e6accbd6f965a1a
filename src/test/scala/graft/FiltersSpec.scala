package graft

import org.apache.spark.sql.functions._
import graft.filters.{CompareOp, Comparators, Filters, FuzzyMatch}
import graft.core.Tables

class FiltersSpec extends SparkSpec {

  test("Scans.pagedScan: pages disjoint, ordered, cursor resumes exactly; short tail page") {
    import spark.implicits._
    val orders = Tables.load(spark, sfDir, "orders")
    val got = graft.kv.Scans.pagedScan(orders, "o_orderkey", 7, 3,
        Seq("o_orderkey"))
      .select("o_orderkey", "page_idx").as[(Long, Long)].collect().toList
      .sortBy(identity)
    val want = orders.orderBy("o_orderkey").limit(21)
      .select("o_orderkey").as[Long].collect().toList.sorted
      .zipWithIndex.map { case (k, i) => (k, i.toLong / 7) }
    assert(got == want, s"got $got")
    // a page size beyond the table: one full page then empty pages, no error
    val n = orders.count()
    val all = graft.kv.Scans.pagedScan(orders, "o_orderkey", n.toInt + 10, 2,
      Seq("o_orderkey"))
    assert(all.count() == n, "tail pages past the data must be empty, not error")
  }

  test("FuzzyMatch semantics (eval)") {
    assert(FuzzyMatch.matches("abc_99_x", "???_99_?"))
    assert(!FuzzyMatch.matches("abc_98_x", "???_99_?"))
    // reference loops min(pattern, row) length: overlap-only compare
    assert(FuzzyMatch.matches("abc_99", "???_99_?"))     // shorter row, prefix ok
    assert(!FuzzyMatch.matches("abc_98", "???_99_?"))    // shorter row, prefix bad
    assert(FuzzyMatch.matches("abc_99_x_longer", "???_99_?")) // longer row, prefix ok
  }

  test("ParseFilter DSL parses nested AND/OR with comparators") {
    import spark.implicits._
    val cells = Seq(
      ("10", "info", "name", "build-a"), ("10", "info", "seg", "XYZ"),
      ("20", "info", "name", "other"), ("31", "id", "nk", "7")
    ).toDF("rowkey", "family", "qualifier", "value")
    val c = graft.filters.ParseFilter.parse(
      "(PrefixFilter('1') AND ValueFilter(=, 'substring:build')) OR QualifierFilter(=, 'binary:nk')")
    val got = cells.where(c).select("rowkey", "qualifier").as[(String, String)].collect().sorted
    assert(got.sameElements(Array(("10", "name"), ("31", "nk"))))
    intercept[IllegalArgumentException] {
      graft.filters.ParseFilter.parse("NoSuchFilter('x')")
    }
  }

  test("ParseFilter SingleColumnValueFilter has row-level semantics (all cells of matching rows)") {
    import spark.implicits._
    val cells = Seq(
      ("r1", "info", "seg", "HIT"), ("r1", "info", "name", "alice"),
      ("r2", "info", "seg", "MISS"), ("r2", "info", "name", "bob")
    ).toDF("rowkey", "family", "qualifier", "value")
    val got = graft.filters.ParseFilter.filter(cells,
        "SingleColumnValueFilter('info', 'seg', =, 'binary:HIT')")
      .select("rowkey", "qualifier").as[(String, String)].collect().sorted
    // the whole r1 row passes, including the cell that was not tested
    assert(got.sameElements(Array(("r1", "name"), ("r1", "seg"))))
  }

  test("FilterList nests MUST_PASS_ALL / MUST_PASS_ONE") {
    import spark.implicits._
    import graft.filters.Filters._
    val df = Seq(("1a", "v1"), ("1b", "v2"), ("2a", "v1"), ("3a", "v9")).toDF("rowkey", "value")
    val fl = MustPassOne(
      MustPassAll(Leaf(col("rowkey").startsWith("1")), Leaf(col("value") === "v1")),
      Leaf(col("rowkey").startsWith("3")))
    val got = df.where(fl.toColumn).select("rowkey").as[String].collect().sorted
    assert(got.sameElements(Array("1a", "3a")))
  }

  test("singleColumnValue keeps all cells of matching rows; filterIfMissing honored") {
    import spark.implicits._
    val cells = Seq(
      ("r1", "f", "seg", "HIT"), ("r1", "f", "other", "x"),
      ("r2", "f", "seg", "MISS"), ("r2", "f", "other", "y"),
      ("r3", "f", "other", "z") // lacks the checked column entirely
    ).toDF("rowkey", "family", "qualifier", "value")
    val strict = Filters.singleColumnValue(cells, "f", "seg",
      CompareOp.EQUAL, Comparators.binary("HIT"), filterIfMissing = true)
    assert(strict.select("rowkey").distinct().as[String].collect().sorted.sameElements(Array("r1")))
    assert(strict.count() == 2)
    // reference default: rows lacking the checked column pass through
    val lenient = Filters.singleColumnValue(cells, "f", "seg",
      CompareOp.EQUAL, Comparators.binary("HIT"))
    assert(lenient.select("rowkey").distinct().as[String].collect().sorted
      .sameElements(Array("r1", "r3")))
  }

  test("fuzzyRowFilter via codegen on real data") {
    import spark.implicits._
    val df = Seq("Customer#000000001", "Customer#000000011", "Customer#000000111").toDF("k")
    val got = df.where(Filters.fuzzyRowFilter(col("k"), "Customer#0000000?1"))
      .as[String].collect().sorted
    assert(got.sameElements(Array("Customer#000000001", "Customer#000000011")))
  }

  test("comparators") {
    import spark.implicits._
    val df = Seq(("alpha", 5L), ("beta", 6L), ("alphabet", 12L)).toDF("s", "n")
    assert(df.where(Comparators.substr("PHA")(col("s"), CompareOp.EQUAL)).count() == 2)
    assert(df.where(Comparators.regex("^al.*t$")(col("s"), CompareOp.EQUAL)).count() == 1)
    assert(df.where(Comparators.bitAnd(4L)(col("n"), CompareOp.EQUAL)).count() == 3)
    assert(df.where(Comparators.binaryPrefix("alp")(col("s"), CompareOp.EQUAL)).count() == 2)
  }

  test("skipFilter drops whole row when any cell fails") {
    import spark.implicits._
    val cells = Seq(
      ("r1", "f", "q1", "ok"), ("r1", "f", "q2", "bad"),
      ("r2", "f", "q1", "ok"), ("r2", "f", "q2", "ok")
    ).toDF("rowkey", "family", "qualifier", "value")
    val kept = Filters.skipFilter(cells, col("value") =!= "bad")
    assert(kept.select("rowkey").distinct().as[String].collect().sameElements(Array("r2")))
    assert(kept.count() == 2)
  }

  test("whileMatch stops at first failing key") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a")).toDF("k", "v")
    val got = Filters.whileMatch(df, "k", col("v") === "a")
    assert(got.select("k").as[Long].collect().sorted.sameElements(Array(1L, 2L)))
  }

  test("whileMatch on STRING rowkeys keeps every row when nothing fails") {
    import spark.implicits._
    // regression: the old Long.MaxValue sentinel coerced to the string
    // "92233…" on a VARCHAR key, silently dropping keys sorting above
    // it lexicographically ("95", "99") even though no row failed
    val df = Seq(("10", "a"), ("95", "a"), ("99", "a")).toDF("k", "v")
    val all = Filters.whileMatch(df, "k", col("v") === "a")
    assert(all.count() == 3, all.collect().mkString(","))
    // and the stop still works on string keys when a row does fail
    val part = Filters.whileMatch(
      Seq(("10", "a"), ("50", "b"), ("95", "a")).toDF("k", "v"),
      "k", col("v") === "a")
    assert(part.select("k").as[String].collect().sorted.sameElements(Array("10")))
  }

  test("columnPagination offsets per row") {
    val cells = Tables.customerCells(spark, sfDir)
    val page = Filters.columnPagination(cells, limit = 2, offset = 1)
    // each rowkey keeps exactly 2 cells (3 qualifiers exist, offset 1)
    val counts = page.groupBy("rowkey").count().select("count").distinct().collect()
    assert(counts.length == 1 && counts(0).getLong(0) == 2)
  }

  test("columnPagination on a versioned view paginates COLUMNS, newest version each") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ColumnPaginationFilter.java:135-141 returns NEXT_COL /
    // INCLUDE_AND_NEXT_COL: count increments once per COLUMN and the
    // scanner skips the remaining versions — so offset/limit index
    // distinct (family, qualifier) pairs and only the newest version
    // of each selected column surfaces. Column a has 2 versions: cell
    // pagination would return a's OLDER version at offset 1; column
    // pagination must return b's newest.
    val cells = Seq(
      ("1", "f", "a", 20L, "a-new"), ("1", "f", "a", 10L, "a-old"),
      ("1", "f", "b", 20L, "b-new"), ("1", "f", "b", 10L, "b-old"),
      ("1", "f", "c", 10L, "c-only"))
      .toDF("rowkey", "family", "qualifier", "ts", "value")
    val ord = Seq(col("family"), col("qualifier"), col("ts").desc, col("value"))
    val got = Filters.columnPagination(cells, limit = 1, offset = 1, ord)
      .select("qualifier", "value").as[(String, String)].collect().toSeq
    assert(got == Seq(("b", "b-new")), s"got $got")
    // offset 0, limit 2: newest version of each of the first two columns
    val two = Filters.columnPagination(cells, limit = 2, offset = 0, ord)
      .select("value").as[String].collect().toSet
    assert(two == Set("a-new", "b-new"), s"got $two")
  }

  test("firstKeyOnly yields one cell per row") {
    val cells = Tables.customerCells(spark, sfDir)
    val fk = Filters.firstKeyOnly(cells)
    assert(fk.count() == Tables.load(spark, sfDir, "customer").count())
  }

  test("firstKeyValueMatchingQualifiers stops after first match, no-match rows pass whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cells = Seq(
      // row 1: a, b(match), c — stop AFTER b, c skipped
      ("1", "f", "a", "v1"), ("1", "f", "b", "v2"), ("1", "f", "c", "v3"),
      // row 2: no matching qualifier anywhere — everything emits
      ("2", "f", "a", "v4"), ("2", "f", "c", "v5"),
      // row 3: the match IS the first cell — only it emits
      ("3", "f", "b", "v6"), ("3", "f", "c", "v7")
    ).toDF("rowkey", "family", "qualifier", "value")
    val got = cells.withColumn("_keep",
        Filters.firstKeyValueMatchingQualifiers(Seq("b", "x")))
      .where(col("_keep")).drop("_keep")
      .select("rowkey", "qualifier").as[(String, String)].collect().toSet
    assert(got == Set(("1", "a"), ("1", "b"), ("2", "a"), ("2", "c"), ("3", "b")),
      s"got $got")
    // DSL production lowers to the same predicate
    val dsl = graft.filters.ParseFilter.filter(cells,
        "FirstKeyValueMatchingQualifiersFilter('b', 'x')")
      .select("rowkey", "qualifier").as[(String, String)].collect().toSet
    assert(dsl == got, s"dsl $dsl vs $got")
    // on a VERSIONED view the DSL must pick the newest-first version
    // order from the schema — same rows as the explicitly-ordered
    // library form, deterministically (ts ties broken by event_id)
    val vc = Tables.eventCells(spark, sfDir)
    val lib = vc.withColumn("_keep",
        Filters.firstKeyValueMatchingQualifiers(Seq("purchase", "signup"),
          Seq(col("family"), col("qualifier"), col("ts").desc, col("event_id").desc)))
      .where(col("_keep")).drop("_keep")
    val dslV = graft.filters.ParseFilter.filter(vc,
      "FirstKeyValueMatchingQualifiersFilter('purchase', 'signup')")
    assert(dslV.exceptAll(lib).isEmpty && lib.exceptAll(dslV).isEmpty,
      "DSL diverged from the versioned-order library form")
  }

  test("batchCells: every cell chunked, batches full except the last") {
    import spark.implicits._
    val cells = Tables.customerCells(spark, sfDir)  // 3 cells per row
    val b = graft.kv.Scans.batchCells(cells, 2)
    assert(b.count() == cells.count(), "chunking must not drop or add cells")
    // 3 cells at batch=2: batch 0 holds positions 0,1; batch 1 holds 0
    val shape = b.groupBy("batch_idx").agg(
        org.apache.spark.sql.functions.max("pos_in_batch").as("mx"))
      .as[(Long, Long)].collect().toMap
    assert(shape == Map(0L -> 1L, 1L -> 0L), s"unexpected chunk shape $shape")

    // VERSIONED view: two ts versions of one (family, qualifier) tie
    // under the default (family, qualifier) order — chunk assignment
    // was partition-order dependent (r12 kv review); the orderCols
    // hook (the storeLimit contract) pins it: newest version first
    import org.apache.spark.sql.functions.col
    val vcells = Seq(
      ("1", "f", "a", 20L, "new"), ("1", "f", "a", 10L, "old"),
      ("1", "f", "b", 10L, "b")).toDF("rowkey", "family", "qualifier", "ts", "value")
    val vb = graft.kv.Scans.batchCells(vcells, 2,
        orderCols = Seq(col("family"), col("qualifier"), col("ts").desc))
      .orderBy("batch_idx", "pos_in_batch")
      .select("value", "batch_idx", "pos_in_batch")
      .as[(String, Long, Long)].collect()
    assert(vb.sameElements(Array(("new", 0L, 0L), ("old", 0L, 1L),
      ("b", 1L, 0L))), vb.mkString(","))
  }

  test("storeLimit: per-(row, family) CELL pagination — offset skips, families independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // row 1 family f: 3 cells (a newest-first under ts desc), family g:
    // 1 cell; row 2 family f: 2 cells. storeLimit(limit=1, offset=1)
    // keeps the SECOND cell of each (row, family) — g and any
    // single-cell store yield nothing (offset past the end), and
    // unlike ColumnPaginationFilter the count is per family, not per row
    val cells = Seq(
      ("1", "f", "a", 30L, "f-a30"), ("1", "f", "a", 20L, "f-a20"),
      ("1", "f", "b", 10L, "f-b10"),
      ("1", "g", "x", 10L, "g-x10"),
      ("2", "f", "a", 20L, "f2-a20"), ("2", "f", "b", 10L, "f2-b10"))
      .toDF("rowkey", "family", "qualifier", "ts", "value")
    val got = graft.kv.Scans.storeLimit(cells, limit = 1, offset = 1,
        Seq(col("qualifier"), col("ts").desc, col("value")))
      .select("rowkey", "family", "value").as[(String, String, String)]
      .collect().toSet
    assert(got == Set(("1", "f", "f-a20"), ("2", "f", "f2-b10")), s"got $got")
  }

  test("familyTimeRange: listed families range-pruned, unlisted pass whole") {
    import spark.implicits._
    val v = Tables.eventCellsTwoFamilies(spark, sfDir)
    val got = graft.kv.Scans.familyTimeRange(v,
      Map("web" -> ("2024-01-10 00:00:00", "2024-01-20 00:00:00")))
    // unlisted family ('act') passes untouched
    assert(got.where(col("family") === "act").count() ==
      v.where(col("family") === "act").count())
    // listed family keeps exactly its window
    val webTs = got.where(col("family") === "web").select(col("ts").cast("string"))
      .as[String].collect()
    assert(webTs.nonEmpty && webTs.forall(t => t >= "2024-01-10" && t < "2024-01-20"))
  }

  test("visibility labels: DNF terms, negation, and the unlabelled cell") {
    import spark.implicits._
    val cells = Seq(
      (1L, "admin|ops"),           // neither auth -> hidden
      (2L, "public"),              // -> visible
      (3L, "internal&!embargo"),   // negated atom absent -> visible
      (4L, "internal&embargo"),    // embargo not held -> hidden
      (5L, "pii&internal|public"), // second term passes -> visible
      (6L, "!public"),             // held auth negated -> hidden
      (7L, null.asInstanceOf[String]), // unlabelled -> visible to all
      (8L, "")                     // empty -> visible to all
    ).toDF("k", "vis")
    val got = graft.kv.Visibility.applyAuths(cells, "vis", Seq("public", "internal"))
      .select("k").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 5L, 7L, 8L), s"got $got")
  }

  test("visibility: whitespace around operators does not deny an authorized scanner") {
    import spark.implicits._
    val cells = Seq(
      (1L, "secret & audit"),     // spaced AND — both held -> visible
      (2L, "secret | embargo"),   // spaced OR — first term held -> visible
      (3L, " ! embargo "),        // spaced negation of an unheld label -> visible
      (4L, "secret & embargo")    // embargo not held -> hidden
    ).toDF("k", "vis")
    val got = graft.kv.Visibility.applyAuths(cells, "vis", Seq("secret", "audit"))
      .select("k").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L), s"got $got")
  }

  test("visibility: malformed atoms default-DENY, never authorize") {
    import spark.implicits._
    // the unguarded "!" evaluated !array_contains(auths, "") = TRUE and
    // authorized EVERY scanner — the r12 kv review's visible-to-all
    // flip. Every malformed shape must deny, including for a scanner
    // holding zero labels.
    val cells = Seq(
      (1L, "!"),           // bare negation -> deny
      (2L, "public&!"),    // held label AND empty negation -> deny
      (3L, "x|!"),         // unheld term OR empty negation -> deny
      (4L, "a||b"),        // empty middle term is not satisfied...
      (5L, "public||b"),   // ...but a held NON-empty term still passes
      (6L, "&"),           // two empty atoms -> deny
      (7L, "! "),          // whitespace-padded bare negation -> deny
      // r13: negations of NON-LABELS — neg is non-empty but invalid,
      // so !array_contains(auths, neg) was TRUE for every scanner
      // (zero-label ones included), the same visible-to-all flip the
      // r12 fix closed for the bare "!"
      (9L, "!!public"),    // double negation -> deny
      (10L, "public&!!x"), // held label AND negated non-label -> deny
      (11L, "!a b"),       // negation of a space-broken token -> deny
      (12L, "!!"),         // negation of "!" itself -> deny
      // r13 review: rlike runs Matcher.find() where `$` matches
      // BEFORE a final newline — under ^...$ anchors "!x\n" passed
      // the label check and authorized every scanner (trim() strips
      // spaces, not \n); \A...\z anchors must deny
      (13L, "!x\n"),       // negation with trailing newline -> deny
      (14L, "public\n")    // held label + newline is NOT the label -> deny
    ).toDF("k", "vis")
    val some = graft.kv.Visibility.applyAuths(cells, "vis", Seq("public"))
      .select("k").as[Long].collect().toSet
    assert(some == Set(5L), s"authorized scanner got $some")
    val none = graft.kv.Visibility.applyAuths(cells, "vis", Nil)
      .select("k").as[Long].collect().toSet
    assert(none.isEmpty, s"zero-label scanner got $none")
  }

  test("visibility admin: NULL labels are invalid and duplicate op_idx refuses loudly") {
    import spark.implicits._
    // NULL label: rlike(NULL) skipped BOTH when-arms, so a never-added
    // label reported LabelAlreadyExistsException relationally and
    // NPE'd sequentially (r12 kv review) — both paths now agree on
    // InvalidLabelException
    val ops = Seq(
      (1L, "add_label", null.asInstanceOf[String], null.asInstanceOf[String]),
      (2L, "add_label", null.asInstanceOf[String], "ok_label"))
    val rel = graft.kv.Visibility.adminReplay(
        ops.toDF("op_idx", "op", "grantee", "label"))
      .orderBy("op_idx").select("outcome").as[String].collect()
    assert(rel.sameElements(Array("InvalidLabelException", "OK")), rel.mkString(","))
    val (seqOut, _) = graft.kv.Visibility.replayLocal(ops)
    assert(seqOut.map(_._5) == Seq("InvalidLabelException", "OK"))
    // duplicate op_idx: the min-aggregates would report two "first"
    // adds OK where the sequential replay fails the second — refuse
    val dup = Seq(
      (1L, "add_label", null.asInstanceOf[String], "a"),
      (1L, "add_label", null.asInstanceOf[String], "a"))
      .toDF("op_idx", "op", "grantee", "label")
    val e = intercept[IllegalArgumentException] {
      graft.kv.Visibility.adminReplay(dup)
    }
    assert(e.getMessage.contains("op_idx"), e.getMessage)
    // ...while replayLocal handles the same shape by input order
    val (dupSeq, _) = graft.kv.Visibility.replayLocal(Seq(
      (1L, "add_label", null, "a"), (1L, "add_label", null, "a")))
    assert(dupSeq.map(_._5) == Seq("OK", "LabelAlreadyExistsException"))
  }

  test("visibility admin: per-op outcomes, auth changes flip cell visibility") {
    import spark.implicits._
    // op log: add secret+audit (audit re-added = dupe, one invalid);
    // alice granted both, bob granted a ghost; alice's audit cleared,
    // her never-held embargo clear fails
    val ops = Seq(
      (1L, "add_label", null.asInstanceOf[String], "secret"),
      (2L, "add_label", null.asInstanceOf[String], "audit"),
      (3L, "add_label", null.asInstanceOf[String], "bad label!"),
      (4L, "add_label", null.asInstanceOf[String], "audit"),
      (10L, "set_auths", "alice", "secret"),
      (11L, "set_auths", "alice", "audit"),
      (12L, "set_auths", "bob", "ghost"),
      (20L, "clear_auths", "alice", "audit"),
      (21L, "clear_auths", "alice", "embargo")
    ).toDF("op_idx", "op", "grantee", "label")
    val out = graft.kv.Visibility.adminReplay(ops).orderBy("op_idx")
      .select("op_idx", "outcome").as[(Long, String)].collect()
    assert(out.sameElements(Array(
      (1L, "OK"), (2L, "OK"), (3L, "InvalidLabelException"),
      (4L, "LabelAlreadyExistsException"),
      (10L, "OK"), (11L, "OK"), (12L, "InvalidLabelException"),
      (20L, "OK"), (21L, "InvalidLabelException"))), out.mkString(","))
    // getAuths: alice keeps only secret (audit cleared), bob nothing
    val auths = graft.kv.Visibility.finalAuths(ops)
      .as[(String, String)].collect().toSet
    assert(auths == Set(("alice", "secret")))
    // the flip: before the clear alice held {secret, audit} and saw
    // the audit-labelled cell; with her POST-replay auth set the same
    // scan hides it — an auth mutation changed read results
    val cells = Seq((1L, "secret"), (2L, "audit"), (3L, null.asInstanceOf[String]))
      .toDF("k", "vis")
    def visible(a: Seq[String]) = graft.kv.Visibility.applyAuths(cells, "vis", a)
      .select("k").as[Long].collect().toSet
    assert(visible(Seq("secret", "audit")) == Set(1L, 2L, 3L))
    val after = auths.collect { case ("alice", l) => l }.toSeq
    assert(visible(after) == Set(1L, 3L))
    // the relational replay supports one set + one clear per pair; a
    // re-grant cycle must fail LOUDLY, not answer "not held"
    val cycle = Seq(
      (1L, "add_label", null.asInstanceOf[String], "secret"),
      (10L, "set_auths", "alice", "secret"),
      (20L, "clear_auths", "alice", "secret"),
      (30L, "set_auths", "alice", "secret")
    ).toDF("op_idx", "op", "grantee", "label")
    val e = intercept[IllegalArgumentException] {
      graft.kv.Visibility.finalAuths(cycle).collect()
    }
    assert(e.getMessage.contains("RE-GRANTED after a successful clear"))
    // a REPEATED clear is an ordinary admin retry, not a cycle: the
    // second clear fails per-op ("not set"), finalAuths stays calm
    val retry = Seq(
      (1L, "add_label", null.asInstanceOf[String], "secret"),
      (10L, "set_auths", "alice", "secret"),
      (20L, "clear_auths", "alice", "secret"),
      (21L, "clear_auths", "alice", "secret")
    ).toDF("op_idx", "op", "grantee", "label")
    val retryOut = graft.kv.Visibility.adminReplay(retry)
      .where(col("op") === "clear_auths").orderBy("op_idx")
      .select("op_idx", "outcome").as[(Long, String)].collect()
    assert(retryOut.sameElements(Array(
      (20L, "OK"), (21L, "InvalidLabelException"))), retryOut.mkString(","))
    assert(graft.kv.Visibility.finalAuths(retry).collect().isEmpty)
  }

  test("DSL ColumnCountGetFilter is version-deterministic on a versioned view") {
    import spark.implicits._
    // two versions of the SAME (family, qualifier): the survivor must
    // be the NEWEST (ts desc, event_id tiebreak), not partition luck
    val cells = Seq(
      (1L, "ev", "click", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "new", 20L),
      (1L, "ev", "click", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "old", 10L))
      .toDF("rowkey", "family", "qualifier", "ts", "value", "event_id")
      .repartition(4)
    (1 to 3).foreach { _ =>
      val got = graft.filters.ParseFilter
        .filter(cells, "ColumnCountGetFilter(1)").collect()
      assert(got.length == 1 && got(0).getAs[String]("value") == "new",
        got.mkString(","))
    }
  }

  test("DSL SKIP/WHILE refuse window-shaped inner filters with a clear error") {
    val scvf = "SingleColumnValueFilter('info','c_mktsegment',=,'binary:BUILDING')"
    for (outer <- Seq(s"SKIP $scvf", s"WHILE $scvf", "SKIP FirstKeyOnlyFilter()")) {
      val e = intercept[IllegalArgumentException] {
        graft.filters.ParseFilter.filter(
          graft.core.Tables.customerCells(spark, sfDir), outer).collect()
      }
      assert(e.getMessage.contains("window-shaped"), s"$outer: ${e.getMessage}")
    }
  }

  test("DSL ColumnPaginationFilter: Int-max limit does not wrap the bound negative") {
    import spark.implicits._
    val cells = Seq(
      (1L, "f", "a", "v1"), (1L, "f", "b", "v2"), (1L, "f", "c", "v3"))
      .toDF("rowkey", "family", "qualifier", "value")
    val got = graft.filters.ParseFilter
      .filter(cells, "ColumnPaginationFilter(2147483647, 1)")
      .select("qualifier").collect().map(_.getString(0)).sorted
    // everything after the first cell — a wrapped Int bound returns nothing
    assert(got.toSeq == Seq("b", "c"), got.mkString(","))
  }

  test("r13 filter review fixes: any-key sampler, bare-millis TimestampsFilter, open ranges, keyOnly, loud errors") {
    import spark.implicits._
    import graft.filters.{Filters, ParseFilter}

    // randomRowFilterAnyKey samples STRING keys (the plain sampler
    // documents integral-only; a string key coerced pmod to DOUBLE and
    // silently diverged from the integer oracle)
    val skeys = (1 to 400).map(i => s"user$i").toDF("rowkey")
    val n = skeys.where(Filters.randomRowFilterAnyKey(col("rowkey"), 0.25)).count()
    assert(n > 40 && n < 180, s"string-key sample kept $n of 400")
    // ...and it IS the DSL arm's path: identical row sets
    val viaDsl = ParseFilter.filter(
      skeys.withColumn("family", lit("f")).withColumn("qualifier", lit("q"))
        .withColumn("value", lit("v")),
      "RandomRowFilter(0.25)").select("rowkey").as[String].collect().toSet
    val viaApi = skeys.where(Filters.randomRowFilterAnyKey(col("rowkey"), 0.25))
      .select("rowkey").as[String].collect().toSet
    assert(viaDsl == viaApi)

    // TimestampsFilter accepts the REFERENCE grammar's bare epoch
    // millis; quoted datetimes stay as the extension; garbage raises
    // loudly instead of ts IN (NULL) = silently empty
    val vc = Seq(
      (1L, "ev", "click", "2024-01-01 00:00:00", "v1"),
      (1L, "ev", "click", "2024-01-02 00:00:00", "v2")
    ).toDF("rowkey", "family", "qualifier", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val millis = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val bare = ParseFilter.filter(vc, s"TimestampsFilter($millis)")
      .select("value").as[String].collect().toSet
    assert(bare == Set("v1"), bare.toString)
    val loud = intercept[Throwable] {
      ParseFilter.filter(vc, "TimestampsFilter('not a time')").collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => String.valueOf(e.getMessage)).mkString(" | ")
    assert(chain(loud).contains("unparseable timestamp") ||
      chain(loud).toLowerCase.contains("cast"), chain(loud))

    // multiRowRange: empty bound = UNBOUNDED (HBase RowRange), not
    // keyCol < '' = always-false
    val rows = Seq("1", "3", "5", "7", "9").toDF("rowkey")
    val open = rows.where(Filters.multiRowRange(col("rowkey"),
      Seq(("5", "")))).as[String].collect().toSet
    assert(open == Set("5", "7", "9"), open.toString)
    val openLo = rows.where(Filters.multiRowRange(col("rowkey"),
      Seq(("", "5")))).as[String].collect().toSet
    assert(openLo == Set("1", "3"), openLo.toString)

    // keyOnly blanks the value IN PLACE (reference-faithful, shared
    // with the DSL lowering) — schema unchanged
    val cells = Seq(("1", "f", "q", "secret")).toDF("rowkey", "family", "qualifier", "value")
    val ko = Filters.keyOnly(cells)
    assert(ko.columns.toSeq == cells.columns.toSeq)
    assert(ko.select("value").as[String].head() == "")

    // long: comparator gives a positioned error, not a raw
    // NumberFormatException
    val e = intercept[IllegalArgumentException] {
      ParseFilter.filter(cells, "ValueFilter(=, 'long:1a')")
    }
    assert(e.getMessage.contains("expected long"), e.getMessage)

    // the impure-OR refusal names FirstKeyValueMatchingQualifiersFilter
    val e2 = intercept[IllegalArgumentException] {
      ParseFilter.filter(cells,
        "FirstKeyValueMatchingQualifiersFilter('q') OR ValueFilter(=, 'binary:x')")
    }
    assert(e2.getMessage.contains("FirstKeyValueMatchingQualifiers"), e2.getMessage)

    // substr folds BOTH sides through the engine's lower(): a
    // non-ASCII value (default-locale fallback territory) still
    // matches a differently-cased needle
    import graft.filters.{Comparators, CompareOp}
    val funky = Seq(("1", "f", "q", "BÜILDING-IST")).toDF("rowkey", "family", "qualifier", "value")
    val hit = funky.where(Comparators.substr("büilding-i")(col("value"), CompareOp.EQUAL)).count()
    assert(hit == 1L)
  }
}
