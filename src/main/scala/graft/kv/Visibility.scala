package graft.kv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cell-level visibility labels — the VisibilityController coprocessor
  * (hbase-server/.../security/visibility/VisibilityController.java,
  * expression grammar per ExpressionParser.java). A cell carries a
  * visibility expression; a scan carries Authorizations(labels) and
  * returns only cells whose expression the auth set satisfies.
  *
  * Supported grammar: disjunctive normal form — `|`-separated terms,
  * each a `&`-separated list of atoms, atom = label or `!label`
  * (reference operators OR/AND/NOT; parenthesized nesting can always
  * be rewritten to DNF at tag-write time, which is where the reference
  * compiles expressions too). NULL/empty expression = visible to all,
  * matching unlabelled cells in the reference.
  *
  * Evaluation is pure codegen'd array algebra over `split` — a
  * per-cell predicate with NO shuffle, NO UDF; at 100 TB it rides the
  * scan like any other pushed filter. The auth set is a literal array
  * (a scan's auths are a handful of labels).
  */
object Visibility {

  /** The predicate: does `vis` authorize a scanner holding `auths`?
    * Atoms are TRIMMED before the auth lookup — the reference's
    * ExpressionParser skips whitespace, so "secret & audit" must mean
    * the same labels as "secret&audit" (an untrimmed atom would
    * silently DENY a fully authorized scanner).
    *
    * MALFORMED atoms default-DENY (r12 kv review, tightened r13): an
    * empty atom — "a||b"'s middle term, a bare "&", or the negation
    * "!" with nothing after it — makes its term unsatisfied for every
    * auth set. The reference rejects these at parse time; here the
    * unguarded "!" evaluated !array_contains(auths, "") = TRUE and
    * authorized EVERY scanner, zero-label ones included. The r13
    * tightening closes the same flip for NEGATIONS OF NON-LABELS:
    * "!!a" left neg = "!a" — non-empty, never in any auth set — so
    * !array_contains was again TRUE for everyone. A negated atom now
    * authorizes only when the negated token is a VALID label
    * ([[labelRegex]], the alphabet addLabels itself enforces); any
    * other negation denies, matching the parse-time rejection. */
  def visibleExpr(vis: Column, auths: Seq[String]): Column = {
    val authArr = array(auths.map(lit): _*)
    val satisfied = exists(split(vis, "\\|"), term =>
      forall(split(term, "&"), rawAtom => {
        val atom = trim(rawAtom)
        val neg = trim(substring(atom, 2, Int.MaxValue))
        when(atom === "", lit(false))
          .when(atom.startsWith("!"),
            neg.rlike(labelRegex) && !array_contains(authArr, neg))
          .otherwise(array_contains(authArr, atom))
      }))
    vis.isNull || vis === "" || satisfied
  }

  /** Scan-with-Authorizations: keep cells the auth set may see. */
  def applyAuths(cells: DataFrame, visCol: String, auths: Seq[String]): DataFrame =
    cells.where(visibleExpr(col(visCol), auths))

  /** VisibilityLabelsValidator.regex (hbase-client/.../security/
    * visibility/VisibilityLabelsValidator.java:31) — the full-match
    * label alphabet addLabels enforces. Anchored with \A...\z, NOT
    * ^...$ (r13 review): Spark's rlike runs Matcher.find(), where
    * Java's `$` matches BEFORE a final line terminator — so "ops\n"
    * passed the ^...$ form, and a negated "!ops\n" atom authorized
    * every scanner (the token is never in any auth set). \z admits
    * no terminator; String.matches (replayLocal) treats both forms
    * as full-region, so the two engines agree under \A...\z. */
  private val labelRegex = "\\A[A-Za-z_\\-:/.0-9]+\\z"

  /** VisibilityClient admin surface replayed over an op log
    * (hbase-client/.../security/visibility/VisibilityClient.java
    * addLabels/setAuths/clearAuths; service semantics per
    * DefaultVisibilityLabelServiceImpl.java:215/245/284): one outcome
    * row per op, exactly the per-label OperationStatus array the
    * client reads back —
    *  - `add_label`: regex-invalid label → InvalidLabelException; a
    *    label already added → LabelAlreadyExistsException; first valid
    *    add wins.
    *  - `set_auths`: the label must have been added (successfully,
    *    earlier) → else InvalidLabelException ("doesn't exists").
    *  - `clear_auths`: the grantee must hold the auth (an earlier
    *    successful set) → else InvalidLabelException ("not set for
    *    the user").
    *
    * Ops are (op_idx, op, grantee, label); `op_idx` orders the log
    * and must be UNIQUE — a duplicated index refuses loudly (the
    * min-aggregates would report two "first" ops OK where the
    * sequential replay fails the second; replayLocal's input-order
    * tiebreak is the escape). With unique indices the replay is
    * RELATIONAL (first-add / grant-epoch min-aggregates
    * + broadcast-size joins, no sequential fold) and EXACT against
    * [[replayLocal]] on every log shape, re-grant cycles included:
    * repeated sets of a held auth succeed (idempotent, as in the
    * service); a clear's GRANT EPOCH is the latest successful set
    * before it, and within an epoch only the FIRST clear finds the
    * auth held (a later set re-arms the state, so each epoch's first
    * clear succeeds and retries fail "not set for the user").
    * [[finalAuths]]' set-minus-clear anti-join still cannot represent
    * held-AGAIN and keeps its loud re-grant guard. Label/auth tables
    * are metadata: a few rows per label, never corpus-sized. */
  def adminReplay(ops: DataFrame): DataFrame = {
    // DUPLICATE op_idx refuses loudly (r12 kv review): the relational
    // replay keys first-add/first-clear on op_idx, so two ops sharing
    // an index both look "first" and both report OK where the
    // sequential replay (stable input order) fails the second — the
    // one log shape the min-aggregates cannot represent. The op log is
    // admin metadata; the probe is a metadata-sized job (the
    // finalAuths re-grant guard's pattern). replayLocal handles
    // duplicate indices by documented input-order tiebreak.
    val dup = ops.groupBy("op_idx").count().where(col("count") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"adminReplay: op_idx ${dup.head.get(0)} appears more than once — " +
        "the relational replay needs unique indices; re-index the log " +
        "or replay it sequentially (Visibility.replayLocal)")
    // a NULL grantee on set/clear refuses loudly in BOTH replays (r15
    // review): it is invisible to every (grantee, label) equi-join
    // here (null-unsafe), so a NULL-grantee clear silently reported
    // InvalidLabelException while replayLocal cleared it — and
    // finalAuths then kept the "cleared" auth. There is no NULL user
    // (the reference's setAuths/clearAuths take a required user), so
    // the log shape is refused rather than half-modeled. The op log is
    // admin metadata; the probe is a metadata-sized job.
    val nullG = ops.where(col("op").isin("set_auths", "clear_auths") &&
      col("grantee").isNull).limit(1).collect()
    require(nullG.isEmpty,
      "adminReplay: set/clear op with NULL grantee — there is no NULL " +
        "user; fix the op log")
    // a NULL label is invalid on its face: without the isNotNull leg,
    // rlike(NULL) made BOTH when-arms skip and a never-added label
    // reported LabelAlreadyExistsException (r12 kv review)
    val valid = col("label").isNotNull && col("label").rlike(labelRegex)
    val adds = ops.where(col("op") === "add_label")
    val born = adds.where(valid).groupBy("label").agg(min("op_idx").as("_born"))
    val addOut = adds.join(broadcast(born), Seq("label"), "left")
      .withColumn("outcome",
        when(!valid, "InvalidLabelException")
          .when(col("op_idx") === col("_born"), "OK")
          .otherwise("LabelAlreadyExistsException"))
      .drop("_born")
    val sets = ops.where(col("op") === "set_auths")
    val setOut = sets.join(broadcast(born), Seq("label"), "left")
      .withColumn("outcome",
        when(col("_born").isNotNull && col("_born") < col("op_idx"), "OK")
          .otherwise("InvalidLabelException"))
      .drop("_born")
    val okSets = setOut.where(col("outcome") === "OK")
      .select(col("grantee"), col("label"), col("op_idx").as("_set"))
    val clears = ops.where(col("op") === "clear_auths")
    // a clear's GRANT EPOCH = the latest successful set before it.
    // Within an epoch only the FIRST clear finds the auth held: the
    // epoch's set re-armed the state whatever happened before, and no
    // set intervenes until the epoch changes — so min-per-epoch is
    // exactly the sequential semantics (OK once, retries fail "not
    // set for the user"), including set→clear→set→clear re-grant
    // cycles the earlier first-grant keying got wrong (an r11 fix:
    // the second cycle's clear was InvalidLabelException here but OK
    // in replayLocal). A clear with NO earlier successful set has a
    // NULL epoch and fails.
    // epochs computed on the DISTINCT (grantee, label, op_idx) keys,
    // then joined BACK onto the original clear rows: grouping the rows
    // themselves would collapse duplicate identical ops into one
    // outcome slot, where add/set ops keep one slot per input row (the
    // per-op OperationStatus array contract) — and it also preserves
    // any extra columns the op log carries
    val clearEpoch = clears.select("grantee", "label", "op_idx").distinct()
      .join(broadcast(okSets), Seq("grantee", "label"), "left")
      .groupBy("grantee", "label", "op_idx")
      .agg(max(when(col("_set") < col("op_idx"), col("_set"))).as("_epoch"))
    val firstInEpoch = clearEpoch.where(col("_epoch").isNotNull)
      .groupBy("grantee", "label", "_epoch").agg(min("op_idx").as("_fc"))
    val clearOut = clears
      .join(broadcast(clearEpoch), Seq("grantee", "label", "op_idx"), "left")
      .join(broadcast(firstInEpoch), Seq("grantee", "label", "_epoch"), "left")
      .withColumn("outcome",
        when(col("_epoch").isNotNull && col("op_idx") === col("_fc"), "OK")
          .otherwise("InvalidLabelException"))
      .drop("_epoch", "_fc")
    addOut.unionByName(setOut).unionByName(clearOut)
  }

  /** The admin service as the literal sequential state machine, run on
    * the DRIVER (labels set + per-user auth sets, ops in `op_idx`
    * order; ties keep input order — the registered log never makes
    * same-idx ops interact). Same per-op semantics as [[adminReplay]]
    * (op-for-op, re-grant cycles included), and unlike [[finalAuths]]
    * it also REPRESENTS the held-again state: a set→clear→set
    * sequence simply re-grants.
    *
    * This exists because the op log is METADATA — tens of rows, never
    * corpus-sized. Replaying it relationally costs a dozen tiny Spark
    * jobs whose fixed overhead dwarfs the work (the r9 driver bench
    * measured 11.5 s steady-state for a handful-of-labels answer);
    * replaying it here costs microseconds, and the caller ships ONE
    * literal relation into the rest of the plan. [[adminReplay]] stays
    * the scale path for a log that somehow outgrows the driver.
    *
    * Returns (per-op outcome rows, surviving (grantee, label) auths —
    * the getAuths view). */
  def replayLocal(ops: Seq[(Long, String, String, String)])
      : (Seq[(Long, String, String, String, String)], Seq[(String, String)]) = {
    val labels = scala.collection.mutable.Set[String]()
    val auths = scala.collection.mutable.LinkedHashSet[(String, String)]()
    // unknown ops are SKIPPED (no outcome row), matching adminReplay's
    // relational filters — not a MatchError on a stray probe row
    val outcomes = ops.sortBy(_._1).flatMap { case (idx, op, g, l) =>
      val res = op match {
        case "add_label" =>
          // NULL label = invalid, not an NPE (r12 kv review — the
          // relational twin reports InvalidLabelException too)
          if (l == null || !l.matches(labelRegex)) Some("InvalidLabelException")
          else if (labels(l)) Some("LabelAlreadyExistsException")
          else { labels += l; Some("OK") }
        case "set_auths" =>
          // NULL grantee refuses like adminReplay's probe (r15 review:
          // the tuple key silently accepted it here while the
          // relational joins could not see it — the one log shape the
          // two replays disagreed on)
          require(g != null, s"replayLocal: set_auths op $idx with NULL " +
            "grantee — there is no NULL user; fix the op log")
          if (!labels(l)) Some("InvalidLabelException")
          else { auths += ((g, l)); Some("OK") }
        case "clear_auths" =>
          require(g != null, s"replayLocal: clear_auths op $idx with NULL " +
            "grantee — there is no NULL user; fix the op log")
          if (!auths((g, l))) Some("InvalidLabelException")
          else { auths -= ((g, l)); Some("OK") }
        case _ => None
      }
      res.map(r => (idx, op, g, l, r))
    }
    (outcomes, auths.toSeq)
  }

  /** getAuths after the replay: the (grantee, label) grants that
    * survive — successful sets minus successful clears. The auth set
    * a scan's effective Authorizations are intersected with, so a
    * clear here FLIPS cell visibility on the next read (the
    * before/after contract the spec asserts via [[applyAuths]]).
    *
    * The relational-replay contract (one set + one clear per pair) is
    * ENFORCED here, not assumed: a set→clear→set re-grant cycle would
    * make the set-minus-clear anti-join silently report the re-granted
    * auth as not held — so any (grantee, label) with multiple
    * successful sets or clears fails loudly instead (the op log is
    * admin metadata; the existence probe is a metadata-sized job). */
  def finalAuths(ops: DataFrame): DataFrame = {
    val replay = adminReplay(ops)
    val ok = replay.where(col("outcome") === "OK")
    // the one shape the set-minus-clear anti-join cannot represent is
    // a RE-GRANT: a successful set AFTER the successful clear (the
    // auth is held again, but the anti-join would report it gone).
    // Repeated clears now fail per-op in adminReplay and extra sets
    // BEFORE the clear change nothing, so only the genuine cycle
    // fails loudly (the op log is admin metadata; the probe is a
    // metadata-sized job).
    val okClears = ok.where(col("op") === "clear_auths")
      .select(col("grantee"), col("label"), col("op_idx").as("_c"))
    val regrant = ok.where(col("op") === "set_auths")
      .join(okClears, Seq("grantee", "label"))
      .where(col("op_idx") > col("_c")).limit(1).collect()
    require(regrant.isEmpty, {
      val r = regrant.head
      s"finalAuths: (${r.get(0)}, ${r.get(1)}) is RE-GRANTED after a " +
        "successful clear — the set-minus-clear anti-join cannot " +
        "represent a re-grant cycle; replay it sequentially " +
        "(Visibility.replayLocal) or split the log per epoch"
    })
    ok.where(col("op") === "set_auths").select("grantee", "label").distinct()
      .join(ok.where(col("op") === "clear_auths").select("grantee", "label"),
        Seq("grantee", "label"), "left_anti")
  }
}
