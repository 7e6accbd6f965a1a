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
    * silently DENY a fully authorized scanner). */
  def visibleExpr(vis: Column, auths: Seq[String]): Column = {
    val authArr = array(auths.map(lit): _*)
    val satisfied = exists(split(vis, "\\|"), term =>
      forall(split(term, "&"), rawAtom => {
        val atom = trim(rawAtom)
        when(atom.startsWith("!"),
          !array_contains(authArr, trim(substring(atom, 2, Int.MaxValue))))
        .otherwise(array_contains(authArr, atom))
      }))
    vis.isNull || vis === "" || satisfied
  }

  /** Scan-with-Authorizations: keep cells the auth set may see. */
  def applyAuths(cells: DataFrame, visCol: String, auths: Seq[String]): DataFrame =
    cells.where(visibleExpr(col(visCol), auths))
}
