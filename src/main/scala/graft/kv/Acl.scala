package graft.kv

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AccessController read-path enforcement — the grant-table half of
  * HBase security, next to [[Visibility]]'s label half.
  *
  * Reference semantics (hbase-server/.../security/access/
  * AccessController.java:299 `permissionGranted`, walking
  * TableAuthManager's cached `_acl_` rows): a read is authorized iff a
  * READ grant COVERS it at some level of the hierarchy — global (table
  * NULL), table (family NULL), family (qualifier NULL), or the exact
  * qualifier — and DENIED by default when no grant covers it. The
  * reference short-circuits per request; re-expressed relationally the
  * same walk becomes per-cell masking: keep exactly the cells some
  * covering grant reaches.
  */
object Acl {

  /** Mask `cells` down to what `user` may read from `table`.
    *
    * `grants` is the `_acl_` system table: (grantee, tbl, family,
    * qualifier, perm), NULL = "whole level below" exactly as the
    * reference stores it (AccessControlLists.java — the `_acl_` row
    * per table, qualifier per grantee). perm is the action string
    * ("R", "RW", ...); cover requires 'R'.
    *
    * Plan shape: the user's relevant grants (a handful of rows after
    * the grantee+table filter) BROADCAST beside the scan; the NULL-
    * wildcard hierarchy makes the cover test inherently non-equi, so
    * enforcement is a broadcast left-semi nested-loop — the data side
    * streams straight from the scan with NO shuffle, each cell
    * evaluated against the in-memory grant list, which is precisely
    * what a regionserver's AuthManager cache does per cell batch. */
  /** The user's covering READ grants — ONE copy of the grantee/perm/
    * table filter both read paths share (a grant-semantics change must
    * land once, not be hand-synced). */
  private def userReadGrants(grants: DataFrame, user: String,
                             table: String): DataFrame =
    grants
      .where(col("grantee") === user && instr(col("perm"), "R") > 0 &&
        (col("tbl").isNull || col("tbl") === table))
      .select(col("family").as("_gf"), col("qualifier").as("_gq"))

  /** The hierarchy cover predicate over [[userReadGrants]]' columns. */
  private def cover =
    (col("_gf").isNull || col("_gf") === col("family")) &&
      (col("_gq").isNull || col("_gq") === col("qualifier"))

  def enforceRead(cells: DataFrame, grants: DataFrame,
                  user: String, table: String): DataFrame =
    cells.join(broadcast(userReadGrants(grants, user, table)), cover,
      "left_semi")

  /** Cell-level ACL read enforcement (hbase-server/.../security/access/
    * AccessController.java — HBASE-7662's per-cell ACLs: Mutation#setACL
    * writes a serialized perm list as a cell TAG, and the read path
    * authorizes a cell when the table/family/qualifier hierarchy check
    * fails but the cell's own ACL grants READ). Composition, exactly
    * the reference's check order: a cell is visible iff a hierarchy
    * grant covers it ([[enforceRead]]) OR its `cell_acl` tag names the
    * user with 'R'.
    *
    * Plan shape: the OR is materialized as two DISJOINT broadcast
    * joins — hierarchy cover via the left-semi, cell-only grants via a
    * left-ANTI against the same broadcast grant list (cells whose tag
    * matches but that no hierarchy grant reaches) — so the union never
    * needs a dedup shuffle; both sides stream from the scan.
    *
    * @param cells must carry a `cell_acl` string column,
    *              "user:perms" or NULL (the tag payload). */
  def enforceReadCellAcls(cells: DataFrame, grants: DataFrame,
                          user: String, table: String): DataFrame = {
    val g = userReadGrants(grants, user, table)
    // the perms live in the SECOND colon field — exactly like the
    // oracle's split_part(cell_acl, ':', 2). A colon-less tag has no
    // second field (default-deny: a tag equal to a username containing
    // 'R' must not authorize), and a multi-colon tag "carol:junk:R"
    // must read "junk", not the LAST field — substring_index(-1) took
    // the last, so appending ':R' to any tag authorized it (the r11
    // review's default-deny violation, invisible to the oracle gate
    // because split_part already read field 2)
    val fields = split(col("cell_acl"), ":")
    val cellOk = col("cell_acl").isNotNull &&
      size(fields) >= 2 &&
      element_at(fields, 1) === user &&
      instr(element_at(fields, 2), "R") > 0
    val byHierarchy = cells.join(broadcast(g), cover, "left_semi")
      .withColumn("acl_source", lit("table"))
    val byCell = cells.where(cellOk)
      .join(broadcast(g), cover, "left_anti")
      .withColumn("acl_source", lit("cell"))
    byHierarchy.unionByName(byCell)
  }
}
