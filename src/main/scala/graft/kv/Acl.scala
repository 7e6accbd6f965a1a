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
  def enforceRead(cells: DataFrame, grants: DataFrame,
                  user: String, table: String): DataFrame = {
    val g = grants
      .where(col("grantee") === user && instr(col("perm"), "R") > 0 &&
        (col("tbl").isNull || col("tbl") === table))
      .select(col("family").as("_gf"), col("qualifier").as("_gq"))
    cells.join(broadcast(g),
      (col("_gf").isNull || col("_gf") === col("family")) &&
        (col("_gq").isNull || col("_gq") === col("qualifier")),
      "left_semi")
  }

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
    val g = grants
      .where(col("grantee") === user && instr(col("perm"), "R") > 0 &&
        (col("tbl").isNull || col("tbl") === table))
      .select(col("family").as("_gf"), col("qualifier").as("_gq"))
    val cover = (col("_gf").isNull || col("_gf") === col("family")) &&
      (col("_gq").isNull || col("_gq") === col("qualifier"))
    // the tag must actually CARRY a perms suffix: on a colon-less tag
    // substring_index returns the whole string for BOTH positions, so
    // a malformed tag equal to a username containing 'R' would
    // authorize the cell with no grant at all — a default-deny
    // violation (the DuckDB oracle's split_part already denies it:
    // the missing second field is '')
    val cellOk = col("cell_acl").isNotNull &&
      instr(col("cell_acl"), ":") > 0 &&
      substring_index(col("cell_acl"), ":", 1) === user &&
      instr(substring_index(col("cell_acl"), ":", -1), "R") > 0
    val byHierarchy = cells.join(broadcast(g), cover, "left_semi")
      .withColumn("acl_source", lit("table"))
    val byCell = cells.where(cellOk)
      .join(broadcast(g), cover, "left_anti")
      .withColumn("acl_source", lit("cell"))
    byHierarchy.unionByName(byCell)
  }
}
