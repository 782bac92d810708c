package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-identity expressions (SURVEY.md §1.4).
  *
  * The reference derives `_dlt_id` three ways (dlt/common/normalizers/json/
  * helpers.py:107-180): `random`, `row_hash` (content digest over sorted
  * non-dlt columns), `key_hash` (primary-key digest); child rows always get
  * the deterministic digest of `{parent_row_id}_{table}_{idx}`.
  *
  * Byte-compatibility with dlt's shake-128 ids is not required (SURVEY §4) —
  * only internal determinism — so ids here are 20-char base64 of the first
  * 15 bytes of sha2-256, fully codegen'd Catalyst expressions (no UDFs) and
  * therefore safe and fast at 100 TB scale.
  */
object Ids {
  val DltId = "_dlt_id"
  val DltParentId = "_dlt_parent_id"
  val DltListIdx = "_dlt_list_idx"
  val DltRootId = "_dlt_root_id"
  val DltLoadId = "_dlt_load_id"

  val systemColumns: Seq[String] = Seq(DltId, DltParentId, DltListIdx, DltRootId, DltLoadId)

  /** base64(first 15 bytes of sha2-256(s)) — 20-char id, deterministic. */
  private def digest(c: Column): Column =
    base64(substring(unhex(sha2(c, 256)), 1, 15))

  /** Random row id (plain append tables; reference `generate_dlt_id`). */
  def randomId(): Column = digest(expr("uuid()"))

  /** Content hash over the given columns, ordered by column name, dlt system
    * columns excluded — reference get_row_hash (helpers.py:161-174). Used as
    * `_dlt_id` for SCD2 (`row_hash`) and as the change-detection hash.
    */
  def rowHash(columns: Seq[String]): Column = {
    val payload = columns.filterNot(systemColumns.contains).sorted
    digest(to_json(struct(payload.map(col): _*)))
  }

  /** Primary-key digest (`key_hash`, upsert/insert-only root ids). */
  def keyHash(pk: Seq[String]): Column = digest(to_json(struct(pk.sorted.map(col): _*)))

  /** Deterministic child id: digest of parent id, child table name, list
    * position (helpers.py:177-180) — stable under retries, so merge dedup
    * on nested tables stays correct.
    */
  def nestedRowId(parentId: Column, tableName: String, listIdx: Column): Column =
    digest(concat_ws("_", parentId, lit(tableName), listIdx.cast("string")))
}
