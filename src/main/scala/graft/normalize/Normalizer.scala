package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.{NamingConvention, NamingConventions}

/** Root-row id strategy (reference get_root_row_id_type,
  * dlt/common/normalizers/json/helpers.py:107-120). */
sealed trait RootIdType
object RootIdType {
  /** Random id — plain append tables. */
  case object Random extends RootIdType
  /** Content digest of the full row — SCD2 (`row_hash`). */
  case object RowHash extends RootIdType
  /** Digest of the primary key — upsert / insert-only (`key_hash`). */
  final case class KeyHash(pk: Seq[String]) extends RootIdType
}

final case class NormalizeConfig(
    loadId: String,
    maxNesting: Int = 1000,
    rootIdType: RootIdType = RootIdType.Random,
    /** root column → name under which it is propagated to ALL descendants;
      * e.g. Map("_dlt_id" -> "_dlt_root_id") when a merge needs root keys
      * (reference relational.py:218-231, 326-391). */
    propagate: Map[String, String] = Map.empty,
    /** The SCHEMA-WIDE identifier convention (the reference selects it
      * per schema, naming/naming.py): every table/column identifier and
      * child-table path follows it — snake_case by default, any
      * [[graft.schema.NamingConventions]] member on request. System
      * columns (`_dlt_*`) are convention-invariant by construction. */
    naming: NamingConvention = NamingConventions.SnakeCase)

/** The relational JSON normalizer as declarative DataFrame transforms
  * (reference dlt/common/normalizers/json/relational.py:233-391).
  *
  * One nested input frame becomes a map of output tables:
  *  - structs flatten into `parent__child` columns ([[Flatten]]);
  *  - each array becomes a child table `parent__field` with
  *    `_dlt_parent_id` + `_dlt_list_idx` + deterministic `_dlt_id`;
  *  - primitive array elements are wrapped as a `value` column;
  *  - arrays-of-arrays get an intermediary `list` wrapping (so the inner
  *    list becomes a grandchild table `parent__field__list`,
  *    relational.py:256-266);
  *  - the root table gets `_dlt_load_id` (relational.py:293-295) and its
  *    configured id type.
  *
  * Everything is `select` + `posexplode` — narrow, codegen'd, no shuffle.
  * Each output table's plan re-derives from the input plan; when a document
  * fans out into many tables at scale, persist the input before calling.
  */
object Normalizer {
  private val Elem = "__elem"

  def normalize(df: DataFrame, rootTable: String, cfg: NormalizeConfig): Map[String, DataFrame] = {
    val naming = cfg.naming
    val rootName = naming.normalizeTableIdentifier(rootTable)
    val flat = Flatten(df, cfg.maxNesting, naming)
    val scalarDataCols = flat.schema.fields.toSeq
      .filterNot(f => Ids.systemColumns.contains(f.name))
      .filterNot(_.dataType.isInstanceOf[ArrayType])
      .map(_.name)

    val rootId: Column = cfg.rootIdType match {
      case RootIdType.Random => Ids.randomId()
      case RootIdType.RowHash => Ids.rowHash(scalarDataCols)
      case RootIdType.KeyHash(pk) =>
        Ids.keyHash(pk.map(naming.normalizeIdentifier(_)))
    }
    // keep a pre-existing _dlt_id if the extractor already assigned one
    val withId =
      if (flat.schema.fieldNames.contains(Ids.DltId)) flat
      else flat.withColumn(Ids.DltId, rootId)
    val root = withId.withColumn(Ids.DltLoadId, lit(cfg.loadId))

    val extend: Seq[(String, Column)] =
      cfg.propagate.toSeq.map { case (from, as) =>
        naming.normalizeIdentifier(as) -> root(naming.normalizeIdentifier(from))
      }

    collectTables(root, rootName, extend, naming)
  }

  /** Emit `table` (minus its array columns) and recurse into each array.
    * `extend` columns ride along into every descendant (root-key
    * propagation); the emitting table itself does not gain them.
    */
  private def collectTables(table: DataFrame, tableName: String,
                            extend: Seq[(String, Column)],
                            naming: NamingConvention): Map[String, DataFrame] = {
    val arrayCols = table.schema.fields.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name).toSeq
    val scalarCols = table.schema.fieldNames.filterNot(arrayCols.contains).toSeq

    val children = arrayCols.flatMap { arr =>
      val childName = naming.joinPath(Seq(tableName, arr))
      val elemType = table.schema(arr).dataType.asInstanceOf[ArrayType].elementType
      val carried = extend.filterNot { case (as, _) => as == Ids.DltParentId }
      val exploded = table.select(
        carried.map { case (as, c) => c.as(as) } ++ Seq(
          col(Ids.DltId).as(Ids.DltParentId),
          posexplode(col(arr)).as(Seq(Ids.DltListIdx, Elem))): _*)
      val child = buildChild(exploded, childName, elemType, naming)
      val childExtend = carried.map { case (as, _) => as -> col(as) }
      collectTables(child, childName, childExtend, naming)
    }

    Map(tableName -> table.select(scalarCols.map(col): _*)) ++ children
  }

  /** Shape one exploded element into a child row with system columns. */
  private def buildChild(exploded: DataFrame, childName: String,
                         elemType: DataType, naming: NamingConvention): DataFrame = {
    val sysCols = exploded.columns.filterNot(_ == Elem).toSeq.map(col)
    val shaped = elemType match {
      case s: StructType =>
        val flats = Flatten.forStruct(col(Elem), s, naming = naming)
        exploded.select(sysCols ++ flats.map(f => f.column.as(f.name)): _*)
      case _: ArrayType =>
        // list-of-lists: intermediary `list` wrapping (relational.py:256-266)
        exploded.select(sysCols :+ col(Elem).as("list"): _*)
      case _ =>
        // primitive elements wrapped as {value: v} (relational.py:267-273)
        exploded.select(sysCols :+ col(Elem).as("value"): _*)
    }
    shaped.withColumn(Ids.DltId,
      Ids.nestedRowId(col(Ids.DltParentId), childName, col(Ids.DltListIdx)))
  }
}
