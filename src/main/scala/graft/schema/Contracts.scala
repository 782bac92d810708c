package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-contract enforcement (reference Schema.apply_schema_contract,
  * dlt/common/schema/schema.py:177-321; modes TSchemaContractDict,
  * dlt/common/schema/typing.py:214-226).
  *
  * Modes per entity (`tables`, `columns`, `data_type`):
  *  - evolve: accept the change
  *  - freeze: raise
  *  - discard_value: drop the offending column / cast-failures to null
  *  - discard_row: drop rows that carry the offending value
  *
  * On a columnar engine, enforcement is a vectorized pre-write pass: column
  * masks and row filters instead of per-row checks (SURVEY §1.3).
  */
object Contracts {

  sealed trait Mode
  case object Evolve extends Mode
  case object Freeze extends Mode
  case object DiscardValue extends Mode
  case object DiscardRow extends Mode

  final case class Contract(tables: Mode = Evolve, columns: Mode = Evolve,
                            dataType: Mode = Evolve)

  final class ContractViolation(msg: String) extends RuntimeException(msg)

  /** Gate creation of a table that does not exist yet. Returns true when
    * the write may proceed. */
  def allowNewTable(table: String, exists: Boolean, c: Contract): Boolean =
    if (exists) true
    else c.tables match {
      case Evolve => true
      case Freeze => throw new ContractViolation(s"table $table is new but tables=freeze")
      case DiscardValue | DiscardRow => false
    }

  /** Enforce column + data_type contracts of `incoming` against the
    * existing table schema. Returns the adjusted frame. */
  def enforce(incoming: DataFrame, existing: StructType, c: Contract): DataFrame = {
    val existingByName = existing.fields.map(f => f.name -> f.dataType).toMap
    val newCols = incoming.schema.fields.filterNot(f => existingByName.contains(f.name))
    val changed = incoming.schema.fields.filter(f =>
      existingByName.get(f.name).exists(t => t != f.dataType))

    var df = incoming
    if (newCols.nonEmpty) c.columns match {
      case Evolve => ()
      case Freeze =>
        throw new ContractViolation(
          s"new columns ${newCols.map(_.name).mkString(", ")} but columns=freeze")
      case DiscardValue =>
        df = df.drop(newCols.map(_.name).toIndexedSeq: _*)
      case DiscardRow =>
        val anyNewNonNull = newCols.map(f => col(f.name).isNotNull)
          .reduce(_ || _)
        df = df.filter(!anyNewNonNull).drop(newCols.map(_.name).toIndexedSeq: _*)
    }

    if (changed.nonEmpty) c.dataType match {
      case Evolve => () // schema evolution / variant columns handle it downstream
      case Freeze =>
        throw new ContractViolation(
          s"columns ${changed.map(_.name).mkString(", ")} changed type but data_type=freeze")
      case DiscardValue =>
        df = changed.foldLeft(df)((d, f) =>
          d.withColumn(f.name, d(f.name).try_cast(existingByName(f.name))))
      case DiscardRow =>
        val failed = changed.map { f =>
          col(f.name).isNotNull && col(f.name).try_cast(existingByName(f.name)).isNull
        }.reduce(_ || _)
        df = df.filter(!failed)
        df = changed.foldLeft(df)((d, f) =>
          d.withColumn(f.name, d(f.name).try_cast(existingByName(f.name))))
    }
    df
  }
}
