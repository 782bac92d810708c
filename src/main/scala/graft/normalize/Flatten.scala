package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.Naming

/** Nested-struct flattening (reference `_flatten`,
  * dlt/common/normalizers/json/relational.py:153-185).
  *
  * Structs are recursively expanded into `parent__child` top-level columns;
  * arrays are left in place for [[Normalizer]] to explode into child tables;
  * nesting deeper than `maxNesting` is retained as a serialized JSON column
  * (the reference's `json`-typed stop, normalizers/json/helpers.py:49-60).
  * All identifiers go through the snake_case convention; empty keys become
  * `_empty`.
  *
  * This is a pure `select` — one narrow projection, fully codegen'd, no
  * shuffle; column pruning still reaches the parquet scan underneath.
  */
object Flatten {

  /** One flattened output column: normalized path + the expression. */
  final case class Flat(name: String, column: Column, isArray: Boolean, elementType: DataType)

  /** Flatten plan for a top-level DataFrame schema. */
  def columns(schema: StructType, maxNesting: Int = 1000): Seq[Flat] =
    schema.fields.toSeq.flatMap { f =>
      walk(Seq(Naming.normalizeIdentifier(f.name)), col(quote(f.name)), f.dataType, maxNesting, 1)
    }

  /** Flatten plan for a struct reachable from `base` (exploded elements). */
  def forStruct(base: Column, s: StructType, maxNesting: Int = 1000): Seq[Flat] =
    s.fields.toSeq.flatMap { f =>
      walk(Seq(Naming.normalizeIdentifier(f.name)), base.getField(f.name), f.dataType, maxNesting, 1)
    }

  private def walk(path: Seq[String], c: Column, dt: DataType,
                   maxNesting: Int, depth: Int): Seq[Flat] = dt match {
    case s: StructType if depth < maxNesting =>
      s.fields.toSeq.flatMap { f =>
        walk(path :+ Naming.normalizeIdentifier(f.name), c.getField(f.name), f.dataType,
          maxNesting, depth + 1)
      }
    case s: StructType =>
      Seq(Flat(Naming.shortenFragments(path), to_json(c), isArray = false, s))
    case a: ArrayType if depth < maxNesting =>
      Seq(Flat(Naming.shortenFragments(path), c, isArray = true, a.elementType))
    case a: ArrayType =>
      Seq(Flat(Naming.shortenFragments(path), to_json(c), isArray = false, a))
    case other =>
      Seq(Flat(Naming.shortenFragments(path), c, isArray = false, other))
  }

  /** Flatten all structs; arrays stay as array columns (normalized names). */
  def apply(df: DataFrame, maxNesting: Int = 1000): DataFrame = {
    val cols = columns(df.schema, maxNesting)
    df.select(cols.map(f => f.column.as(f.name)): _*)
  }

  private def quote(name: String): String = s"`${name.replace("`", "``")}`"
}
