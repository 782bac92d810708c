package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.{NamingConvention, NamingConventions}

/** Nested-struct flattening (reference `_flatten`,
  * dlt/common/normalizers/json/relational.py:153-185).
  *
  * Structs are recursively expanded into `parent__child` top-level columns;
  * arrays are left in place for [[Normalizer]] to explode into child tables;
  * nesting deeper than `maxNesting` is retained as a serialized JSON column
  * (the reference's `json`-typed stop, normalizers/json/helpers.py:49-60).
  * Identifiers go through the schema's naming convention — snake_case by
  * default, any [[graft.schema.NamingConventions]] member on request (the
  * reference selects the convention per schema, naming/naming.py) — and
  * path fragments join on the CONVENTION's separator (`__` everywhere but
  * `direct`'s `▶`). Empty keys become `_empty`.
  *
  * This is a pure `select` — one narrow projection, fully codegen'd, no
  * shuffle; column pruning still reaches the parquet scan underneath.
  */
object Flatten {

  /** One flattened output column: normalized path + the expression. */
  final case class Flat(name: String, column: Column, isArray: Boolean, elementType: DataType)

  /** Flatten plan for a top-level DataFrame schema. */
  def columns(schema: StructType, maxNesting: Int = 1000,
      naming: NamingConvention = NamingConventions.SnakeCase): Seq[Flat] =
    schema.fields.toSeq.flatMap { f =>
      walk(Seq(naming.normalizeIdentifier(f.name)), col(quote(f.name)),
        f.dataType, maxNesting, 1, naming)
    }

  /** Flatten plan for a struct reachable from `base` (exploded elements). */
  def forStruct(base: Column, s: StructType, maxNesting: Int = 1000,
      naming: NamingConvention = NamingConventions.SnakeCase): Seq[Flat] =
    s.fields.toSeq.flatMap { f =>
      walk(Seq(naming.normalizeIdentifier(f.name)), base.getField(f.name),
        f.dataType, maxNesting, 1, naming)
    }

  private def walk(path: Seq[String], c: Column, dt: DataType,
                   maxNesting: Int, depth: Int,
                   naming: NamingConvention): Seq[Flat] = {
    // fragments are already normalized: join on the convention's
    // separator + shorten the whole path (≡ Naming.shortenFragments
    // for the snake_case default)
    def joined = naming.joinPath(path)
    dt match {
      case s: StructType if depth < maxNesting =>
        s.fields.toSeq.flatMap { f =>
          walk(path :+ naming.normalizeIdentifier(f.name), c.getField(f.name),
            f.dataType, maxNesting, depth + 1, naming)
        }
      case s: StructType =>
        Seq(Flat(joined, to_json(c), isArray = false, s))
      case a: ArrayType if depth < maxNesting =>
        Seq(Flat(joined, c, isArray = true, a.elementType))
      case a: ArrayType =>
        Seq(Flat(joined, to_json(c), isArray = false, a))
      case other =>
        Seq(Flat(joined, c, isArray = false, other))
    }
  }

  /** Flatten all structs; arrays stay as array columns (normalized names). */
  def apply(df: DataFrame, maxNesting: Int = 1000,
      naming: NamingConvention = NamingConventions.SnakeCase): DataFrame = {
    val cols = columns(df.schema, maxNesting, naming)
    df.select(cols.map(f => f.column.as(f.name)): _*)
  }

  private def quote(name: String): String = s"`${name.replace("`", "``")}`"
}
