package graft.schema

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.security.MessageDigest
import java.util.Base64

import scala.collection.immutable.ListMap

import org.apache.spark.sql.types.{DataType, StructType}

/** Table hints carried next to the Spark schema (reference TTableSchema,
  * dlt/common/schema/typing.py:372-377). */
final case class TableHints(
    parent: Option[String] = None,
    writeDisposition: String = "append",
    primaryKey: Seq[String] = Nil,
    mergeKey: Seq[String] = Nil,
    /** typed references powering reference-driven joins (typing.py:291-356) */
    references: Seq[TableReference] = Nil)

/** A foreign-key-ish reference: this table's `columns` point at
  * `referencedTable.referencedColumns`. */
final case class TableReference(
    columns: Seq[String],
    referencedTable: String,
    referencedColumns: Seq[String])

/** Versioned, content-hashed schema collection (reference Schema class,
  * dlt/common/schema/schema.py:78; version hash dlt/common/schema/
  * utils.py:227-249 with `previous_hashes` lineage).
  *
  * Spark owns physical schemas; this registry adds what Spark doesn't
  * track: hints, references, naming lineage, and a deterministic content
  * hash for change detection. Persisted as one JSON file per schema.
  */
final class SchemaRegistry(val name: String) {
  private var tables: ListMap[String, (StructType, TableHints)] = ListMap.empty
  private var previousHashes: List[String] = Nil

  def register(table: String, schema: StructType,
               hints: TableHints = TableHints()): Unit = synchronized {
    val norm = Naming.normalizeTableName(table)
    val old = versionHash
    tables = tables.updated(norm, (schema, hints))
    if (!previousHashes.headOption.contains(old)) previousHashes = old :: previousHashes
  }

  def get(table: String): Option[(StructType, TableHints)] =
    tables.get(Naming.normalizeTableName(table))
  def tableNames: Seq[String] = tables.keys.toSeq
  def hints(table: String): TableHints =
    get(table).map(_._2).getOrElse(TableHints())
  def lineage: List[String] = previousHashes

  /** Content hash over sorted table schemas — stable across registration
    * order, sensitive to any column/hint change. */
  def versionHash: String = {
    val canonical = tables.toSeq.sortBy(_._1).map { case (t, (s, h)) =>
      s"$t|${s.json}|${h.toString}"
    }.mkString("\n")
    val d = MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes(StandardCharsets.UTF_8))
    Base64.getEncoder.encodeToString(d).take(27)
  }

  /** Merge an incoming table schema (evolution): union of columns, existing
    * types win (variant/coercion happens upstream). Returns merged schema. */
  def evolve(table: String, incoming: StructType): StructType = synchronized {
    val norm = Naming.normalizeTableName(table)
    val merged = tables.get(norm) match {
      case None => incoming
      case Some((existing, _)) =>
        val have = existing.fieldNames.toSet
        StructType(existing.fields ++ incoming.fields.filterNot(f => have(f.name)))
    }
    register(norm, merged, tables.get(norm).map(_._2).getOrElse(TableHints()))
    merged
  }

  /** Mermaid `erDiagram` export (reference dlt/helpers/mermaid.py,
    * schema/schema.py:807-931 export family). Relationships come from
    * declared references and parent links. */
  def toMermaid: String = {
    val entities = tables.map { case (t, (s, _)) =>
      val cols = s.fields.map(f => s"    ${f.dataType.simpleString} ${f.name}").mkString("\n")
      s"  $t {\n$cols\n  }"
    }.mkString("\n")
    val rels = tables.flatMap { case (t, (_, h)) =>
      h.references.map(r => s"  $t }o--|| ${r.referencedTable} : ${r.columns.mkString("+")}") ++
        h.parent.map(p => s"  $t }o--|| $p : _dlt_parent_id")
    }.mkString("\n")
    s"erDiagram\n$entities\n$rels"
  }

  /** DBML export (reference dlt/helpers/dbml.py). */
  def toDbml: String = {
    val tbls = tables.map { case (t, (s, h)) =>
      val cols = s.fields.map { f =>
        val pk = if (h.primaryKey.contains(f.name)) " [pk]" else ""
        s"  ${f.name} ${f.dataType.simpleString}$pk"
      }.mkString("\n")
      s"Table $t {\n$cols\n}"
    }.mkString("\n\n")
    val refs = tables.flatMap { case (t, (_, h)) =>
      h.references.map(r =>
        s"Ref: $t.${r.columns.mkString("")} > ${r.referencedTable}.${r.referencedColumns.mkString("")}")
    }.mkString("\n")
    if (refs.isEmpty) tbls else s"$tbls\n\n$refs"
  }

  /** Stored-schema JSON (the reference's stored schema form,
    * schema/typing.py:396-408). */
  def toJson: String = {
    val obj = tables.map { case (t, (s, h)) =>
      t -> Map(
        "schema" -> s.json,
        "write_disposition" -> h.writeDisposition,
        "parent" -> h.parent.getOrElse(""),
        "primary_key" -> h.primaryKey.mkString(","),
        "merge_key" -> h.mergeKey.mkString(","),
        "references" -> h.references.map(r =>
          s"${r.columns.mkString("+")}->${r.referencedTable}.${r.referencedColumns.mkString("+")}")
          .mkString(";"))
    }
    upickleFree(obj, versionHash, previousHashes)
  }

  def save(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, s"$name.schema.json"),
      toJson.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  // minimal hand-rolled JSON (no extra deps allowed)
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def upickleFree(obj: Map[String, Map[String, String]],
                          hash: String, prev: List[String]): String = {
    val tablesJson = obj.map { case (t, fields) =>
      jstr(t) + ":{" + fields.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString(",") + "}"
    }.mkString(",")
    s"""{"name":${jstr(name)},"version_hash":${jstr(hash)},""" +
      s""""previous_hashes":[${prev.map(jstr).mkString(",")}],"tables":{$tablesJson}}"""
  }
}
