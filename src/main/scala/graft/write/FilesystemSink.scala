package graft.write

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Filesystem DESTINATION — the dlt filesystem-destination analog
  * (reference: dlt/destinations/impl/filesystem/filesystem.py, layout
  * resolution dlt/destinations/path_utils.py): loads land as
  * layout-patterned data files (`{table_name}/{load_id}.{file_id}.{ext}`
  * by default) in jsonl / csv / parquet — the "export the corpus as
  * training shards" sink, and the staging shape warehouse destinations
  * load from.
  *
  * Spark writes a DIRECTORY of part files per job; dlt's contract is
  * individually named files. The bridge: write to a scratch dir with
  * full cluster parallelism, then RENAME each part into its layout name
  * (a driver-side metadata operation, O(files) and data-free — the same
  * trick TableStore's importFiles uses in reverse). Parallelism,
  * partitioning and column pruning stay Spark-native; only the naming
  * is driver work.
  *
  * Dispositions: `append` adds a load's files next to earlier loads;
  * `replace` removes the table's earlier files in the same driver step
  * after the new load is fully materialized (crash between = both
  * loads present, re-runnable — mirroring dlt's followup-job model
  * rather than TableStore's manifest atomicity; the lakehouse sink is
  * the atomic path).
  */
final class FilesystemSink(val root: String, spark: SparkSession,
    layout: String = "{table_name}/{load_id}.{file_id}.{ext}") {

  private def ext(format: String): String = format match {
    case "jsonl" => "jsonl"
    case "csv" => "csv"
    case "parquet" => "parquet"
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  private val Formats = Seq("jsonl", "csv", "parquet")

  private def resolve(table: String, loadId: String, fileId: Int,
      format: String): Path =
    Paths.get(root, layout
      .replace("{table_name}", table)
      .replace("{load_id}", loadId)
      .replace("{file_id}", fileId.toString)
      .replace("{ext}", ext(format)))

  /** The layout as a regex over root-relative paths for one table and
    * format: literal segments quoted, `{load_id}` → `[^/]+`,
    * `{file_id}` → `\d+`. This — not "everything in the directory" —
    * scopes listing/replace to THIS table's files, so flat layouts
    * (no `{table_name}/` prefix) cannot read or delete a sibling
    * table's data. */
  private def layoutPattern(table: String, format: String): java.util.regex.Pattern = {
    val lit = layout.replace("{table_name}", table).replace("{ext}", ext(format))
    val rx = lit.split("\\{load_id\\}", -1).map(
        _.split("\\{file_id\\}", -1)
          .map(s => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
          .mkString("\\d+"))
      .mkString("[^/]+")
    java.util.regex.Pattern.compile(rx)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }

  /** Write one load package for `table`. Returns the laid-out files.
    * `replace` clears the table's earlier files in EVERY format after
    * the new load is fully placed (a format switch must not leave a
    * stale divergent copy behind). */
  def write(table: String, df: DataFrame, loadId: String,
      format: String = "jsonl", replace: Boolean = false): Seq[Path] = {
    val scratch = Files.createTempDirectory(s"graft-fs-$table")
    try {
      val out = scratch.resolve("out").toString
      format match {
        case "jsonl" => df.write.json(out)
        case "csv" => df.write.option("header", "true").csv(out)
        case "parquet" => df.write.parquet(out)
        case other => throw new IllegalArgumentException(s"unsupported format: $other")
      }
      val suffix = if (format == "jsonl") ".json" else s".$format"
      val sorted = scala.collection.mutable.ArrayBuffer.empty[Path]
      val parts = Files.list(Paths.get(out))
      try {
        val it = parts.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(suffix)) sorted += p
        }
      } finally parts.close()
      val previous =
        if (replace) Formats.flatMap(f => listFiles(table, f)) else Nil
      val placed = sorted.sortBy(_.getFileName.toString).zipWithIndex.map {
        case (part, i) =>
          val target = resolve(table, loadId, i, format)
          Files.createDirectories(target.getParent)
          Files.move(part, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          target
      }.toSeq
      previous.filterNot(placed.contains).foreach(Files.deleteIfExists(_))
      placed
    } finally deleteRecursively(scratch)
  }

  /** The table's current data files for `format` under the layout. */
  def listFiles(table: String, format: String): Seq[Path] = {
    val dir = resolve(table, "x", 0, format).getParent
    if (!Files.isDirectory(dir)) Nil
    else {
      val rootPath = Paths.get(root)
      val pattern = layoutPattern(table, format)
      val s = Files.list(dir)
      try {
        val it = s.iterator()
        val out = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) {
          val p = it.next()
          val rel = rootPath.relativize(p).toString
          if (pattern.matcher(rel).matches()) out += p
        }
        out.sortBy(_.toString).toSeq
      } finally s.close()
    }
  }

  /** Read a table back (all loads), with the load id parsed from the
    * file name as provenance — the reader side of the layout contract.
    * `schema` pins types for the text formats (jsonl/csv infer loosely;
    * the caller knows the written schema). */
  def read(table: String, format: String,
      schema: Option[StructType] = None): DataFrame = {
    val files = listFiles(table, format).map(_.toString)
    require(files.nonEmpty, s"no $format files for table $table")
    val r = spark.read
    val withSchema = schema.fold(r.option("inferSchema", "true"))(r.schema)
    val df = format match {
      case "jsonl" => withSchema.json(files: _*)
      case "csv" => withSchema.option("header", "true").csv(files: _*)
      // parquet self-describes, but a caller-passed schema still pins
      // types (e.g. widening int32 segments to long) — honor it like
      // the text formats instead of silently dropping it
      case _ => schema.fold(spark.read)(spark.read.schema).parquet(files: _*)
    }
    // greedy [^/]+ backtracks just enough for the trailing
    // .{file_id}.{ext}, so DOTTED load ids (dlt's epoch.counter form)
    // survive the parse intact
    df.withColumn("_dlt_load_id",
      regexp_extract(input_file_name(), "/([^/]+)\\.\\d+\\.[a-z]+$", 1))
  }
}
