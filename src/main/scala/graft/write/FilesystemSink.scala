package graft.write

import java.nio.file.{Files, Path, Paths}
import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.format.TextStyle
import java.util.Locale

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
  * The layout grammar is the reference's full placeholder set
  * (dlt/destinations/path_utils.py:25-75): the standard params
  * (`schema_name table_name load_id file_id ext`), the current-datetime
  * family (`curr_date timestamp timestamp_ms`), the load-package
  * timestamps (`load_package_timestamp[_ms]`), the pendulum-style
  * datetime tokens (`YYYY YY Y MMMM MMM MM M DD D HH H mm m dddd ddd
  * dd d ss s SSSS SSS SS S Q`, all lowercased like the reference's
  * `format(...).lower()` at path_utils.py:125), plus caller-supplied
  * extra placeholders (static or callback, path_utils.py:158-172).
  * Date-partitioned bucket layouts (`{table_name}/{YYYY}/{MM}/{DD}/...`)
  * are the most common real filesystem-destination configuration.
  * Unknown tokens fail fast (the InvalidFilesystemLayout analog,
  * path_utils.py:176-209); a layout without `{ext}` gets it appended
  * (path_utils.py:242-245). The clock is injectable (the
  * `current_datetime` parameter, path_utils.py:219-226) so layouts are
  * testable and one load's parts never straddle a time boundary — the
  * datetime is snapshotted once per [[write]].
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
  *
  * Table scoping: listing/replace match a LAYOUT-DERIVED regex over
  * root-relative paths (each placeholder → its value class, e.g.
  * `{YYYY}` → 4 digits, `{load_id}` → a path segment), walked from the
  * deepest layout prefix that is static for the table. This scopes to
  * THIS table's files across every date partition — strictly tighter
  * than the reference's prefix-only scoping
  * (path_utils.py:249-286 get_table_prefix_layout), which cannot see
  * past the first non-prefix placeholder.
  */
final class FilesystemSink(val root: String, spark: SparkSession,
    layout: String = "{table_name}/{load_id}.{file_id}.{ext}",
    schemaName: String = "graft",
    extra: Map[String, FilesystemSink.LayoutCtx => String] = Map.empty,
    clock: () => Instant = () => Instant.now()) {

  import FilesystemSink._

  require(!schemaName.contains("/"),
    s"schemaName '$schemaName' contains '/': rendered paths would " +
      "escape the layout's listing regex")

  private def ext(format: String): String = format match {
    case "jsonl" => "jsonl"
    case "csv" => "csv"
    case "parquet" => "parquet"
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  private val Formats = Seq("jsonl", "csv", "parquet")

  /** Layout with `{ext}` appended when absent (reference appends the
    * job extension when the layout doesn't place it). */
  private val effectiveLayout: String = {
    val toks = tokensOf(layout)
    if (toks.contains("ext")) layout else layout + ".{ext}"
  }

  // fail fast on unknown placeholders — the InvalidFilesystemLayout
  // analog (reference path_utils.py:check_layout)
  {
    val known = StandardTokens ++ DatetimeTokens.keySet ++ extra.keySet
    val invalid = tokensOf(effectiveLayout).filterNot(known)
    require(invalid.isEmpty,
      s"invalid layout placeholders ${invalid.mkString("{", "}, {", "}")} " +
        s"in '$layout'; allowed: ${known.toSeq.sorted.mkString(", ")}")
    // {table_name} must be followed by a literal separator character:
    // with '{table_name}{load_id}' the listing/replace regex for table
    // 't' (quote("t") then [^/]+) also matches sibling table 't2', so
    // replace=true could delete another table's data — the reference
    // enforces the same separator (get_table_prefix_layout,
    // path_utils.py:278-286)
    // {table_name} must be bounded by literal separators on BOTH sides:
    // a placeholder right after lets table 't' match sibling 't2'
    // (quote("t") then [^/]+); a placeholder right BEFORE lets the
    // preceding value class backtrack across the boundary — with
    // '{load_id}_{table_name}', listFiles("x")'s regex [^/]+_x matches
    // table a_x's file 'l1_a_x…' ([^/]+ absorbs 'l1_a'). The reference
    // enforces the after-side (get_table_prefix_layout,
    // path_utils.py:278-286); the before-side follows from the same
    // ambiguity argument.
    var at = effectiveLayout.indexOf("{table_name}")
    while (at >= 0) {
      val after = at + "{table_name}".length
      require(after < effectiveLayout.length &&
          effectiveLayout.charAt(after) != '{',
        s"layout '$layout' must place a separator character right after " +
          "{table_name}: without one, one table's listing/replace can " +
          "match a sibling table's files")
      require(at == 0 || effectiveLayout.charAt(at - 1) != '}',
        s"layout '$layout' must place a separator character right before " +
          "{table_name}: an adjacent placeholder's value class can " +
          "backtrack across the boundary and match a sibling table's files")
      at = effectiveLayout.indexOf("{table_name}", after)
    }
  }

  /** The literal characters immediately BEFORE and AFTER each
    * `{table_name}` in the layout — the separators the listing regex
    * relies on to delimit the table name. A table NAME containing one
    * of them re-opens the ambiguity the separators close, so
    * [[requireUnambiguous]] refuses such names. */
  private val tableSeparators: Set[Char] = {
    val b = Set.newBuilder[Char]
    var at = effectiveLayout.indexOf("{table_name}")
    while (at >= 0) {
      val after = at + "{table_name}".length
      if (after < effectiveLayout.length) b += effectiveLayout.charAt(after)
      if (at > 0) b += effectiveLayout.charAt(at - 1)
      at = effectiveLayout.indexOf("{table_name}", after)
    }
    b.result()
  }

  /** A table NAME containing its own layout separator is ambiguous:
    * with layout `{table_name}_{load_id}…`, table `t`'s listing regex
    * (`t` + `_` + `[^/]+`) also matches table `t_x`'s files — so a
    * replace on `t` could DELETE `t_x`'s data and a read would silently
    * include its rows. The separator guard alone cannot close this
    * (`t_x_l1.0.jsonl` is genuinely ambiguous between (t, load x_l1)
    * and (t_x, load l1)); refusing such names makes every path
    * unambiguous. The default `/` layout never trips this — `/` cannot
    * appear in a table name. */
  private def requireUnambiguous(table: String): Unit = {
    // '/' in any rendered value writes files the layout regex (which
    // maps every placeholder to a within-segment class) can never list
    // or replace again — same rule the extras enforce at resolve time
    require(!table.contains("/"),
      s"table name '$table' contains '/': its files would escape the layout")
    val bad = tableSeparators.filter(table.contains(_))
    require(bad.isEmpty,
      s"table name '$table' contains its layout separator " +
        s"${bad.mkString("'", "', '", "'")}: names like it are ambiguous " +
        "against sibling tables under this layout (listing/replace could " +
        "match another table's files) — rename the table or change the " +
        "layout separator")
  }

  private def params(table: String, loadId: String, fileId: Int,
      format: String, now: ZonedDateTime,
      pkgTs: Option[Instant]): Map[String, String] = {
    val ctx = LayoutCtx(schemaName, table, loadId, fileId.toString, ext(format))
    val base = Map(
      "schema_name" -> schemaName,
      "table_name" -> table,
      "load_id" -> loadId,
      "file_id" -> fileId.toString,
      "ext" -> ext(format),
      "curr_date" -> f"${now.getYear}%04d-${now.getMonthValue}%02d-${now.getDayOfMonth}%02d",
      "timestamp" -> now.toEpochSecond.toString,
      "timestamp_ms" -> now.toInstant.toEpochMilli.toString)
    val pkg = pkgTs.toSeq.flatMap(t => Seq(
      "load_package_timestamp" -> t.getEpochSecond.toString,
      "load_package_timestamp_ms" -> t.toEpochMilli.toString))
    // only extras the layout actually uses are RESOLVED (an unused
    // callback that throws must not break every write — the reference
    // resolves all but only warns on unused), and a rendered value may
    // not contain '/': the listing regex matches extras as [^/]*, so a
    // slash would write files listFiles/read/replace can never see
    // again (invisible data, never cleaned on replace)
    val used = tokensOf(effectiveLayout)
    val extras = extra.collect { case (k, f) if used(k) =>
      val v = f(ctx)
      require(!v.contains("/"),
        s"extra placeholder {$k} rendered '$v' containing '/': such a " +
          "path escapes the layout and its files could never be listed " +
          "or replaced again")
      k -> v
    }
    base ++ pkg ++ datetimeParams(now) ++ extras
  }

  private def resolve(table: String, loadId: String, fileId: Int,
      format: String, now: ZonedDateTime, pkgTs: Option[Instant]): Path = {
    val p = params(table, loadId, fileId, format, now, pkgTs)
    val rendered = TokenRx.replaceAllIn(effectiveLayout, m => {
      val tok = m.group(1)
      val v = p.getOrElse(tok, throw new IllegalArgumentException(
        s"layout placeholder {$tok} has no value (pass loadPackageTs to " +
          "write() for the load_package_timestamp placeholders)"))
      java.util.regex.Matcher.quoteReplacement(v)
    })
    Paths.get(root, rendered)
  }

  /** The layout as a regex over root-relative paths for one table and
    * format: literal segments quoted, each placeholder replaced by its
    * value class (`{load_id}` → `[^/]+`, `{file_id}` → `\d+`, datetime
    * tokens → their digit/name shapes). This — not "everything in the
    * directory" — scopes listing/replace to THIS table's files across
    * every date partition, so flat or date-bucketed layouts cannot
    * read or delete a sibling table's data. `captureLoadId` makes the
    * `{load_id}` class the sole capturing group (the provenance parse
    * in [[read]]). */
  private def layoutRegex(table: String, format: String,
      captureLoadId: Boolean = false): String = {
    val sb = new StringBuilder
    var last = 0
    for (m <- TokenRx.findAllMatchIn(effectiveLayout)) {
      sb ++= java.util.regex.Pattern.quote(
        effectiveLayout.substring(last, m.start))
      val tok = m.group(1)
      sb ++= (tok match {
        case "table_name" => java.util.regex.Pattern.quote(table)
        case "schema_name" => java.util.regex.Pattern.quote(schemaName)
        case "ext" => java.util.regex.Pattern.quote(ext(format))
        case "load_id" => if (captureLoadId) "([^/]+)" else "[^/]+"
        case "file_id" => "\\d+"
        case other => DatetimeTokenRegex.getOrElse(other,
          if (DatetimeTokens.contains(other) ||
            StandardTokens(other)) "\\d+" else "[^/]*") // extras
      })
      last = m.end
    }
    sb ++= java.util.regex.Pattern.quote(effectiveLayout.substring(last))
    sb.toString
  }

  private def layoutPattern(table: String, format: String): java.util.regex.Pattern =
    java.util.regex.Pattern.compile(layoutRegex(table, format))

  /** Deepest layout directory prefix that is static for `table` — the
    * walk root for listing (everything below a date/load placeholder
    * varies per load). */
  private def staticPrefix(table: String): Path = {
    val segs = effectiveLayout.split("/").toSeq.dropRight(1)
      .map(_.replace("{table_name}", table)
        .replace("{schema_name}", schemaName))
      .takeWhile(!_.contains("{"))
    segs.foldLeft(Paths.get(root))(_.resolve(_))
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
    * stale divergent copy behind). `loadPackageTs` binds the
    * `{load_package_timestamp[_ms]}` placeholders (the reference's
    * load-package creation time). The datetime placeholders resolve
    * from ONE clock snapshot for the whole load. */
  def write(table: String, df: DataFrame, loadId: String,
      format: String = "jsonl", replace: Boolean = false,
      loadPackageTs: Option[Instant] = None): Seq[Path] = {
    requireUnambiguous(table)
    // {load_id} renders into the same [^/]+ listing class the extras
    // guard protects: a loadId containing '/' would write files that
    // listFiles/read/replace can never see again (invisible rows,
    // stale data never cleaned, provenance parse broken)
    require(!loadId.contains("/"),
      s"loadId '$loadId' contains '/': its files would escape the layout")
    val scratch = Files.createTempDirectory(s"graft-fs-$table")
    val now = clock().atZone(ZoneOffset.UTC)
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
        if (replace) walkMatching(table, Formats.map(layoutPattern(table, _)))
        else Nil
      val placed = sorted.sortBy(_.getFileName.toString).zipWithIndex.map {
        case (part, i) =>
          val target = resolve(table, loadId, i, format, now, loadPackageTs)
          Files.createDirectories(target.getParent)
          Files.move(part, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          target
      }.toSeq
      previous.filterNot(placed.contains).foreach(Files.deleteIfExists(_))
      placed
    } finally deleteRecursively(scratch)
  }

  /** ONE directory walk matching any of `patterns` — the shared
    * listing core, so a replace (which clears every format) pays one
    * traversal, not one per format. */
  private def walkMatching(table: String,
      patterns: Seq[java.util.regex.Pattern]): Seq[Path] = {
    requireUnambiguous(table)
    val start = staticPrefix(table)
    if (!Files.isDirectory(start)) Nil
    else {
      val rootPath = Paths.get(root)
      val s = Files.walk(start)
      try {
        val it = s.iterator()
        val out = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) {
          val p = it.next()
          if (Files.isRegularFile(p)) {
            val rel = rootPath.relativize(p).toString.replace('\\', '/')
            if (patterns.exists(_.matcher(rel).matches())) out += p
          }
        }
        out.sortBy(_.toString).toSeq
      } finally s.close()
    }
  }

  /** The table's current data files for `format` under the layout,
    * across all date partitions. */
  def listFiles(table: String, format: String): Seq[Path] =
    walkMatching(table, Seq(layoutPattern(table, format)))

  /** Read a table back (all loads), with the load id parsed from the
    * layout as provenance — the reader side of the layout contract
    * (works for any layout that places `{load_id}`; layouts without it
    * read back with an empty `_dlt_load_id`). `schema` pins types for
    * the text formats (jsonl/csv infer loosely; the caller knows the
    * written schema). */
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
    // the layout-derived regex (sole capture = {load_id}) anchored at
    // the path tail: provenance parses under ANY layout, date
    // partitions included, not just name-trailing load ids
    val rx = "(?:^|/)" + layoutRegex(table, format, captureLoadId = true) + "$"
    val loadIdCol =
      if (tokensOf(effectiveLayout).contains("load_id"))
        regexp_extract(input_file_name(), rx, 1)
      else lit("")
    df.withColumn("_dlt_load_id", loadIdCol)
  }
}

object FilesystemSink {

  /** Context handed to extra-placeholder callbacks — the reference
    * passes (schema_name, table_name, load_id, file_id, ext)
    * positionally (path_utils.py:160-168). */
  final case class LayoutCtx(schemaName: String, table: String,
      loadId: String, fileId: String, ext: String)

  private val TokenRx = "\\{(.*?)\\}".r

  private def tokensOf(layout: String): Set[String] =
    TokenRx.findAllMatchIn(layout).map(_.group(1)).toSet

  private val StandardTokens: Set[String] = Set(
    "schema_name", "table_name", "load_id", "file_id", "ext",
    "curr_date", "timestamp", "timestamp_ms",
    "load_package_timestamp", "load_package_timestamp_ms")

  /** The pendulum-style datetime tokens the reference supports
    * (path_utils.py:25-57), each resolved from one UTC snapshot and
    * lowercased (reference lowercases every datetime param). */
  private val DatetimeTokens: Map[String, ZonedDateTime => String] = {
    def two(i: Int) = f"$i%02d"
    def monthName(z: ZonedDateTime, st: TextStyle) =
      z.getMonth.getDisplayName(st, Locale.ENGLISH).toLowerCase(Locale.ENGLISH)
    def dayName(z: ZonedDateTime, st: TextStyle) =
      z.getDayOfWeek.getDisplayName(st, Locale.ENGLISH).toLowerCase(Locale.ENGLISH)
    Map(
      "YYYY" -> (z => f"${z.getYear}%04d"),
      "YY" -> (z => two(z.getYear % 100)),
      "Y" -> (z => z.getYear.toString),
      "MMMM" -> (z => monthName(z, TextStyle.FULL)),
      "MMM" -> (z => monthName(z, TextStyle.SHORT)),
      "MM" -> (z => two(z.getMonthValue)),
      "M" -> (z => z.getMonthValue.toString),
      "DD" -> (z => two(z.getDayOfMonth)),
      "D" -> (z => z.getDayOfMonth.toString),
      "HH" -> (z => two(z.getHour)),
      "H" -> (z => z.getHour.toString),
      "mm" -> (z => two(z.getMinute)),
      "m" -> (z => z.getMinute.toString),
      "dddd" -> (z => dayName(z, TextStyle.FULL)),
      "ddd" -> (z => dayName(z, TextStyle.SHORT)),
      // moment/pendulum "dd" = two-letter day (Mo Tu We), lowercased
      "dd" -> (z => dayName(z, TextStyle.SHORT).take(2)),
      // moment/pendulum "d" = day of week 0-6, Sunday = 0
      "d" -> (z => (z.getDayOfWeek.getValue % 7).toString),
      "ss" -> (z => two(z.getSecond)),
      "s" -> (z => z.getSecond.toString),
      "SSSS" -> (z => f"${z.getNano / 100000}%04d"),
      "SSS" -> (z => f"${z.getNano / 1000000}%03d"),
      "SS" -> (z => f"${z.getNano / 10000000}%02d"),
      "S" -> (z => (z.getNano / 100000000).toString),
      "Q" -> (z => ((z.getMonthValue - 1) / 3 + 1).toString))
  }

  private def datetimeParams(now: ZonedDateTime): Map[String, String] =
    DatetimeTokens.view.mapValues(_(now)).toMap

  /** Value-class regex per datetime token — what a resolved token can
    * look like in a path, for table-scoped listing across partitions. */
  private val DatetimeTokenRegex: Map[String, String] = Map(
    "YYYY" -> "\\d{4}", "YY" -> "\\d{2}", "Y" -> "\\d{1,}",
    "MMMM" -> "[a-z]+", "MMM" -> "[a-z]{3}",
    "MM" -> "\\d{2}", "M" -> "\\d{1,2}",
    "DD" -> "\\d{2}", "D" -> "\\d{1,2}",
    "HH" -> "\\d{2}", "H" -> "\\d{1,2}",
    "mm" -> "\\d{2}", "m" -> "\\d{1,2}",
    "dddd" -> "[a-z]+", "ddd" -> "[a-z]{3}", "dd" -> "[a-z]{2}",
    "d" -> "\\d",
    "ss" -> "\\d{2}", "s" -> "\\d{1,2}",
    "SSSS" -> "\\d{4}", "SSS" -> "\\d{3}", "SS" -> "\\d{2}", "S" -> "\\d",
    "Q" -> "[1-4]",
    "curr_date" -> "\\d{4}-\\d{2}-\\d{2}",
    "timestamp" -> "\\d+", "timestamp_ms" -> "\\d+",
    "load_package_timestamp" -> "\\d+", "load_package_timestamp_ms" -> "\\d+")
}
