package graft.write

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A minimal lakehouse: one directory per dataset, one manifest-committed
  * parquet table per subdirectory.
  *
  * Layout:
  * {{{
  *   <root>/<table>/data/<uuid>/part-*.parquet   immutable data segments
  *   <root>/<table>/manifest-<n>.json            list of live segments
  *   <root>/<table>/_CURRENT                     name of current manifest
  * }}}
  *
  * Commits are atomic: segments are written first, then the new manifest,
  * then `_CURRENT` is swapped via atomic rename — readers always resolve a
  * complete snapshot. This mirrors the reference's atomic load packages
  * (dlt/common/storages/load_package.py) and, at cluster scale, is the
  * same snapshot-manifest pattern Delta/Iceberg use; the disposition
  * operators in this package bind 1:1 onto Delta `MERGE`/`CLONE` when such
  * a runtime is present.
  *
  * Append never rewrites existing segments (O(new data)); replace and the
  * merge family commit a new segment list.
  */
final class TableStore(val root: String, spark: SparkSession) {

  private def tableDir(table: String): Path = Paths.get(root, table)

  def exists(table: String): Boolean =
    Files.exists(tableDir(table).resolve("_CURRENT"))

  def tables: Seq[String] =
    if (!Files.exists(Paths.get(root))) Nil
    else Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.exists(p.resolve("_CURRENT")))
      .map(_.getFileName.toString).toSeq.sorted

  /** Current snapshot as a DataFrame. */
  def read(table: String): DataFrame = {
    val segs = currentSegments(table)
    require(segs.nonEmpty, s"table $table does not exist in $root")
    spark.read.option("mergeSchema", "true").parquet(segs.map(_.toString): _*)
  }

  def readOption(table: String): Option[DataFrame] =
    if (exists(table) && currentSegmentNames(table).nonEmpty) Some(read(table)) else None

  /** Append: write a new segment, commit old segments + new one. */
  def append(table: String, df: DataFrame): Unit = synchronized {
    val seg = writeSegment(table, df)
    commit(table, currentSegmentNames(table) :+ seg)
  }

  /** Replace the table content atomically with `df`. */
  def overwrite(table: String, df: DataFrame): Unit = synchronized {
    val seg = writeSegment(table, df)
    commit(table, Seq(seg))
  }

  /** Zero-copy clone: new table points at the source's current segments
    * (reference staging-optimized replace / Delta SHALLOW CLONE,
    * dlt/destinations/sql_jobs.py:117-131). */
  def clone(from: String, to: String): Unit = synchronized {
    val segs = currentSegmentNames(from)
    require(segs.nonEmpty, s"table $from does not exist")
    Files.createDirectories(tableDir(to))
    // segment paths are table-relative; cloning copies manifest entries as
    // absolute pointers into the source table
    val absolute = segs.map(s => tableDir(from).resolve(s).toString)
    commitRaw(to, absolute)
  }

  /** Direct file import: register existing parquet files as live
    * segments WITHOUT reading or rewriting them (reference import-files
    * normalizer, dlt/normalize/items_normalizers/file_import.py, and the
    * arrow direct-import fast path, items_normalizers/arrow.py:161-210).
    * At 100 TB this is the difference between an O(bytes) rewrite and an
    * O(1) metadata commit — the `CONVERT TO DELTA`/`ADD FILES` analog. */
  def importFiles(table: String, paths: Seq[String]): Unit = synchronized {
    require(paths.nonEmpty, "importFiles needs at least one path")
    val absolute = paths.map(p => Paths.get(p).toAbsolutePath.toString)
    Files.createDirectories(tableDir(table))
    commitRaw(table, currentSegmentNames(table) ++ absolute)
  }

  def drop(table: String): Unit = synchronized {
    val dir = tableDir(table)
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
  }

  /** Empty the table but KEEP its schema (reference drop_data refresh
    * truncates without dropping, pipeline/drop.py): the committed state
    * becomes a single schema-only parquet segment. */
  def truncate(table: String): Unit = synchronized {
    if (exists(table)) {
      currentSegments(table) match {
        case Nil => ()
        case segs =>
          val schema = spark.read.parquet(segs.map(_.toString): _*).schema
          val empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          commit(table, Seq(writeSegment(table, empty.coalesce(1))))
      }
    }
  }

  // --- internals ---

  private def writeSegment(table: String, df: DataFrame): String = {
    val seg = s"data/${UUID.randomUUID().toString.take(12)}"
    df.write.mode(SaveMode.Overwrite).parquet(tableDir(table).resolve(seg).toString)
    seg
  }

  private def currentSegments(table: String): Seq[Path] =
    currentSegmentNames(table).map { s =>
      val p = Paths.get(s)
      if (p.isAbsolute) p else tableDir(table).resolve(s)
    }

  private def currentSegmentNames(table: String): Seq[String] = {
    val cur = tableDir(table).resolve("_CURRENT")
    if (!Files.exists(cur)) Nil
    else {
      val manifest = tableDir(table).resolve(
        new String(Files.readAllBytes(cur), StandardCharsets.UTF_8).trim)
      if (!Files.exists(manifest)) Nil
      else {
        val body = new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8)
        body.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      }
    }
  }

  private def commit(table: String, segments: Seq[String]): Unit =
    commitRaw(table, segments)

  private def commitRaw(table: String, segments: Seq[String]): Unit = {
    val dir = tableDir(table)
    Files.createDirectories(dir)
    val n = System.nanoTime()
    val manifest = s"manifest-$n.txt"
    Files.write(dir.resolve(manifest), segments.mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val tmp = dir.resolve(s"_CURRENT.tmp.$n")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8), StandardOpenOption.CREATE)
    Files.move(tmp, dir.resolve("_CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
