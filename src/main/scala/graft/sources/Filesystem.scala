package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.incremental.Incremental

/** Filesystem source (reference dlt/sources/filesystem/__init__.py:1-167,
  * readers.py:15-143): list files as FileItems, then reader transformers
  * per format. Spark's distributed readers replace the fsspec+chunk loop;
  * `input_file_name()` supplies per-row provenance.
  */
object Filesystem {

  /** The cursor config incremental listings ride (the reference composes
    * the filesystem source with `dlt.sources.incremental` on
    * `FileItem.modification_date` — filesystem/__init__.py:1-167): mtime
    * is the cursor, the boundary fingerprint is the file PATH, so a
    * re-listed file sitting exactly on the stored boundary mtime is
    * dropped while a genuinely new (or rewritten, newer-mtime) file
    * loads. Files with no mtime are excluded rather than erroring. */
  val incrementalListing: Incremental.Config = Incremental.Config(
    cursorColumn = "modification_date",
    primaryKey = Seq("file_url"),
    onMissing = Incremental.Exclude)

  /** Incremental file listing: list the glob, keep only files NEWER than
    * the stored cursor (boundary-deduped by path), and return the
    * advanced state to persist for the next run. Exactly-once per file
    * across overlapping listings; a file REWRITTEN with a newer mtime
    * re-delivers, matching the reference's new-and-changed semantics.
    * The mtime window is an ordinary pushable predicate over the listing
    * frame; state stays driver-small (one timestamp + the boundary
    * paths' fingerprints). */
  def listIncremental(spark: SparkSession, globPath: String,
      state: Incremental.State): (DataFrame, Incremental.State) = {
    val fresh = Incremental(listFiles(spark, globPath), incrementalListing, state)
    (fresh, Incremental.advance(fresh, incrementalListing, state))
  }

  /** FileItem listing (reference FileItem): one row per file with path,
    * size and modification time — `binaryFile` gives the metadata without
    * reading content (content column dropped). */
  def listFiles(spark: SparkSession, globPath: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*")
      .load(globPath)
      .select(
        col("path").as("file_url"),
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("modificationTime").as("modification_date"),
        col("length").as("size_in_bytes"))

  /** read_csv transformer (readers.py) with file provenance column. */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
              inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)
      .withColumn("_file_name", input_file_name())

  /** read_jsonl transformer — distributed line-JSON parse with inference. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path).withColumn("_file_name", input_file_name())

  /** read_parquet transformer. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).withColumn("_file_name", input_file_name())
}
