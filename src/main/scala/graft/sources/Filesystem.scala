package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Filesystem source (reference dlt/sources/filesystem/__init__.py:1-167,
  * readers.py:15-143): list files as FileItems, then reader transformers
  * per format. Spark's distributed readers replace the fsspec+chunk loop;
  * `input_file_name()` supplies per-row provenance.
  */
object Filesystem {

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
