package graft.normalize

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Schemaless-JSON ingestion: distributed schema inference + typed parse.
  *
  * The reference infers schema row-by-row during normalize
  * (dlt/normalize/items_normalizers/jsonl.py:217-260); on a columnar engine
  * the same evolution contract is applied per micro-batch (SURVEY §1.3):
  * one distributed inference pass over the batch, then a vectorized
  * `from_json` with the merged schema.
  */
object JsonIngest {

  /** Parse a dataset of JSON documents with inferred schema. */
  def parse(spark: SparkSession, json: Dataset[String]): DataFrame =
    spark.read.json(json)

  /** Infer the schema of a JSON string column across the whole frame and
    * replace it with the parsed struct (named `column`). Two scans: one
    * for inference, one for the parse — both columnar and distributed.
    */
  def parseColumn(df: DataFrame, column: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = spark.read.json(df.select(col(column)).as[String]).schema
    df.withColumn(column, from_json(col(column), schema))
  }

  /** Parse a JSON string column into Spark 4's `VariantType` — the
    * schemaless document kept queryable without an inference pass
    * (SURVEY §1.2 maps the dlt `json` type here). Fields come back out
    * with `variant_get(v, "$.path", type)`; unlike [[parseColumn]] this
    * is ONE scan and tolerates heterogeneous rows. */
  def parseVariantColumn(df: DataFrame, column: String): DataFrame =
    df.withColumn(column, parse_json(col(column)))

  /** Full schemaless path: JSON documents → normalized table map. */
  def normalize(spark: SparkSession, json: Dataset[String], rootTable: String,
                cfg: NormalizeConfig): Map[String, DataFrame] =
    Normalizer.normalize(parse(spark, json), rootTable, cfg)
}
