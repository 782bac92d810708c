package graft.schema

import scala.util.matching.Regex

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type autodetection for untyped (string) columns — the batch analog of
  * the reference's per-value detections (dlt/common/schema/detections.py:
  * 16-84: `timestamp`, `iso_timestamp`, `iso_date`, `large_integer`) and
  * regex-driven preferred types (`TSchemaSettings.preferred_types`,
  * schema/typing.py:393).
  *
  * The reference inspects each Python value during normalize; on a
  * columnar engine detection is ONE aggregate over the frame per string
  * column (count parsable vs count non-null), then a vectorized cast for
  * columns where every non-null value agrees. Detection priority:
  * iso_date before iso_timestamp before large_integer/bigint — a value
  * set that is all bare dates stays a date.
  */
object Detections {

  private val DateRe = "^\\d{4}-\\d{2}-\\d{2}$"
  private val TsRe = "^\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}(:\\d{2})?(\\.\\d+)?([Zz]|[+-]\\d{2}:?\\d{2})?$"
  private val IntRe = "^-?\\d+$"

  /** Cast every string column whose non-null values ALL parse as one of
    * the detected types. Columns with any non-conforming value are left
    * as text (exactly the reference's per-value fallback). */
  def autodetect(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val candidates = df.schema.fields
      .filter(_.dataType == StringType).map(_.name)
      .filter(c => columns.isEmpty || columns.contains(c))
    if (candidates.isEmpty) return df

    val aggs = candidates.flatMap { c =>
      Seq(
        count(col(c)).as(s"n_$c"),
        count(when(regexp_like(col(c), lit(DateRe)), 1)).as(s"date_$c"),
        count(when(regexp_like(col(c), lit(TsRe)) &&
          try_to_timestamp(col(c)).isNotNull, 1)).as(s"ts_$c"),
        count(when(regexp_like(col(c), lit(IntRe)) &&
          col(c).try_cast(LongType).isNotNull, 1)).as(s"int_$c"),
        count(when(regexp_like(col(c), lit(IntRe)), 1)).as(s"bigdec_$c"))
    }
    val r = df.agg(aggs.head, aggs.toIndexedSeq.tail: _*).head()
    def n(name: String): Long = r.getAs[Long](name)

    candidates.foldLeft(df) { (acc, c) =>
      val total = n(s"n_$c")
      if (total == 0) acc
      else if (n(s"date_$c") == total) acc.withColumn(c, col(c).cast(DateType))
      else if (n(s"ts_$c") == total) acc.withColumn(c, to_timestamp(col(c)))
      else if (n(s"int_$c") == total) acc.withColumn(c, col(c).cast(LongType))
      else if (n(s"bigdec_$c") == total) // large_integer → wei-style decimal
        acc.withColumn(c, col(c).cast(DecimalType(38, 0)))
      else acc
    }
  }

  /** Preferred types by column-name regex (first matching rule wins):
    * the schema-settings mechanism that forces e.g. every `.*_at$`
    * column to timestamp regardless of inferred type. */
  def applyPreferredTypes(df: DataFrame, rules: Seq[(Regex, DataType)]): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      rules.collectFirst {
        case (re, t) if re.findFirstIn(f.name).isDefined && f.dataType != t => t
      } match {
        case Some(t) => acc.withColumn(f.name, col(f.name).cast(t))
        case None => acc
      }
    }
}
