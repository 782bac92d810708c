package graft.schema

import org.apache.spark.sql.types._

import graft.SparkSpec

class DetectionsSpec extends SparkSpec {
  import spark.implicits._

  test("autodetect: dates, timestamps, ints, huge ints; mixed stays text") {
    val df = Seq(
      ("2024-01-31", "2024-01-31T10:00:00Z", "42", "99999999999999999999", "x1"),
      ("2023-12-01", "2023-12-01 23:59:59", "-7", "12345678901234567890123", "2024-01-01")
    ).toDF("d", "ts", "i", "big", "mixed")
    val out = Detections.autodetect(df)
    assert(out.schema("d").dataType === DateType)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.schema("i").dataType === LongType)
    assert(out.schema("big").dataType === DecimalType(38, 0))
    assert(out.schema("mixed").dataType === StringType) // one non-date value
    assert(out.count() === 2)
    val r = out.orderBy("i").head()
    assert(r.getAs[Long]("i") === -7L)
    assert(r.getAs[java.sql.Date]("d") === java.sql.Date.valueOf("2023-12-01"))
  }

  test("autodetect leaves all-null and empty columns alone") {
    val df = Seq((None: Option[String], "a"), (None, "b")).toDF("n", "s")
    val out = Detections.autodetect(df)
    assert(out.schema("n").dataType === StringType)
    assert(out.schema("s").dataType === StringType)
  }

  test("preferred types by name regex override inferred types") {
    val df = Seq((1, "2024-01-01 00:00:00", 5)).toDF("id", "created_at", "price")
    val out = Detections.applyPreferredTypes(df, Seq(
      (".*_at$".r, TimestampType),
      ("^price$".r, DecimalType(18, 2))))
    assert(out.schema("created_at").dataType === TimestampType)
    assert(out.schema("price").dataType === DecimalType(18, 2))
    assert(out.schema("id").dataType === IntegerType) // untouched
  }
}
