package graft.schema

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.pipeline.{Pipeline, Resource}

/** All-data-types round trip (reference conformance core,
  * tests/cases.py:30-110 JSON_TYPED_DICT + assert_all_data_types_row;
  * FIXTURES.md §A1): one row exercising every dlt type survives the full
  * pipeline (normalize → store → read) with schema and values intact. */
class TypesRoundTripSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("col1_bigint", LongType),
    StructField("col2_double", DoubleType),
    StructField("col3_bool", BooleanType),
    StructField("col4_ts", TimestampType),
    StructField("col5_text", StringType),
    StructField("col6_decimal", DecimalType(38, 9)),
    StructField("col7_binary", BinaryType),
    StructField("col8_wei", DecimalType(38, 0)),
    StructField("col9_json", StringType),
    StructField("col10_date", DateType),
    StructField("col11_time_us", LongType),
    StructField("p_int16", ShortType),
    StructField("p_int32", IntegerType),
    StructField("ts_naive", TimestampNTZType)))

  private val row = Row(
    Long.MaxValue,
    3.141592653589793d,
    true,
    java.sql.Timestamp.valueOf("2024-03-01 11:22:33.445566"),
    "unicode ✓ emoji 🚀 escapes \"\\\n\ttab",
    new java.math.BigDecimal("12345678901234567890123456789.123456789"),
    Array[Byte](0, 1, 127, -128),
    new java.math.BigDecimal("99999999999999999999999999999999999999"), // 38 nines
    """{"nested":{"a":[1,2,3]},"b":null}""",
    java.sql.Date.valueOf("2024-02-29"),
    (13L * 3600 + 14 * 60 + 15) * 1000000L + 123456L,
    Short.MaxValue,
    Int.MinValue,
    java.time.LocalDateTime.parse("2024-03-01T11:22:33.445566"))

  test("every dlt type survives pipeline -> store -> read bit-exact") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), schema)
    val p = new Pipeline("types", Files.createTempDirectory("types").toString, spark)
    p.run(Seq(Resource("alltypes", df)), "1")
    val back = p.store.read("alltypes")

    // schema preserved exactly for every business column
    schema.fields.foreach { f =>
      assert(back.schema(f.name).dataType === f.dataType,
        s"type drift on ${f.name}")
    }

    val r = back.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*).head()
    assert(r.getLong(0) === Long.MaxValue)
    assert(r.getDouble(1) === 3.141592653589793d)
    assert(r.getBoolean(2))
    assert(r.getTimestamp(3) === java.sql.Timestamp.valueOf("2024-03-01 11:22:33.445566"))
    assert(r.getString(4) === "unicode ✓ emoji 🚀 escapes \"\\\n\ttab")
    assert(r.getDecimal(5) ===
      new java.math.BigDecimal("12345678901234567890123456789.123456789"))
    assert(r.getAs[Array[Byte]](6).toSeq === Seq[Byte](0, 1, 127, -128))
    assert(r.getDecimal(7) ===
      new java.math.BigDecimal("99999999999999999999999999999999999999"))
    assert(r.getString(8) === """{"nested":{"a":[1,2,3]},"b":null}""")
    assert(r.getDate(9) === java.sql.Date.valueOf("2024-02-29"))
    assert(r.getLong(10) === (13L * 3600 + 14 * 60 + 15) * 1000000L + 123456L)
    assert(r.getShort(11) === Short.MaxValue)
    assert(r.getInt(12) === Int.MinValue)
    assert(r.getAs[java.time.LocalDateTime](13) ===
      java.time.LocalDateTime.parse("2024-03-01T11:22:33.445566"))
  }

  test("dlt type mapping is a total bijection on the supported matrix") {
    DltType.all.foreach { t =>
      val spark = DltType.toSpark(t)
      assert(spark != null)
    }
    // precision-variant bigints (tests/cases.py:162-181)
    assert(DltType.toSpark(DltType.Bigint, precision = Some(16)) === ShortType)
    assert(DltType.toSpark(DltType.Bigint, precision = Some(32)) === IntegerType)
    assert(DltType.toSpark(DltType.Bigint) === LongType)
    // timestamp timezone flag → TZ vs NTZ
    assert(DltType.toSpark(DltType.Timestamp, timezone = true) === TimestampType)
    assert(DltType.toSpark(DltType.Timestamp, timezone = false) === TimestampNTZType)
  }
}
