package graft.write

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FilesystemSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fresh() =
    new FilesystemSink(Files.createTempDirectory("graft-fss").toString, spark)

  private val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  test("files land under the dlt layout and read back with provenance") {
    val sink = fresh()
    val placed = sink.write("t", rows, "1700000000.1", "jsonl")
    assert(placed.nonEmpty)
    placed.foreach { p =>
      assert(p.getParent.getFileName.toString === "t")
      assert(p.getFileName.toString.matches("1700000000\\.1\\.\\d+\\.jsonl"))
    }
    val back = sink.read("t", "jsonl", Some(rows.schema))
    assert(back.select("id", "v").orderBy("id").as[(Long, String)]
      .collect().toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(back.select("_dlt_load_id").distinct().as[String]
      .collect().toSeq === Seq("1700000000.1"))
  }

  test("append keeps earlier loads; replace clears them") {
    val sink = fresh()
    sink.write("t", rows.filter(col("id") <= 1), "l1", "jsonl")
    sink.write("t", rows.filter(col("id") === 2), "l2", "jsonl")
    assert(sink.read("t", "jsonl", Some(rows.schema)).count() === 2)
    sink.write("t", rows.filter(col("id") === 3), "l3", "jsonl",
      replace = true)
    val after = sink.read("t", "jsonl", Some(rows.schema))
    assert(after.select("id").as[Long].collect().toSeq === Seq(3L))
  }

  test("csv and parquet round-trip through the same layout") {
    val sink = fresh()
    sink.write("c", rows, "l1", "csv")
    assert(sink.read("c", "csv", Some(rows.schema))
      .select("id", "v").orderBy("id").as[(Long, String)]
      .collect().toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    sink.write("p", rows, "l1", "parquet")
    assert(sink.read("p", "parquet")
      .select("id", "v").orderBy("id").as[(Long, String)]
      .collect().toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a caller-passed schema pins parquet types like the text formats") {
    import org.apache.spark.sql.types._
    val sink = fresh()
    sink.write("w", Seq((1, "a")).toDF("id", "v"), "l1", "parquet")
    val pinned = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val back = sink.read("w", "parquet", Some(pinned))
    assert(back.schema("id").dataType === LongType)
    assert(back.select("id").as[Long].collect().toSeq === Seq(1L))
  }
}
