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

  // ---- layout placeholder grammar (reference path_utils.py:25-75) ----

  private val fixedClock: () => java.time.Instant =
    // 2024-03-07T14:25:36.123456789Z — a Thursday in Q1
    () => java.time.Instant.parse("2024-03-07T14:25:36.123456789Z")

  test("date-partitioned layout resolves every datetime placeholder " +
    "from one injected clock snapshot") {
    val root = Files.createTempDirectory("graft-fss").toString
    val sink = new FilesystemSink(root, spark,
      layout = "{table_name}/{YYYY}/{MM}/{DD}/{HH}/{load_id}.{file_id}.{ext}",
      clock = fixedClock)
    val placed = sink.write("t", rows, "1700000000.1", "jsonl")
    assert(placed.nonEmpty)
    placed.foreach { p =>
      val rel = java.nio.file.Paths.get(root).relativize(p).toString
      assert(rel.matches("t/2024/03/07/14/1700000000\\.1\\.\\d+\\.jsonl"), rel)
    }
  }

  test("name/word/epoch placeholders render like the reference " +
    "(lowercased names, epoch seconds/millis, curr_date, quarter)") {
    val root = Files.createTempDirectory("graft-fss").toString
    val sink = new FilesystemSink(root, spark,
      layout = "{table_name}/{curr_date}/{ddd}_{dddd}_{dd}_{d}/{MMM}_{MMMM}/" +
        "q{Q}/{timestamp}.{timestamp_ms}.{load_id}.{file_id}.{ext}",
      clock = fixedClock)
    val placed = sink.write("t", rows.limit(1), "l1", "jsonl")
    val rel = java.nio.file.Paths.get(root).relativize(placed.head)
      .toString
    // 2024-03-07 is a Thursday (d=4 with Sunday=0); epoch 1709821536(.123)
    assert(rel.matches(
      "t/2024-03-07/thu_thursday_th_4/mar_march/q1/" +
        "1709821536\\.1709821536123\\.l1\\.0\\.jsonl"), rel)
  }

  test("load_package_timestamp binds from the write call; missing binding fails") {
    val root = Files.createTempDirectory("graft-fss").toString
    val sink = new FilesystemSink(root, spark,
      layout = "{table_name}/{load_package_timestamp}/{load_id}.{file_id}.{ext}",
      clock = fixedClock)
    val placed = sink.write("t", rows.limit(1), "l1", "jsonl",
      loadPackageTs = Some(java.time.Instant.ofEpochSecond(1600000000L)))
    assert(java.nio.file.Paths.get(root).relativize(placed.head).toString
      .matches("t/1600000000/l1\\.0\\.jsonl"))
    val err = intercept[IllegalArgumentException] {
      sink.write("t", rows.limit(1), "l2", "jsonl")
    }
    assert(err.getMessage.contains("load_package_timestamp"))
  }

  test("unknown placeholders fail fast at construction") {
    val err = intercept[IllegalArgumentException] {
      new FilesystemSink(Files.createTempDirectory("graft-fss").toString,
        spark, layout = "{table_name}/{nope}/{load_id}.{file_id}.{ext}")
    }
    assert(err.getMessage.contains("{nope}"))
  }

  test("{table_name} without a following separator fails at construction") {
    // '{table_name}{load_id}' would make table 't' listing/replace also
    // match sibling 't2' files (quote("t") then [^/]+) — replace could
    // delete another table's data
    val err = intercept[IllegalArgumentException] {
      new FilesystemSink(Files.createTempDirectory("graft-fss").toString,
        spark, layout = "{table_name}{load_id}.{file_id}.{ext}")
    }
    assert(err.getMessage.contains("separator"))
    // with a separator the same shape is fine
    new FilesystemSink(Files.createTempDirectory("graft-fss").toString,
      spark, layout = "{table_name}-{load_id}.{file_id}.{ext}")
  }

  test("a table name containing its layout separator is rejected as ambiguous") {
    // layout separator '_': table 't' regex (t + '_' + [^/]+) would
    // also match table 't_x' files — 't_x_l1.0.jsonl' is genuinely
    // ambiguous, so such names are refused at write AND list time
    val sink = new FilesystemSink(
      Files.createTempDirectory("graft-fss").toString, spark,
      layout = "{table_name}_{load_id}.{file_id}.{ext}", clock = fixedClock)
    sink.write("t", rows.limit(1), "l1", "jsonl") // unambiguous: fine
    val werr = intercept[IllegalArgumentException] {
      sink.write("t_x", rows.limit(1), "l1", "jsonl")
    }
    assert(werr.getMessage.contains("ambiguous"))
    val lerr = intercept[IllegalArgumentException] {
      sink.listFiles("t_x", "jsonl")
    }
    assert(lerr.getMessage.contains("ambiguous"))
    // the default '/' layout never trips this — '/' can't be in a name
    val slash = new FilesystemSink(
      Files.createTempDirectory("graft-fss").toString, spark,
      clock = fixedClock)
    slash.write("t_x", rows.limit(1), "l1", "jsonl")
    assert(slash.listFiles("t_x", "jsonl").nonEmpty)
  }

  test("placeholders before {table_name} cannot open a cross-table hole") {
    // ADJACENT placeholder before {table_name}: no separator at all —
    // rejected at construction
    val adj = intercept[IllegalArgumentException] {
      new FilesystemSink(Files.createTempDirectory("graft-fss").toString,
        spark, layout = "{load_id}{table_name}/{file_id}.{ext}")
    }
    assert(adj.getMessage.contains("separator"))
    // placeholder + separator before {table_name}: the load value class
    // [^/]+ backtracks across '_' (listFiles("x") would match table
    // a_x's file 'l1_a_x…'), so the BEFORE separator is barred from
    // table names — 'a_x' cannot exist under this layout and the
    // remaining parse of 'l1_a_x…' as (table x, load l1_a) is correct
    val pre = new FilesystemSink(
      Files.createTempDirectory("graft-fss").toString, spark,
      layout = "{load_id}_{table_name}.{file_id}.{ext}", clock = fixedClock)
    pre.write("x", rows.limit(1), "l1", "jsonl")
    val err = intercept[IllegalArgumentException] {
      pre.write("a_x", rows.limit(1), "l1", "jsonl")
    }
    assert(err.getMessage.contains("ambiguous"))
    // a LITERAL prefix is fine (nothing to backtrack), with its
    // separator char likewise barred from names
    val lit0 = new FilesystemSink(
      Files.createTempDirectory("graft-fss").toString, spark,
      layout = "tables-{table_name}/{load_id}.{file_id}.{ext}",
      clock = fixedClock)
    lit0.write("t", rows.limit(1), "l1", "jsonl")
    val lerr = intercept[IllegalArgumentException] {
      lit0.write("t-2", rows.limit(1), "l1", "jsonl")
    }
    assert(lerr.getMessage.contains("ambiguous"))
  }

  test("extra placeholders: unused callbacks never run; rendered '/' fails fast") {
    val root = Files.createTempDirectory("graft-fss").toString
    // an UNUSED extra whose callback throws must not break writes —
    // only tokens present in the layout resolve
    val sink = new FilesystemSink(root, spark,
      layout = "{table_name}/{load_id}.{file_id}.{ext}",
      extra = Map("boom" -> (_ => throw new RuntimeException("must not run"))),
      clock = fixedClock)
    assert(sink.write("t", rows.limit(1), "l1", "jsonl").nonEmpty)
    // a used extra rendering a '/' would write files the layout regex
    // can never match again (invisible to listing/replace) — fail fast
    val bad = new FilesystemSink(root, spark,
      layout = "{env}/{table_name}/{load_id}.{file_id}.{ext}",
      extra = Map("env" -> (_ => "pr/od")), clock = fixedClock)
    val err = intercept[IllegalArgumentException] {
      bad.write("t", rows.limit(1), "l2", "jsonl")
    }
    assert(err.getMessage.contains("'/'"))
  }

  test("a loadId containing '/' is rejected — its files would escape the layout") {
    val sink = new FilesystemSink(
      Files.createTempDirectory("graft-fss").toString, spark,
      clock = fixedClock)
    val err = intercept[IllegalArgumentException] {
      sink.write("t", rows.limit(1), "2024/07-run1", "jsonl")
    }
    assert(err.getMessage.contains("'/'"))
  }

  test("a layout without {ext} gets the extension appended") {
    val root = Files.createTempDirectory("graft-fss").toString
    val sink = new FilesystemSink(root, spark,
      layout = "{table_name}/{load_id}.{file_id}", clock = fixedClock)
    val placed = sink.write("t", rows.limit(1), "l1", "jsonl")
    assert(placed.head.getFileName.toString === "l1.0.jsonl")
  }

  test("extra placeholders: static values and callbacks with the layout context") {
    val root = Files.createTempDirectory("graft-fss").toString
    val sink = new FilesystemSink(root, spark,
      layout = "{env}/{owner_of_table}/{table_name}/{load_id}.{file_id}.{ext}",
      extra = Map(
        "env" -> (_ => "prod"),
        "owner_of_table" -> (ctx => s"team-${ctx.table}")),
      clock = fixedClock)
    val placed = sink.write("t", rows.limit(1), "l1", "jsonl")
    assert(java.nio.file.Paths.get(root).relativize(placed.head).toString
      .matches("prod/team-t/t/l1\\.0\\.jsonl"))
  }

  test("listing, replace, and provenance stay table-scoped across date partitions") {
    val root = Files.createTempDirectory("graft-fss").toString
    // two sinks over the SAME root with different clock days — two date
    // partitions of one table, plus a sibling table that must be untouched
    val day1 = new FilesystemSink(root, spark,
      layout = "{table_name}/{YYYY}/{MM}/{DD}/{load_id}.{file_id}.{ext}",
      clock = () => java.time.Instant.parse("2024-03-07T00:00:00Z"))
    val day2 = new FilesystemSink(root, spark,
      layout = "{table_name}/{YYYY}/{MM}/{DD}/{load_id}.{file_id}.{ext}",
      clock = () => java.time.Instant.parse("2024-03-08T00:00:00Z"))
    day1.write("t", rows.filter(col("id") === 1), "l1", "jsonl")
    day2.write("t", rows.filter(col("id") === 2), "l2", "jsonl")
    day1.write("other", rows.filter(col("id") === 3), "l3", "jsonl")
    // listing sees both partitions of t, not the sibling
    assert(day2.listFiles("t", "jsonl").size === 2)
    // provenance parses the load id out of the date-partitioned path
    val back = day2.read("t", "jsonl", Some(rows.schema))
    assert(back.select("_dlt_load_id").distinct().as[String]
      .collect().toSet === Set("l1", "l2"))
    // replace clears every partition of t and leaves the sibling alone
    day2.write("t", rows.filter(col("id") === 3), "l4", "jsonl",
      replace = true)
    assert(day2.read("t", "jsonl", Some(rows.schema))
      .select("id").as[Long].collect().toSeq === Seq(3L))
    assert(day1.read("other", "jsonl", Some(rows.schema)).count() === 1)
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
