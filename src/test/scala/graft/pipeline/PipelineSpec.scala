package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.incremental.Incremental
import graft.schema.{TableHints, TableReference}
import graft.write.MergeConfig
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def newPipeline() =
    new Pipeline("test", Files.createTempDirectory("graft-pipe").toString, spark)

  test("append pipeline run: normalize + system columns + loads table") {
    val p = newPipeline()
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val written = p.run(Seq(Resource("My Table", df)), "1")
    assert(written("My Table") == Seq("my_table"))
    val out = p.store.read("my_table")
    assert(out.columns.toSet == Set("k", "v", "_dlt_id", "_dlt_load_id"))
    assert(out.count() == 2)
    assert(p.dataset.loadIds == Seq("1"))
  }

  test("merge pipeline run with nested children") {
    val p = newPipeline()
    def res(rows: Seq[(String, String, Seq[Int])]) =
      Resource("docs", rows.toDF("k", "v", "items"))
        .withMerge(MergeConfig(primaryKey = Seq("k")))
    p.run(Seq(res(Seq(("a", "v1", Seq(1, 2)), ("b", "v1", Seq(3))))), "1")
    p.run(Seq(res(Seq(("a", "v2", Seq(9))))), "2")
    val root = p.store.read("docs")
    assert(root.count() == 2)
    assert(root.filter($"k" === "a").select("v").as[String].head() == "v2")
    val items = p.store.read("docs__items")
    assert(items.select("value").as[Long].collect().sorted.toSeq == Seq(3L, 9L))
  }

  test("incremental resource processes each row exactly once across runs") {
    val p = newPipeline()
    val cfg = Incremental.Config(cursorColumn = "cur", primaryKey = Seq("v"))
    def res(rows: Seq[(Long, String)]) =
      Resource("ev", rows.toDF("cur", "v")).withIncremental(cfg)
    p.run(Seq(res(Seq((1L, "a"), (2L, "b")))), "1")
    // overlap: row b at boundary re-delivered, c new at boundary, d beyond
    p.run(Seq(res(Seq((2L, "b"), (2L, "c"), (3L, "d")))), "2")
    val out = p.store.read("ev")
    assert(out.select("v").as[String].collect().sorted.toSeq == Seq("a", "b", "c", "d"))
  }

  test("dataset facade: reference join, parent-child join, fromLoads") {
    val p = newPipeline()
    p.run(Seq(Resource("dim", Seq((1L, "x"), (2L, "y")).toDF("id", "label"))), "1")
    p.run(Seq(Resource("fact",
      Seq((10L, 1L, Seq("t1")), (11L, 2L, Seq("t2", "t3"))).toDF("fid", "dim_id", "tags"))), "2")
    p.registry.register("fact", p.store.read("fact").schema,
      TableHints(references = Seq(TableReference(Seq("dim_id"), "dim", Seq("id")))))
    p.registry.register("fact__tags", p.store.read("fact__tags").schema,
      TableHints(parent = Some("fact")))

    val ds = p.dataset
    val joined = ds.table("fact").join("dim").df()
    assert(joined.count() == 2)
    assert(joined.columns.contains("dim__label"))
    assert(joined.filter($"fid" === 10L).select("dim__label").as[String].head() == "x")

    val childJoin = ds.table("fact").join("fact__tags").df()
    assert(childJoin.count() == 3)

    // provenance: child table gains _dlt_load_id from its root
    val withLid = ds.table("fact__tags").withLoadIdCol().df()
    assert(withLid.select("_dlt_load_id").as[String].collect().forall(_ == "2"))
    assert(ds.table("fact").fromLoads(Seq("2")).df().count() == 2)

    // row counts
    val rc = ds.rowCounts()
    assert(rc.filter($"table_name" === "fact__tags").select("row_count").as[Long].head() == 3L)
  }

  test("query passthrough exposes stored tables as views") {
    val p = newPipeline()
    p.run(Seq(Resource("t1", Seq((1, "a")).toDF("id", "v"))), "1")
    val out = p.dataset.query("SELECT COUNT(*) AS n FROM t1")
    assert(out.as[Long].head() == 1L)
  }
}
