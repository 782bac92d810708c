package graft.normalize

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden decomposition cases from FIXTURES.md §A2 (the synthetic minimal
  * goldens mirroring tests/normalize/cases in the reference suite). */
class NormalizerSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = NormalizeConfig(loadId = "1700000000.1")

  private def normJson(json: String*): Map[String, org.apache.spark.sql.DataFrame] =
    JsonIngest.normalize(spark, spark.createDataset(json.toSeq), "doc", cfg)

  test("dict-in-dict flattens to a__b") {
    val tables = normJson("""{"a":{"b":1},"top":"x"}""")
    assert(tables.keySet == Set("doc"))
    val doc = tables("doc")
    assert(doc.columns.contains("a__b"))
    val row = doc.select("a__b", "top").head()
    assert(row.getLong(0) == 1L && row.getString(1) == "x")
    assert(doc.columns.contains("_dlt_id") && doc.columns.contains("_dlt_load_id"))
  }

  test("list of dicts becomes child table with parent id and list idx") {
    val tables = normJson("""{"k":"r1","items":[{"v":10},{"v":20}]}""")
    assert(tables.keySet == Set("doc", "doc__items"))
    val child = tables("doc__items").orderBy("_dlt_list_idx")
    assert(child.columns.toSet == Set("_dlt_parent_id", "_dlt_list_idx", "v", "_dlt_id"))
    val parentId = tables("doc").select("_dlt_id").head().getString(0)
    val rows = child.collect()
    assert(rows.map(_.getAs[Long]("v")).toSeq == Seq(10L, 20L))
    assert(rows.map(_.getAs[Int]("_dlt_list_idx")).toSeq == Seq(0, 1))
    assert(rows.forall(_.getAs[String]("_dlt_parent_id") == parentId))
    // child ids are deterministic digests, not random
    val again = normJson("""{"k":"r1","items":[{"v":10},{"v":20}]}""")("doc__items")
    // parent id is random so child ids differ run-to-run; but within one run
    // they are distinct and non-null
    assert(rows.map(_.getAs[String]("_dlt_id")).distinct.length == 2)
  }

  test("list of primitives wraps elements as value") {
    val tables = normJson("""{"k":"r1","tags":["a","b","c"]}""")
    val child = tables("doc__tags").orderBy("_dlt_list_idx")
    assert(child.columns.contains("value"))
    assert(child.select("value").as[String].collect().toSeq == Seq("a", "b", "c"))
  }

  test("list of lists goes through the intermediary list wrapping") {
    val tables = normJson("""{"k":"r1","m":[[1,2],[3]]}""")
    assert(tables.keySet == Set("doc", "doc__m", "doc__m__list"))
    val inner = tables("doc__m__list").orderBy("_dlt_parent_id", "_dlt_list_idx")
    assert(inner.columns.contains("value"))
    assert(inner.select("value").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // grandchild parent ids point at the intermediary table's rows
    val midIds = tables("doc__m").select("_dlt_id").as[String].collect().toSet
    val innerParents = inner.select("_dlt_parent_id").as[String].collect().toSet
    assert(innerParents.subsetOf(midIds))
  }

  test("max nesting keeps deep structs as json text") {
    val tables = JsonIngest.normalize(spark,
      spark.createDataset(Seq("""{"a":{"b":{"c":{"d":1}}}}""")), "doc",
      cfg.copy(maxNesting = 2))
    val doc = tables("doc")
    assert(doc.columns.contains("a__b"))
    val v = doc.select("a__b").head().getString(0)
    assert(v.contains("\"c\"") && v.contains("\"d\""))
  }

  test("empty keys become _empty and weird identifiers normalize") {
    // the Spark JSON reader silently drops empty field names, so build the
    // struct directly to exercise Flatten's naming path
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("", LongType), StructField("Camel Case", LongType),
      StructField("1x", LongType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(5L, 1L, 2L)), schema)
    val cols = Flatten(df).columns.toSet
    assert(cols == Set("_empty", "camel_case", "_1x"))
  }

  test("root key propagation reaches all descendants") {
    val tables = JsonIngest.normalize(spark,
      spark.createDataset(Seq("""{"k":"r1","items":[{"v":1,"sub":[{"w":2}]}]}""")),
      "doc", cfg.copy(propagate = Map("_dlt_id" -> "_dlt_root_id")))
    val rootId = tables("doc").select("_dlt_id").head().getString(0)
    assert(tables("doc__items").select("_dlt_root_id").head().getString(0) == rootId)
    assert(tables("doc__items__sub").select("_dlt_root_id").head().getString(0) == rootId)
    assert(!tables("doc").columns.contains("_dlt_root_id"))
  }

  test("row_hash root ids are content-deterministic") {
    val a = JsonIngest.normalize(spark, spark.createDataset(Seq("""{"k":"r1","v":1}""")),
      "doc", cfg.copy(rootIdType = RootIdType.RowHash))("doc")
    val b = JsonIngest.normalize(spark, spark.createDataset(Seq("""{"k":"r1","v":1}""")),
      "doc", cfg.copy(rootIdType = RootIdType.RowHash))("doc")
    assert(a.select("_dlt_id").head().getString(0) == b.select("_dlt_id").head().getString(0))
  }

  test("key_hash root ids depend only on the primary key") {
    val mk = (v: Int) => JsonIngest.normalize(spark,
      spark.createDataset(Seq(s"""{"k":"r1","v":$v}""")), "doc",
      cfg.copy(rootIdType = RootIdType.KeyHash(Seq("k"))))("doc")
    assert(mk(1).select("_dlt_id").head().getString(0) ==
      mk(2).select("_dlt_id").head().getString(0))
  }
}
