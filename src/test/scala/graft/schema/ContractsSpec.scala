package graft.schema

import graft.SparkSpec
import org.apache.spark.sql.types._

class ContractsSpec extends SparkSpec {
  import spark.implicits._
  import Contracts._

  private val existing = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("evolve keeps new columns") {
    val df = Seq((1L, "a", 9.5)).toDF("id", "name", "extra")
    val out = enforce(df, existing, Contract())
    assert(out.columns.contains("extra"))
  }

  test("freeze raises on new columns") {
    val df = Seq((1L, "a", 9.5)).toDF("id", "name", "extra")
    intercept[ContractViolation] {
      enforce(df, existing, Contract(columns = Freeze))
    }
  }

  test("discard_value drops new columns") {
    val df = Seq((1L, "a", 9.5)).toDF("id", "name", "extra")
    val out = enforce(df, existing, Contract(columns = DiscardValue))
    assert(out.columns.toSet == Set("id", "name"))
  }

  test("discard_row drops rows carrying values in new columns") {
    val df = Seq((1L, "a", Some(9.5)), (2L, "b", None)).toDF("id", "name", "extra")
    val out = enforce(df, existing, Contract(columns = DiscardRow))
    assert(out.count() == 1)
    assert(out.select("id").as[Long].head() == 2L)
  }

  test("data_type discard_row drops uncastable rows") {
    val df = Seq(("1", "a"), ("x", "b")).toDF("id", "name")
    val out = enforce(df, existing, Contract(dataType = DiscardRow))
    assert(out.count() == 1)
    assert(out.schema("id").dataType == LongType)
  }

  test("new table gating") {
    assert(allowNewTable("t", exists = true, Contract(tables = Freeze)))
    assert(allowNewTable("t", exists = false, Contract()))
    assert(!allowNewTable("t", exists = false, Contract(tables = DiscardRow)))
    intercept[ContractViolation] {
      allowNewTable("t", exists = false, Contract(tables = Freeze))
    }
  }

  // --- typed per-field validation (pydantic analog, Validation) ---

  private val fieldRules = Seq(
    Validation.FieldRule("age", dataType = Some(IntegerType)),
    Validation.FieldRule("name", required = true),
    Validation.FieldRule("score",
      check = Some(c => c >= 0 && c <= 100), checkDesc = "in [0,100]"))

  private def rows = Seq(
    ("1", "5", "good", 50),   // valid
    ("2", "nan", "ok", 60),   // age not castable
    ("3", "7", null, 70),     // name missing
    ("4", "8", "fine", 400)   // score out of range
  ).toDF("id", "age", "name", "score")

  test("per-field annotate attributes each violation to its field") {
    import org.apache.spark.sql.functions._
    val ann = Validation.annotate(rows, fieldRules)
    val by = ann.select(col("id"), explode(col(Validation.ViolationsCol)).as("v"))
      .select("id", "v.field", "v.expected", "v.value")
      .as[(String, String, String, String)].collect().toSet
    assert(by == Set(
      ("2", "age", "int", "nan"),
      ("3", "name", "non-null", null),
      ("4", "score", "in [0,100]", "400")))
  }

  test("raise mode fails the load and names the field") {
    val e = intercept[Exception] {
      Validation.validateOrRaise(rows, fieldRules).collect()
    }
    assert(e.getMessage.contains("field validation failed"))
    assert(e.getMessage.contains("\"field\":"))
  }

  test("filter mode keeps only fully valid rows") {
    val out = Validation.validateFilter(rows, fieldRules)
    assert(out.select("id").as[String].collect().toSeq == Seq("1"))
    assert(!out.columns.contains(Validation.ViolationsCol))
  }

  test("dead-letter split routes violations with JSON detail") {
    val (valid, dead) = Validation.split(rows, fieldRules)
    assert(valid.count() == 1)
    val deadRows = dead.select("id", Validation.ViolationsCol)
      .as[(String, String)].collect().toMap
    assert(deadRows.keySet == Set("2", "3", "4"))
    assert(deadRows("2").contains("\"expected\":\"int\""))
  }

  test("resource dead-letter wiring produces a loadable pair") {
    val r = graft.pipeline.Resource("users", rows)
    val (main, dlq) = r.withDeadLetter(fieldRules)
    assert(dlq.name == "users__dead_letters")
    assert(main.frame.count() == 1 && dlq.frame.count() == 3)
  }
}
