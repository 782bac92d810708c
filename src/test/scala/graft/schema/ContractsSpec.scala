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
}
