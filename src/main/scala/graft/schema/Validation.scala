package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Typed per-field row validation (reference pydantic model validation,
  * dlt/common/libs/pydantic.py:1-589: per-field typed errors, per-field
  * discard, raise/filter modes).
  *
  * The reference validates row-by-row through a model class; the
  * columnar analog evaluates every rule as a vectorized expression and
  * attaches the failures as a `_violations` array of structured
  * (field, expected, value) entries — so a load can fail with FIELD
  * ATTRIBUTION, silently drop bad rows, or route them to a dead-letter
  * table, without a per-row interpreter anywhere. */
object Validation {

  val ViolationsCol = "_violations"

  /** One field's contract: an expected type (checked via `try_cast`,
    * so "uncastable value" is the violation, as in pydantic coercion),
    * a non-null requirement, and an optional predicate (the custom
    * field-validator analog) described by `checkDesc` in violations. */
  final case class FieldRule(
      field: String,
      dataType: Option[DataType] = None,
      required: Boolean = false,
      check: Option[Column => Column] = None,
      checkDesc: String = "check")

  final class FieldViolation(msg: String) extends RuntimeException(msg)

  private val EntryType = "array<struct<field:string,expected:string,value:string>>"

  /** (violated?, violation entry) pairs of one rule. */
  private def ruleViolations(r: FieldRule): Seq[(Column, Column)] = {
    val v = col(r.field)
    def entry(expected: String): Column =
      struct(lit(r.field).as("field"), lit(expected).as("expected"),
        v.cast("string").as("value"))
    val typed = r.dataType.map(dt =>
      (v.isNotNull && v.try_cast(dt).isNull, entry(dt.simpleString)))
    val req = Option.when(r.required)((v.isNull, entry("non-null")))
    val pred = r.check.map(f =>
      (v.isNotNull && !coalesce(f(v), lit(false)), entry(r.checkDesc)))
    (typed ++ req ++ pred).toSeq
  }

  /** Annotate every row with its `_violations` array (empty = valid).
    * One vectorized projection; no shuffle, no row interpreter. Built
    * as concat-of-conditional-singletons rather than a filter() HOF —
    * higher-order functions fall out of whole-stage codegen, and this
    * runs per row of every validated load. */
  def annotate(df: DataFrame, rules: Seq[FieldRule]): DataFrame = {
    require(rules.nonEmpty, "at least one field rule required")
    val (present, absent) = rules.partition(r => df.columns.contains(r.field))
    // a rule on a column the frame doesn't carry is a violation of
    // EVERY row (schema drift / renamed field), not a silently dropped
    // rule — pydantic's missing-required-field error
    val absentEntries = absent.map(r =>
      (lit(true), struct(lit(r.field).as("field"), lit("column present").as("expected"),
        lit(null).cast("string").as("value"))))
    val entries = present.flatMap(ruleViolations) ++ absentEntries
    val empty = array().cast(EntryType)
    val arr =
      if (entries.isEmpty) empty
      else concat(entries.map { case (cond, e) =>
        when(cond, array(e)).otherwise(empty)
      }: _*)
    df.withColumn(ViolationsCol, arr)
  }

  /** Raise mode: the load fails on the first violating row, and the
    * error carries the per-field violation list (field, expected,
    * value) — the pydantic ValidationError analog. Returns the frame
    * unchanged for valid data. */
  def validateOrRaise(df: DataFrame, rules: Seq[FieldRule]): DataFrame =
    annotate(df, rules).filter {
      val ok = size(col(ViolationsCol)) === 0
      when(ok, lit(true)).otherwise(
        assert_true(ok, concat(lit("field validation failed: "),
          to_json(col(ViolationsCol)))).isNull)
    }.drop(ViolationsCol)

  /** Filter mode: violating rows are silently dropped. */
  def validateFilter(df: DataFrame, rules: Seq[FieldRule]): DataFrame =
    annotate(df, rules).filter(size(col(ViolationsCol)) === 0).drop(ViolationsCol)

  /** Dead-letter mode: (valid rows, violating rows + `_violations`).
    * The second frame is load-ready for a `<table>__dead_letters` sink,
    * with the violation structs serialized to JSON so the dead-letter
    * table stays flat. */
  def split(df: DataFrame, rules: Seq[FieldRule]): (DataFrame, DataFrame) = {
    val annotated = annotate(df, rules)
    val valid = annotated.filter(size(col(ViolationsCol)) === 0).drop(ViolationsCol)
    val dead = annotated.filter(size(col(ViolationsCol)) > 0)
      .withColumn(ViolationsCol, to_json(col(ViolationsCol)))
    (valid, dead)
  }
}
