package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the alignment operator behind feature
  * stores and event attribution. The reference delegates its relational
  * algebra to destination engines (dlt/helpers/ibis.py), several of
  * which ship ASOF JOIN natively; core Spark has no such operator, and
  * the naive formulation (`l.ts >= r.ts` + a per-key max) plans as a
  * BroadcastNestedLoopJoin that dies at scale.
  *
  * Formulation here: tag both sides, union them, and run ONE cumulative
  * window per key ordered by time — the latest right row "so far" is a
  * running last-non-null that left rows pick up as they stream past.
  * Both sides shuffle exactly once on the key, the window is a single
  * streaming pass (running frame, no re-scan), and no broadcast or
  * nested loop exists at any size. Key skew is the only hazard —
  * pre-salt hot keys upstream (graft.ext.Skew) if a key dominates.
  */
object AsofJoin {

  /** For each left row, attach the single latest right row with
    * `right.rightTs <= left.leftTs` (strict: `<`), matching per `keys`.
    * Left rows with no prior right row keep null matches (ASOF LEFT
    * JOIN semantics — filter `matched_<rightTs> IS NOT NULL` for inner).
    *
    * Right columns (minus the keys) come back prefixed with
    * `rightPrefix`. When several right rows share (key, ts), the
    * lexicographically greatest payload wins deterministically —
    * pre-aggregate the right side (e.g. `max_by`) to control the pick.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, strict: Boolean = false,
      rightPrefix: String = "matched_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    val lType = left.select(struct(lCols.map(col): _*)).schema.head.dataType
    val rType = right.select(struct(rPayload.map(col): _*)).schema.head.dataType

    // side ordering at EQUAL ts: inclusive → right first (visible to the
    // left row); strict → right after the left row (invisible to it)
    val rSide = if (strict) 2 else 0
    val lFrame = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rFrame = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(rSide).as("__side"),
        lit(null).cast(lType).as("__l"), struct(rPayload.map(col): _*).as("__r")): _*)

    // running frame: last non-null right struct seen so far in key+time
    // order (whole-struct carry, so a later right row wins wholesale even
    // when some of its payload fields are null)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lFrame.unionByName(rFrame)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = lCols.map(c => col(s"__l.$c").as(c)) ++
      rPayload.map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    matched.select(out: _*)
  }

  /** For each left row, the single EARLIEST right row with
    * `right.rightTs >= left.leftTs` (strict: `>`) — the forward
    * direction, same one-shuffle plan. Implemented as [[backward]] over
    * negated time: both columns must be numeric (epoch micros/nanos). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, strict: Boolean = false,
      rightPrefix: String = "matched_"): DataFrame = {
    val l = left.withColumn(leftTs, -col(leftTs))
    val r = right.withColumn(rightTs, -col(rightTs))
    backward(l, r, keys, leftTs, rightTs, strict, rightPrefix)
      .withColumn(leftTs, -col(leftTs))
      .withColumn(s"$rightPrefix$rightTs", -col(s"$rightPrefix$rightTs"))
  }
}
