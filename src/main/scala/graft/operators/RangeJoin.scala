package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without an equi-key: which points fall inside
  * which intervals. Spark plans a bare inequality join as a
  * BroadcastNestedLoopJoin — O(points × intervals) and a broadcast
  * requirement that fails outright on a large build side.
  *
  * Binning makes it a hash join: quantize the axis at `binWidth`,
  * replicate each interval to every bin it covers, map each point to its
  * single bin, equi-join on the bin, then apply the exact range
  * predicate. A (point, interval) pair can only meet in the point's one
  * bin, so the output needs no dedup pass. Cost: one hash shuffle +
  * O(span/binWidth) replication per interval — pick `binWidth` near the
  * typical interval span so replication stays O(1). This is the
  * standard distributed range-join strategy (Spark's own range-join
  * hints on Databricks, GeoSpark's 1-D case).
  */
object RangeJoin {

  /** Join `points` to the `intervals` whose `[startCol, endCol]` (both
    * inclusive) contain `pointTs`. All three columns must be integral
    * (epoch-nanos longs in the event plane). Column names of the two
    * inputs must not collide except shared `keys` (pre-select/alias on
    * the way in). Optional `keys` add an equi-dimension: rows must also
    * match on them (per-entity intervals), which both tightens the
    * candidate set and spreads the shuffle across (key, bin). */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
      pointTs: String, startCol: String, endCol: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty, s"column collision: ${overlap.mkString(", ")}")
    // integer `div`, not double division: epoch-nanos exceed 2^53, where
    // double arithmetic silently loses whole bins
    def bin(c: String) = expr(s"`$c` div $binWidth")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(startCol), bin(endCol))))
    points.withColumn("__bin", bin(pointTs))
      .join(binned, "__bin" +: keys)
      .filter(col(pointTs).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** INTERVAL × INTERVAL overlap join: pairs whose `[s, e]` ranges
    * intersect (inclusive ends). Same binning strategy — both sides
    * replicate to covering bins and equi-join on the bin — but an
    * overlapping pair can now share MANY bins, so each pair is emitted
    * only in the first bin both occupy (`max(bin(s_a), bin(s_b))`):
    * exact dedup as a filter, never a distinct over the output. */
  def intervalsOverlap(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty, s"column collision: ${overlap.mkString(", ")}")
    def bin(c: String) = expr(s"`$c` div $binWidth")
    val l = left.withColumn("__bin",
      explode(sequence(bin(leftStart), bin(leftEnd))))
    val r = right.withColumn("__bin",
      explode(sequence(bin(rightStart), bin(rightEnd))))
    l.join(r, "__bin" +: keys)
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd))
      .filter(col("__bin") ===
        greatest(expr(s"`$leftStart` div $binWidth"),
          expr(s"`$rightStart` div $binWidth")))
      .drop("__bin")
  }
}
