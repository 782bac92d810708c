package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated grouped quantiles, computed DISTRIBUTED.
  *
  * The reference delegates quantiles to its destination engines
  * (dlt/helpers/ibis.py → `quantile`); Spark's exact `percentile`
  * aggregate accumulates a per-group value→count map in the aggregation
  * buffer — on a continuous key a group holding 25% of a 100 TB table
  * concentrates an unbounded distinct-value map on one reducer, the
  * classic scale-killer. This operator gets the SAME answer from one
  * shuffle and a spillable sort:
  *
  *   1. unpivot the requested value columns to (group, column, value),
  *   2. one window pass per (group, column): `row_number` + partition
  *      count — Spark's window sort is externalizable
  *      (UnsafeExternalSorter spills), so group size is disk-bounded,
  *      not heap-bounded,
  *   3. keep ONLY the one-or-two rows that bracket each requested
  *      quantile position and linearly interpolate between them with
  *      the standard type-7 weights ((n−1)·q, the definition shared by
  *      Spark `percentile` and DuckDB `quantile_cont`).
  *
  * The interpolation is the identical double arithmetic Spark's
  * `Percentile` evaluator uses — `(hi−pos)·v_lo + (pos−lo)·v_hi` — so
  * results are bit-equal to the builtin aggregate.
  *
  * Divergence (documented): a group whose values are ALL null for every
  * requested column vanishes from the output, where the map-based
  * aggregate would emit the group with null quantiles. Nulls within a
  * populated group are ignored identically.
  */
object Percentiles {

  /** One requested quantile: `q` of `valueCol`, emitted as `as`. */
  final case class QuantileSpec(valueCol: String, q: Double, as: String) {
    require(q >= 0.0 && q <= 1.0, s"quantile out of [0,1]: $q")
  }

  /** Grouped exact quantiles over `keys`; one output column per spec.
    * All requested value columns ride one unpivot and one shuffle. */
  def groupQuantiles(df: DataFrame, keys: Seq[String],
      specs: Seq[QuantileSpec]): DataFrame = {
    require(specs.nonEmpty, "at least one quantile spec")
    val srcCols = specs.map(_.valueCol).distinct

    // unpivot: one row per (input row, value column); nulls drop here so
    // the per-partition count matches the aggregate's non-null n
    val stacked = df.select(
      keys.map(col) :+ explode(array(srcCols.map(c =>
        struct(lit(c).as("src"), col(c).cast("double").as("v"))): _*)).as("sv"): _*)
      .select(keys.map(col) :+ col("sv.src").as("__src") :+ col("sv.v").as("__v"): _*)
      .filter(col("__v").isNotNull)

    // one Window exec, two frames over the same sort: a running count as
    // the 0-based rank (LONG — row_number() is an Int and would wrap
    // negative past 2^31 rows in one partition, exactly the huge-group
    // case this operator exists for) and the full-partition count. Rank
    // ties are arbitrary but tied rows carry equal __v, so the
    // interpolation is unaffected. Double rank is exact to 2^53 rows.
    val part = (keys :+ "__src").map(col)
    val w = Window.partitionBy(part: _*).orderBy(col("__v"))
    val ranked = stacked
      .withColumn("__i", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double") - 1d) // 0-based
      .withColumn("__n", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))

    // a row survives iff it brackets some requested quantile position
    def pos(s: QuantileSpec): Column = (col("__n") - 1d) * lit(s.q)
    def brackets(s: QuantileSpec): Column =
      col("__src") === s.valueCol &&
        (col("__i") === floor(pos(s)) || col("__i") === ceil(pos(s)))

    // Spark Percentile's interpolation verbatim: lower==higher → the
    // value itself; else (higher−pos)·v_lo + (pos−lo)·v_hi. At most two
    // rows contribute per (group, spec); two-term double addition is
    // order-independent, so SUM reassembles the exact expression.
    def contrib(s: QuantileSpec): Column = {
      val p = pos(s)
      when(col("__src") === s.valueCol && floor(p) === ceil(p) && col("__i") === floor(p),
          col("__v"))
        .when(col("__src") === s.valueCol && col("__i") === floor(p),
          (ceil(p) - p) * col("__v"))
        .when(col("__src") === s.valueCol && col("__i") === ceil(p),
          (p - floor(p)) * col("__v"))
    }

    ranked.filter(specs.map(brackets).reduce(_ || _))
      .groupBy(keys.map(col): _*)
      .agg(sum(contrib(specs.head)).as(specs.head.as),
        specs.tail.map(s => sum(contrib(s)).as(s.as)): _*)
  }
}
