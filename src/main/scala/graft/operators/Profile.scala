package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling — the "describe my data" operator every
  * ingestion pipeline runs before trusting a source (the role Deequ /
  * dbt tests / dlt's schema inference play around loads): per column,
  * row count, null count, distinct estimate, min/max, and mean.
  *
  * Shape: the table is MELTED to (column, value-as-string, numeric
  * value) with one `stack` projection — no shuffle — and every
  * statistic is a hash-aggregate over the melted frame:
  *  - counts/min/max/mean: one groupBy(column) pass with map-side
  *    combine (numeric means sum DECIMAL(28,12)-exact per value, so
  *    the result is engine-stable);
  *  - distinct estimates: the [[Sketches.hllRegisters]] table with
  *    `column` as the group cell — sketch-sized, mergeable, and
  *    externally replayable like every sketch in the family.
  * Total cost: one scan + two bounded aggregations, at any table
  * width/volume. Profiles of different partitions/loads merge the
  * usual sketch way (counts add, min/min, max/max, registers max). */
object Profile {

  /** Profile `cols` of `df`: one row per column —
    * (column, n_rows, n_nulls, distinct_est, min_str, max_str, mean).
    * String min/max are lexicographic on the string form; `mean` is
    * null for non-numeric columns. */
  def profile(df: DataFrame, cols: Seq[String], hllM: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val numericCols = df.schema.fields
      .filter(f => cols.contains(f.name))
      .filter(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).toSet
    // melt: (column, s = string form, x = numeric value or null)
    val melted = graft.ext.Dedup.pin(df.select(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("s"),
          (if (numericCols(c)) col(c).cast("double") else lit(null).cast("double"))
            .as("x")).as(c)): _*)
      .select(explode(array(cols.map(col): _*)).as("m"))
      .select(col("m.column"), col("m.s"), col("m.x")))
    val base = melted.groupBy("column").agg(
      count(lit(1)).as("n_rows"),
      count(lit(1)).minus(count(col("s"))).as("n_nulls"),
      min("s").as("min_str"),
      max("s").as("max_str"),
      round(sum(col("x").cast("decimal(28,12)")).cast("double")
        / count(col("x")), 6).as("mean"))
    val distinct = Sketches.hllEstimate(
        Sketches.hllRegisters(melted.where(col("s").isNotNull),
          Seq("column"), "s", m = hllM),
        Seq("column"), m = hllM)
      .select(col("column"), col("estimate").as("distinct_est"))
    base.join(distinct, Seq("column"))
      .select("column", "n_rows", "n_nulls", "distinct_est",
        "min_str", "max_str", "mean")
      .orderBy("column")
  }
}
