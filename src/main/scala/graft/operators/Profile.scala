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
    * null for non-numeric columns.
    *
    * ONE streaming pass: the melt feeds a single hash-aggregate keyed
    * on (column, HLL register) — counts, null counts, min/max,
    * decimal-exact partial sums AND the register max-rank all
    * accumulate in the same map-side-combined pass, so nothing
    * corpus-sized is ever cached or scanned twice (an earlier version
    * pinned the full melted frame for two aggregations; the pin
    * materialization WAS the cost — and a corpus-sized cache is
    * exactly what a 100 TB profile cannot afford). Only the grouped
    * register table (≤ cols × (m+1) rows) is pinned for its two tiny
    * consumers (stat rollup + HLL estimate). Null values take register
    * −1: present in the count/null rollup, excluded from the distinct
    * estimate — byte-identical results to the two-pass form. */
  def profile(df: DataFrame, cols: Seq[String], hllM: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(hllM >= 16 && hllM <= 4096 && (hllM & (hllM - 1)) == 0,
      "hllM must be a power of two in [16, 4096]")
    val numericCols = df.schema.fields
      .filter(f => cols.contains(f.name))
      .filter(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).toSet
    // melt: (column, s = string form, x = numeric value or null)
    val melted = df.select(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("s"),
          (if (numericCols(c)) col(c).cast("double") else lit(null).cast("double"))
            .as("x")).as(c)): _*)
      .select(explode(array(cols.map(col): _*)).as("m"))
      .select(col("m.column"), col("m.s"), col("m.x"))
    // same hash/register math as Sketches.hllRegisters (md5 prefix
    // register, 32-bit-suffix leading-zero rank) so external replay
    // is unchanged
    val h = md5(col("s"))
    val reg = when(col("s").isNull, lit(-1L))
      .otherwise(conv(substring(h, 1, 3), 16, 10).cast("long") % hllM)
    val rank = lit(33) - length(ltrim(bin(
      conv(substring(h, 4, 8), 16, 10).cast("long")), "0"))
    val grouped = graft.ext.Dedup.pin(melted
      .withColumn("register", reg)
      .withColumn("rank", rank)
      .groupBy("column", "register")
      .agg(count(lit(1)).as("g_rows"),
        count(col("s")).as("g_vals"),
        min("s").as("g_min"),
        max("s").as("g_max"),
        sum(col("x").cast("decimal(28,12)")).as("g_sum"),
        count(col("x")).as("g_nx"),
        max("rank").as("rank")))
    val base = grouped.groupBy("column").agg(
      sum("g_rows").as("n_rows"),
      sum("g_rows").minus(sum("g_vals")).as("n_nulls"),
      min("g_min").as("min_str"),
      max("g_max").as("max_str"),
      round(sum("g_sum").cast("double") / sum("g_nx"), 6).as("mean"))
    val distinct = Sketches.hllEstimate(
        grouped.where(col("register") >= 0)
          .select("column", "register", "rank"),
        Seq("column"), m = hllM)
      .select(col("column"), col("estimate").as("distinct_est"))
    base.join(distinct, Seq("column"))
      .select("column", "n_rows", "n_nulls", "distinct_est",
        "min_str", "max_str", "mean")
      .orderBy("column")
  }
}
