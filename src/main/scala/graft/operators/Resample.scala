package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: bucket events into fixed-width intervals,
  * DENSIFY the grid (emit empty buckets between each key's first and
  * last observation — the step most engines make painful), and compute
  * trailing moving aggregates over the regular grid.
  *
  * Plan shape: one hash aggregate for the per-bucket counts, one tiny
  * per-key min/max aggregate, a `sequence` explode to generate each
  * key's grid (work ∝ output rows, no driver loop, no cross join), an
  * equi-join back, and a bounded ROWS window. Every shuffle is keyed on
  * (key, bucket) or key — at 100 TB the grid explode is the only row
  * amplification and it is proportional to the densified output the
  * caller asked for.
  */
object Resample {

  /** Per-(key, bucket) counts on a dense grid: (key, bucket, n) for
    * every bucket in [min, max] of that key, n = 0 where nothing
    * happened. `timeCol` must be an integral epoch; `width` is the
    * bucket width in the same unit. */
  def denseCounts(df: DataFrame, key: String, timeCol: String,
      width: Long): DataFrame = {
    // integral `div`, not `/`: Column./ is double division and loses
    // precision on epoch-nano magnitudes (~1e18 > 2^53)
    val bucketed = df.select(col(key),
      expr(s"CAST(`$timeCol` AS BIGINT) div ${width}L").as("bucket"))
    val counts = bucketed.groupBy(key, "bucket").agg(count(lit(1)).as("n"))
    val grid = bucketed.groupBy(key)
      .agg(min("bucket").as("_b0"), max("bucket").as("_b1"))
      .select(col(key), explode(sequence(col("_b0"), col("_b1"))).as("bucket"))
    grid.join(counts, Seq(key, "bucket"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** Trailing moving average over `lookback + 1` buckets of the dense
    * grid, emitted as micro-units (x1e6 BIGINT) for engine-stable
    * rendering. */
  def withMovingAvg(dense: DataFrame, key: String,
      lookback: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy("bucket")
      .rowsBetween(-lookback, Window.currentRow)
    dense.withColumn("ma_e6",
      (avg(col("n")).over(w).cast("decimal(18,6)") * 1000000).cast("long"))
  }
}
