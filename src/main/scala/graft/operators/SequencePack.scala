package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: documents in a deterministic
  * order are virtually concatenated and cut into fixed token-budget
  * chunks (the concat-and-chunk scheme of GPT-style pretraining
  * loaders). Each document learns its global token offset and the
  * chunk interval it occupies — the bin assignment a downstream
  * batch-builder needs.
  *
  * The global running sum is the scale problem: a naive
  * `Window.orderBy(id)` with no partition key moves the whole corpus
  * to ONE task. Here it is a two-level prefix sum, all in one lazy
  * plan, no driver collect:
  *   1. bucket documents by `orderCol div bucketSize` (data-derived,
  *      deterministic — no partition-id dependence, so re-computation
  *      of the plan can never shift assignments);
  *   2. exclusive cumulative sums WITHIN each bucket (parallel windows);
  *   3. one tiny cumulative window over the bucket TOTALS (corpus/
  *      bucketSize rows — thousands at 100 TB), broadcast-joined back.
  */
object SequencePack {

  /** Adds `tok_offset` (exclusive global prefix sum of `lenCol` in
    * `orderCol` order), `first_chunk` and `last_chunk` (inclusive
    * `budget`-sized chunk interval; an empty doc occupies its start
    * chunk). `orderCol` must be integral and unique per row. */
  def chunkAssignments(df: DataFrame, orderCol: String, lenCol: String,
      budget: Long, bucketSize: Long = 1000000L): DataFrame = {
    require(budget > 0 && bucketSize > 0, "budget and bucketSize must be positive")
    val bucketed = df.withColumn("__bucket", expr(s"`$orderCol` div $bucketSize"))
    val within = Window.partitionBy("__bucket").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket totals are corpus/bucketSize rows — the single-partition
    // window below is over that tiny frame, never the data
    val overBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__bucket")
      .agg(sum(col(lenCol).cast("long")).as("__btotal"))
      .withColumn("__boffset", coalesce(sum("__btotal").over(overBuckets), lit(0L)))
      .select("__bucket", "__boffset")
    bucketed
      .withColumn("__within",
        coalesce(sum(col(lenCol).cast("long")).over(within), lit(0L)))
      .join(broadcast(offsets), "__bucket")
      .withColumn("tok_offset", col("__boffset") + col("__within"))
      .withColumn("first_chunk", expr(s"tok_offset div $budget"))
      .withColumn("last_chunk",
        expr(s"(tok_offset + greatest(cast(`$lenCol` as bigint), 1L) - 1L) div $budget"))
      .drop("__bucket", "__within", "__boffset")
  }
}
