package graft.pipeline

import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame

/** Generator budgets — LimitItem parity for GENERIC resources
  * (reference dlt/extract/items_transform.py:174-239): `max_items` in
  * rows or batches and `max_time` wall-clock, applied to a CHUNK
  * GENERATOR the way the reference applies them to a pipe generator.
  *
  * A single lazy DataFrame has no generator to time-bound — its whole
  * plan is "one batch", so the row limit ([[Resource.addLimit]] →
  * `frame.limit`) is the only budget with meaning there. The reference
  * semantics bite on CHUNKED extraction (paged APIs, file batches,
  * cursor chunks): chunks are admitted while the budgets hold, with the
  * reference's exact edge behavior —
  *  - the chunk that CROSSES the row budget still lands (the reference
  *    returns the last item after marking the pipe exhausted;
  *    items_transform.py:228-236);
  *  - `maxRows == 0` yields nothing at all (items_transform.py:234-236);
  *  - once the deadline elapses, no further chunk is pulled — the
  *    generator is closed, matching `gen.close()` on exhaustion, so a
  *    slow upstream is not even asked for the next page;
  *  - in batch-counting mode (`countRows = false`) every pulled chunk —
  *    including an empty one — counts 1 against the budget
  *    (items_transform.py:219-221).
  */
object Limits {

  /** Bound `chunks` by `maxRows` / `maxTime`. `rowsOf` sizes a chunk in
    * row-counting mode; `clock` (nanos) is injectable so specs don't
    * sleep. The returned iterator pulls lazily: chunks past the budget
    * are never requested from the source. */
  def bounded[T](chunks: Iterator[T],
      maxRows: Option[Long] = None,
      maxTime: Option[Duration] = None,
      rowsOf: T => Long,
      countRows: Boolean = true,
      clock: () => Long = () => System.nanoTime()): Iterator[T] = {
    if (maxRows.contains(0L)) return Iterator.empty
    val deadline = maxTime.map(t => clock() + t.toNanos)
    new Iterator[T] {
      private var count = 0L
      private var exhausted = false
      def hasNext: Boolean =
        !exhausted && deadline.forall(clock() < _) && chunks.hasNext
      def next(): T = {
        if (!hasNext) throw new NoSuchElementException("budget exhausted")
        val c = chunks.next()
        count += (if (countRows) rowsOf(c) else 1L)
        if (maxRows.exists(count >= _)) exhausted = true
        c
      }
    }
  }

  /** [[bounded]] over DataFrame chunks, assembled into one frame — the
    * extract-plane entry: `Resource(name, Limits.boundedUnion(...))`.
    * Row-counting mode counts each admitted chunk with `df.count()`
    * (an action per chunk — chunked extraction is already action-paced
    * upstream, e.g. one fetch per page); batch mode is free. An empty
    * admission yields an empty frame with `schema`'s shape. */
  def boundedUnion(spark: org.apache.spark.sql.SparkSession,
      chunks: Iterator[DataFrame],
      schema: org.apache.spark.sql.types.StructType,
      maxRows: Option[Long] = None,
      maxTime: Option[Duration] = None,
      countRows: Boolean = true,
      clock: () => Long = () => System.nanoTime()): DataFrame = {
    val admitted = bounded[DataFrame](chunks, maxRows, maxTime,
      rowsOf = _.count(), countRows = countRows, clock = clock).toSeq
    if (admitted.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else admitted.reduce(_ unionByName _)
  }
}
