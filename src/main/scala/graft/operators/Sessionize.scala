package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a new session starts
  * where the time since the key's previous event exceeds `gap`. The
  * batch analog of Structured Streaming's `session_window` (which
  * covers the streaming side, SURVEY §2.8) — one hash shuffle on the
  * key, then two streaming window passes; no state, no iteration.
  *
  * Tie-safety: the running boundary count uses a RANGE frame, so rows
  * sharing (key, ts) always land in the same session with the same
  * sequence number regardless of their physical order — re-runs and
  * speculative retries agree. */
object Sessionize {

  /** Adds `session_seq`: the 0-based session index per key, in time
    * order. `tsCol` must be numeric (epoch micros/nanos) so gap
    * arithmetic is exact. */
  def assign(df: DataFrame, keys: Seq[String], tsCol: String,
      gap: Long, seqCol: String = "session_seq"): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val boundary = when(
      lag(col(tsCol), 1).over(byKey).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(byKey) > gap, 1L).otherwise(0L)
    val running = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__b", boundary)
      .withColumn(seqCol, sum(col("__b")).over(running) - 1L)
      .drop("__b")
  }
}
