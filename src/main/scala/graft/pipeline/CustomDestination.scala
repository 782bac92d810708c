package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** What the sink callback learns about the batch it receives — the
  * reference passes `table_schema` beside the items; table name +
  * load id + Spark schema is the Spark-native equivalent. */
final case class SinkTable(name: String, loadId: String, schema: StructType)

/** Custom function destinations — the reference's `@dlt.destination`
  * (dlt/destinations/decorators.py:24-118, impl/destination/factory.py):
  * a user function becomes the load target; the pipeline still
  * extracts, normalizes and tracks schema/state locally, but the final
  * write is the callback — reverse ETL, notification sinks, anything
  * without a table behind it. Reference contract mirrored:
  *  - APPEND-ONLY: the reference supports no merge/replace through a
  *    custom destination; [[Pipeline.runTo]] ignores write dispositions;
  *  - `naming_convention` default "direct" (decorators.py:73-74):
  *    identifiers reach the callback unchanged;
  *  - `skip_dlt_columns_and_tables` default true (decorators.py:76-77):
  *    `_dlt_*` system columns are stripped before the callback and
  *    system tables are never sent;
  *  - `max_table_nesting` default 0 (decorators.py:79-82): nested data
  *    stays as JSON values, no child tables — this OVERRIDES the
  *    resource's own nesting setting, as in the reference.
  *
  * Two callback shapes map the reference's `batch_size`:
  *  - batch_size = 0 → [[CustomDestination.apply]]: ONE driver-side
  *    call per (table, load) with the whole normalized DataFrame — the
  *    reference's "file path per load job" mode, right for sinks that
  *    are themselves Spark writers (`df.write...`) and must never
  *    round-trip rows through the driver;
  *  - batch_size > 0 → [[CustomDestination.pushing]]: the callback runs
  *    IN THE EXECUTORS over row groups of `batchSize`
  *    (`foreachPartition` + grouped — the distributed analog of the
  *    reference's parallel load workers, `max_parallel_load_jobs`).
  *    The function must be Serializable, and push sinks inherit the
  *    at-least-once caveat every executor-side effect has: a task
  *    retry re-pushes its partition's groups (the reference tracks
  *    progress per load job, not per batch — same exposure). */
trait CustomDestination extends Serializable {
  /** Identifier convention for the tables/columns handed to the sink
    * (a [[graft.schema.NamingConventions]] registry key). */
  def namingConvention: String = "direct"
  def skipDltColumns: Boolean = true
  def maxTableNesting: Int = 0
  def sinkFrame(df: DataFrame, table: SinkTable): Unit
}

object CustomDestination {

  /** Whole-frame mode (reference `batch_size = 0`): one call per
    * (table, load) on the driver, the frame still distributed. */
  def apply(fn: (DataFrame, SinkTable) => Unit): CustomDestination =
    new CustomDestination {
      def sinkFrame(df: DataFrame, table: SinkTable): Unit = fn(df, table)
    }

  /** Push mode (reference `batch_size > 0`): `fn` runs in the
    * executors over row groups of at most `batchSize`. */
  def pushing(batchSize: Int)(
      fn: (Seq[Row], SinkTable) => Unit): CustomDestination = {
    require(batchSize >= 1,
      "batchSize >= 1 — whole-frame mode is CustomDestination.apply")
    new CustomDestination {
      def sinkFrame(df: DataFrame, table: SinkTable): Unit =
        df.foreachPartition { (rows: Iterator[Row]) =>
          rows.grouped(batchSize).foreach(g => fn(g.toSeq, table))
        }
    }
  }
}
