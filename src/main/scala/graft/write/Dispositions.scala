package graft.write

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.normalize.Ids

/** Replace strategies (reference typing.py:252, sql_jobs.py:84-146). All
  * three are atomic here because every [[TableStore]] commit is an atomic
  * manifest swap; they are kept as distinct entry points for API parity
  * and because they differ on a real warehouse. */
sealed trait ReplaceStrategy
object ReplaceStrategy {
  case object TruncateAndInsert extends ReplaceStrategy
  case object InsertFromStaging extends ReplaceStrategy
  case object StagingOptimized extends ReplaceStrategy
}

/** Merge strategy selector (typing.py:251). */
sealed trait MergeStrategy
object MergeStrategy {
  case object DeleteInsert extends MergeStrategy
  case object Upsert extends MergeStrategy
  case object InsertOnly extends MergeStrategy
}

/** Write-disposition operators over a [[TableStore]] (reference load plane,
  * dlt/load/load.py + dlt/destinations/sql_jobs.py; SURVEY.md §2.5).
  *
  * Each load runs through a staging table (`<table>__staging`), mirroring
  * the reference's staging dataset (sql_client.py:290), then commits the
  * merged result atomically and records the load in `_dlt_loads`.
  */
final class Dispositions(store: TableStore, spark: SparkSession) {

  val LoadsTable = "_dlt_loads"

  def newLoadId(): String = (System.currentTimeMillis() / 1000.0).toString

  def append(table: String, df: DataFrame, loadId: String): Unit = {
    store.append(table, stamp(df, loadId))
    recordLoad(loadId)
  }

  def replace(table: String, df: DataFrame, loadId: String,
              strategy: ReplaceStrategy = ReplaceStrategy.TruncateAndInsert): Unit = {
    strategy match {
      case ReplaceStrategy.TruncateAndInsert =>
        store.overwrite(table, stamp(df, loadId))
      case ReplaceStrategy.InsertFromStaging =>
        val staging = s"${table}__staging"
        store.overwrite(staging, stamp(df, loadId))
        store.overwrite(table, store.read(staging))
        store.drop(staging)
      case ReplaceStrategy.StagingOptimized =>
        val staging = s"${table}__staging"
        store.overwrite(staging, stamp(df, loadId))
        store.drop(table)
        store.clone(staging, table)
    }
    recordLoad(loadId)
  }

  def merge(table: String, staging: DataFrame, cfg: MergeConfig, loadId: String,
            strategy: MergeStrategy = MergeStrategy.DeleteInsert): Unit = {
    val dest = store.readOption(table)
    val staged = stamp(staging, loadId)
    val result = strategy match {
      case MergeStrategy.DeleteInsert => Merge.deleteInsert(dest, staged, cfg)
      case MergeStrategy.Upsert => Merge.upsert(dest, staged, cfg)
      case MergeStrategy.InsertOnly => Merge.insertOnly(dest, staged, cfg)
    }
    store.overwrite(table, result)
    recordLoad(loadId)
  }

  def scd2(table: String, staging: DataFrame, cfg: Scd2Config, loadId: String): Unit = {
    val result = Scd2(store.readOption(table), stamp(staging, loadId), cfg)
    store.overwrite(table, result)
    recordLoad(loadId)
  }

  private def stamp(df: DataFrame, loadId: String): DataFrame =
    if (df.columns.contains(Ids.DltLoadId)) df
    else df.withColumn(Ids.DltLoadId, lit(loadId))

  /** `_dlt_loads` system table (reference typing.py:40, load.py:605-624). */
  def recordLoad(loadId: String, schemaName: String = "graft",
                 versionHash: String = ""): Unit = {
    import spark.implicits._
    val row = Seq((loadId, schemaName, 0, java.time.Instant.now().toString, versionHash))
      .toDF("load_id", "schema_name", "status", "inserted_at", "schema_version_hash")
    store.append(LoadsTable, row)
  }

  def loadIds: Seq[String] = store.readOption(LoadsTable) match {
    case None => Nil
    case Some(df) => df.select("load_id").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
  }
}
