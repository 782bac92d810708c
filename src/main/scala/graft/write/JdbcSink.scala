package graft.write

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.sources.JdbcTableConfig

/** JDBC destination (reference dlt/destinations/impl/postgres/ and the
  * shared SQL load jobs, dlt/destinations/sql_jobs.py) — the "load into
  * an external warehouse" counterpart of the [[TableStore]] lakehouse,
  * reusing the reader-side [[JdbcTableConfig]].
  *
  * Data movement is Spark's distributed JDBC writer (one connection per
  * partition, `batchsize` inserts); merge follows the reference's
  * staging-table protocol: load staging via the distributed writer,
  * then a constant number of driver-side DML statements (DELETE via
  * EXISTS + INSERT .. SELECT) that run INSIDE the database — the driver
  * never holds rows, so the pattern survives any staging size. */
object JdbcSink {

  /** Quoted identifier, matching Spark's JDBC writer which creates
    * columns with their exact DataFrame case. */
  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** Rows per INSERT batch. Deliberately NOT cfg.fetchSize — that is a
    * read-side cursor hint; coupling them would let a read-memory tune
    * silently degrade write throughput. Override via the standard
    * `batchsize` entry in cfg.properties. */
  private val DefaultWriteBatch = 10000

  private def writer(df: DataFrame, cfg: JdbcTableConfig, table: String) = {
    var w = df.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("batchsize", DefaultWriteBatch.toString)
    cfg.properties.foreach { case (k, v) => w = w.option(k, v) }
    w
  }

  /** Append disposition: distributed INSERTs, table created on demand. */
  def append(df: DataFrame, cfg: JdbcTableConfig): Unit =
    writer(df, cfg, cfg.table).mode(SaveMode.Append).save()

  /** Replace disposition (truncate-and-insert when the database supports
    * TRUNCATE, drop-and-recreate otherwise — Spark's overwrite modes). */
  def replace(df: DataFrame, cfg: JdbcTableConfig,
      truncate: Boolean = false): Unit =
    writer(df, cfg, cfg.table).mode(SaveMode.Overwrite)
      .option("truncate", truncate.toString).save()

  /** Merge delete-insert (reference gen_merge_sql, sql_jobs.py:633-654):
    * stage the batch with the distributed writer, then inside the
    * database delete destination rows whose key appears in staging and
    * insert the staged rows, IN ONE TRANSACTION — an autocommitted
    * DELETE followed by a failing INSERT would permanently lose the
    * deleted destination rows. The staging table is dropped afterwards.
    * Statements run in one driver-side connection; rows never transit
    * the driver. */
  def mergeDeleteInsert(df: DataFrame, cfg: JdbcTableConfig,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "merge needs key columns")
    val staging = s"${cfg.table}__staging"
    writer(df, cfg, staging).mode(SaveMode.Overwrite).save()
    val cols = df.columns.map(q).mkString(", ")
    val keyMatch = keys.map(k => s"s.${q(k)} = t.${q(k)}").mkString(" AND ")
    val conn = java.sql.DriverManager.getConnection(cfg.url,
      cfg.properties.foldLeft(new java.util.Properties) { case (p, (k, v)) =>
        p.setProperty(k, v); p
      })
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        // destination may not exist on first load: create it empty from
        // the staging shape, then the delete matches nothing
        if (!tableExists(conn, cfg.table))
          st.executeUpdate(
            s"CREATE TABLE ${cfg.table} AS SELECT * FROM $staging WITH NO DATA")
        st.executeUpdate(
          s"DELETE FROM ${cfg.table} t WHERE EXISTS " +
            s"(SELECT 1 FROM $staging s WHERE $keyMatch)")
        st.executeUpdate(
          s"INSERT INTO ${cfg.table} ($cols) SELECT $cols FROM $staging")
        st.executeUpdate(s"DROP TABLE $staging")
        conn.commit()
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw e
      } finally st.close()
    } finally conn.close()
  }

  /** Does `table` exist in the CONNECTION'S current catalog/schema?
    * An unscoped metadata scan would match a same-named table in any
    * other schema and wrongly skip destination creation. */
  private def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    val (cat, sch) =
      (scala.util.Try(conn.getCatalog).getOrElse(null),
        scala.util.Try(conn.getSchema).getOrElse(null))
    val rs = conn.getMetaData.getTables(cat, sch, null, Array("TABLE"))
    try {
      var found = false
      while (!found && rs.next())
        found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      found
    } finally rs.close()
  }
}
