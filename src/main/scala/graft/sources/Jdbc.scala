package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

import graft.incremental.Incremental

/** sql_database / sql_table source (reference dlt/sources/sql_database/
  * __init__.py:37-57, loaders helpers.py:86-407).
  *
  * The reference reflects tables via SQLAlchemy and pages rows through a
  * cursor (`chunk_size=50000`); Spark's JDBC source replaces both: schema
  * reflection is native, and `partitionColumn/lowerBound/upperBound/
  * numPartitions` split the scan across executors — the distributed
  * analog of the reference's single-cursor batching. Incremental cursors
  * push down as a WHERE clause (reference incremental/sql.py:61-165) via
  * the `dbtable` subquery, so the filter runs in the source database.
  */
final case class JdbcTableConfig(
    url: String,
    table: String,
    /** numeric/date column used to split the scan across executors */
    partitionColumn: Option[String] = None,
    numPartitions: Int = 8,
    lowerBound: Option[String] = None,
    upperBound: Option[String] = None,
    fetchSize: Int = 50000,
    properties: Map[String, String] = Map.empty,
    incremental: Option[Incremental.Config] = None,
    incrementalState: Incremental.State = Incremental.State.empty)

object Jdbc {

  /** SQL literal for a cursor value: numeric values are emitted unquoted
    * (no reliance on implicit DB string→number coercion), everything else
    * is single-quoted with embedded quotes doubled — cursor state flows
    * from data, so it must never be able to break out of the literal. */
  private def sqlLiteral(v: String): String =
    if (scala.util.Try(BigDecimal(v)).isSuccess) v
    else "'" + v.replace("'", "''") + "'"

  /** Cursor column identifier: plain identifiers (and dotted paths) pass
    * through; anything else is ANSI-double-quoted with quotes doubled. */
  private def ident(c: String): String =
    if (c.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*")) c
    else "\"" + c.replace("\"", "\"\"") + "\""

  /** The WHERE clause pushed into the source database for an incremental
    * window (reference incremental/sql.py:61-165). `render` maps the
    * cursor column name to the SQL identifier text — the default passes
    * plain names through unquoted (the database applies its own fold);
    * [[reader]] substitutes the REFLECTED exact name instead. */
  def incrementalWhere(cfg: Incremental.Config, state: Incremental.State,
      render: String => String = ident): Option[String] = {
    // a custom last_value_func is an arbitrary predicate — not pushable
    if (cfg.lastValueFunc.isInstanceOf[Incremental.CustomFunc]) return None
    val cursor = render(cfg.cursorColumn)
    // startValue is lag-aware: the pushed WHERE opens the same window
    // the DataFrame filter would
    val start = Incremental.startValue(cfg, state).map { v =>
      val op = (cfg.lastValueFunc, cfg.closedStart) match {
        case (Incremental.MaxFunc, true) => ">="
        case (Incremental.MaxFunc, false) => ">"
        case (Incremental.MinFunc, true) => "<="
        case (Incremental.MinFunc, false) => "<"
        case _ => throw new IllegalStateException(
          "unreachable: custom last_value_func returned None above")
      }
      s"$cursor $op ${sqlLiteral(v)}"
    }
    val end = cfg.endValue.map { v =>
      val op = cfg.lastValueFunc match {
        case Incremental.MaxFunc => "<"
        case Incremental.MinFunc => ">"
        case _ => throw new IllegalStateException(
          "unreachable: custom last_value_func returned None above")
      }
      s"$cursor $op ${sqlLiteral(v)}"
    }
    val nulls = cfg.onMissing match {
      case Incremental.Include => Some(s"$cursor IS NULL")
      case _ => None
    }
    val window = (start.toSeq ++ end.toSeq).reduceOption(_ + " AND " + _)
    (window, nulls) match {
      case (Some(w), Some(n)) => Some(s"($w) OR $n")
      case (Some(w), None) => Some(w)
      case (None, Some(n)) => Some(n)
      case _ => None
    }
  }

  /** Resolve the cursor column against the REFLECTED table schema and
    * quote the exact stored name (the reference reflects tables via
    * SQLAlchemy and renders reflected Column objects — sql_database/
    * helpers.py:86-407 — so its WHERE never depends on the engine's
    * identifier fold). Matters both ways: a table created by Spark's
    * JDBC writer has quoted LOWERCASE columns an unquoted identifier
    * misses on a fold-up engine (Derby/Oracle), while a hand-created
    * table has folded-UPPERCASE columns a quoted lowercase name misses.
    * Quoting the exact reflected name is correct in both worlds; an
    * unresolvable or non-simple name falls back to [[ident]]. */
  private def reflectedIdent(spark: SparkSession, cfg: JdbcTableConfig)(
      c: String): String = {
    if (!c.matches("[A-Za-z_][A-Za-z0-9_]*")) return ident(c)
    val names = scala.util.Try {
      var r = spark.read.format("jdbc")
        .option("url", cfg.url).option("dbtable", cfg.table)
      cfg.properties.foreach { case (k, v) => r = r.option(k, v) }
      r.load().schema.fieldNames.toSeq
    }.getOrElse(Nil)
    val exact = names.find(_ == c).orElse(names.filter(_.equalsIgnoreCase(c)) match {
      case Seq(one) => Some(one)
      case _ => None // absent or ambiguous: let the database fold it
    })
    exact match {
      case Some(name) =>
        val q = graft.write.JdbcCapabilities.forUrl(cfg.url).quoteChar.toString
        q + name.replace(q, q + q) + q
      case None => ident(c)
    }
  }

  /** Build the partitioned JDBC reader. The incremental window folds into
    * the pushed-down table subquery. */
  def reader(spark: SparkSession, cfg: JdbcTableConfig): DataFrameReader = {
    val where = cfg.incremental.flatMap(
      incrementalWhere(_, cfg.incrementalState, reflectedIdent(spark, cfg)))
    val dbtable = where match {
      // the alias must start with a letter: several engines (Derby among
      // them) reject unquoted leading-underscore identifiers
      case Some(w) => s"(SELECT * FROM ${cfg.table} WHERE $w) AS graft_src"
      case None => cfg.table
    }
    var r = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", dbtable)
      .option("fetchsize", cfg.fetchSize.toString)
    cfg.partitionColumn.foreach { pc =>
      r = r.option("partitionColumn", pc)
        .option("numPartitions", cfg.numPartitions.toString)
      cfg.lowerBound.foreach(lb => r = r.option("lowerBound", lb))
      cfg.upperBound.foreach(ub => r = r.option("upperBound", ub))
    }
    cfg.properties.foreach { case (k, v) => r = r.option(k, v) }
    r
  }

  def read(spark: SparkSession, cfg: JdbcTableConfig): DataFrame = reader(spark, cfg).load()

  /** Reflect the connection's CURRENT catalog/schema and list its table
    * names (the reference's schema-level `sql_database()` source
    * enumerates every table and emits one resource per table —
    * sql_database/__init__.py:37-57; `sql_table()` is the single-table
    * form this maps to via [[read]]). Scoped to the connection's own
    * catalog+schema so a same-named table in another schema is never
    * pulled in. */
  def listTables(url: String,
      properties: Map[String, String] = Map.empty): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url,
      properties.foldLeft(new java.util.Properties) { case (p, (k, v)) =>
        p.setProperty(k, v); p
      })
    try {
      val (cat, sch) =
        (scala.util.Try(conn.getCatalog).getOrElse(null),
          scala.util.Try(conn.getSchema).getOrElse(null))
      val rs = conn.getMetaData.getTables(cat, sch, null, Array("TABLE"))
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      try while (rs.next()) names += rs.getString("TABLE_NAME")
      finally rs.close()
      names.toSeq.sorted
    } finally conn.close()
  }

  /** The whole-schema source: one lazily-planned DataFrame per
    * reflected table, keyed by table name. `configure` customizes the
    * per-table config (partition column, incremental cursor) — the
    * default reads each table unpartitioned. Frames are lazy: no scan
    * runs until a table is actually consumed, so reflecting a
    * 500-table schema costs one metadata round trip. */
  def readAllTables(spark: SparkSession, url: String,
      properties: Map[String, String] = Map.empty,
      configure: String => JdbcTableConfig = null): Map[String, DataFrame] = {
    val mk: String => JdbcTableConfig =
      if (configure != null) configure
      else t => JdbcTableConfig(url, t, properties = properties)
    listTables(url, properties).map(t => t -> read(spark, mk(t))).toMap
  }
}
