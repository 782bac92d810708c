package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A driver-runnable query: (session, sf-directory) => result frame. */
  type Q = (SparkSession, String) => DataFrame

  /** Per-query context giving access to the test tables. */
  final case class Ctx(spark: SparkSession, dir: String) {
    def t(name: String): DataFrame = Tables.load(spark, dir, name)

    /** Wide variant for compute-dense consumers (see [[Tables.loadWide]]):
      * re-spreads an under-split input so heavy per-row kernels run at
      * full session width instead of serializing on one scan task.
      * Pass the needed columns when NOT consuming the heavy ones — the
      * re-spread is a pruning barrier, so unnamed columns would ride
      * the shuffle unused. */
    def tw(name: String, cols: String*): DataFrame =
      Tables.loadWide(spark, dir, name, cols)
  }

  /** Lift a Ctx-based query into the driver's (spark, dir) shape. */
  def q(f: Ctx => DataFrame): Q = (s, d) => f(Ctx(s, d))

  /** Per-query numeric metadata stash (e.g. the ANN variants' measured
    * recall@5): queries deposit values as they run; [[graft.Verify]]
    * dumps the map as `query_meta.json` beside `oracle_sql.json`, so a
    * rows-only query's self-gate value is MACHINE-CHECKABLE in the
    * artifact instead of living only in a `require` that did not fire.
    * Same JVM-lifetime contract as `Pca.projectOracleStash`: empty for
    * queries that did not run. */
  object QueryMeta {
    @volatile private var values: Map[String, Map[String, Double]] = Map.empty
    def put(query: String, key: String, value: Double): Unit = synchronized {
      values = values.updated(query,
        values.getOrElse(query, Map.empty).updated(key, value))
    }
    def all: Map[String, Map[String, Double]] = values
  }

  /** Harness-managed scratch directories: query builders create their
    * temp stores/checkpoints through [[Scratch.dir]] instead of bare
    * `Files.createTempDirectory`, and the runner ([[graft.Verify]] /
    * [[graft.Bench]]) sweeps everything registered after the run —
    * without this, every driver/bench invocation leaked one directory
    * per store-backed query (55 sites) into the system temp dir.
    * Sweep timing is safe by construction: the runner materializes
    * each query's frame (parquet dump / count) BEFORE the run-level
    * sweep, so no lazy plan reads a deleted store. */
  object Scratch {
    private val dirs =
      new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
    def dir(prefix: String): String = {
      val p = java.nio.file.Files.createTempDirectory(prefix)
      dirs.add(p)
      p.toString
    }
    /** Delete every registered directory (best-effort, deepest-first). */
    def sweep(): Unit = {
      var p = dirs.poll()
      while (p != null) {
        try {
          import scala.jdk.CollectionConverters._
          val s = java.nio.file.Files.walk(p)
          try s.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala
            .foreach(f => scala.util.Try(java.nio.file.Files.delete(f)))
          finally s.close()
        } catch { case _: java.io.IOException => () }
        p = dirs.poll()
      }
    }
  }

  /** MODEL-DERIVED oracle registry, keyed by query name: queries whose
    * DuckDB oracle embeds run-time-fitted literals (PCA loadings, OPQ
    * rotations, classifier weights) deposit the SQL here as they run;
    * `oracleSql` reads each query's own key afterwards. Keying is the
    * hardening over the old per-model `@volatile var` stashes: a rerun
    * (or a concurrent run of a DIFFERENT model query in the same JVM)
    * can only overwrite its OWN entry, never clobber another query's
    * oracle — the stash a name resolves to is always the one ITS
    * latest run fitted. Absent key → the driver records a weaker
    * rows-only check, same contract as before. */
  object OracleStash {
    private val sqls =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    def put(query: String, sql: String): Unit = sqls.put(query, sql)
    def get(query: String): Option[String] = Option(sqls.get(query))
    /** The named entries present, as oracle-map pairs. */
    def entries(names: String*): Map[String, String] =
      names.flatMap(n => get(n).map(n -> _)).toMap
  }
}
