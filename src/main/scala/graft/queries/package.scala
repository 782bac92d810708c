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
      * full session width instead of serializing on one scan task. */
    def tw(name: String): DataFrame = Tables.loadWide(spark, dir, name)
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
}
