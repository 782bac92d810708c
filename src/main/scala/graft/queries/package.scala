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
}
