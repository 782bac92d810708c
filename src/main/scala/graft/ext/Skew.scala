package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffle joins.
  *
  * When one join key dominates (the classic hot-user / hot-document
  * case), a hash-shuffle join lands the whole key on one reducer. AQE's
  * skew-join splits oversized partitions adaptively, but explicit
  * salting is still the right tool when statistics mislead, when the
  * skew is known ahead of time, or when a deterministic layout matters
  * (bench reproducibility).
  */
object Skew {

  /** Salted equi-join: every left row gets a salt in [0, buckets); the
    * right side is replicated buckets×, so one hot key spreads over
    * `buckets` shuffle partitions instead of one. Result equals
    * `left.join(right, keys, joinType)` for inner/left joins with a
    * unique-keyed right side (the replicate-and-match is exact).
    *
    * The salt is derived from `monotonically_increasing_id`, which is
    * deterministic for a fixed input partitioning — reruns produce the
    * same layout. Right side should be the smaller relation (it is
    * replicated `buckets`×).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted join supports inner/left joins, got $joinType")
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
