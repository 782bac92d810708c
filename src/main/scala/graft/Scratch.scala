package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness: runs the named query repeatedly and
  * prints per-iteration wall time. Usage:
  *   runMain graft.Scratch <sfDir> <query> [iters]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_RELEASE=1 releases operator pins between iterations —
    // the bench's per-query behavior — so warm iters measure the true
    // fresh-execution cost instead of cache reuse
    val release = sys.env.get("SPARK_GRAFT_RELEASE").contains("1")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      if (release) graft.ext.Dedup.releasePins()
    }
    spark.stop()
  }
}
