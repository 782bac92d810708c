package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names(n) })
    // untimed warmup: JIT/codegen/parquet-footer costs otherwise land
    // entirely on whichever query happens to run first (measured ~5 s
    // of cold-start attributed to one query in round 1/2 benches)
    locally {
      import org.apache.spark.sql.functions._
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      o.groupBy("o_orderstatus").agg(sum("o_totalprice")).queryExecution.toRdd.count()
      o.join(o.select(col("o_orderkey").as("k")), col("o_orderkey") === col("k"))
        .limit(10).queryExecution.toRdd.count()
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output row (count() alone lets
      // Catalyst prune the projections away) without driver transfer
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // The driver captures only a ~2 KB stdout tail: at 118 queries a
    // single JSON line is ~3 KB and truncates mid-map (BENCH_r01/r02
    // "parsed": null). So: per-query detail goes FIRST (and to a file
    // for post-hoc analysis); the LAST stdout line is a tiny total-only
    // JSON (<100 bytes) that no tail window can truncate.
    def f3(v: Double): String = java.math.BigDecimal.valueOf(v)
      .setScale(3, java.math.RoundingMode.HALF_UP).toPlainString
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val full = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(full)
    spark.stop()
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir"}""")
  }
}
