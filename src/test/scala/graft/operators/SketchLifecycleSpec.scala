package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.write.TableStore

/** The sketch-as-data lifecycle the mergeable sketches exist for:
  * register tables persisted through the lakehouse sink on one day,
  * unioned with later arrivals from another load, merged and estimated
  * — without ever rescanning the first day's raw rows. */
class SketchLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("persisted HLL registers roll up across loads losslessly") {
    val store = new TableStore(Files.createTempDirectory("sk").toString, spark)
    val day1 = (1 to 4000).map(i => ("ev", s"u${i % 1500}")).toDF("g", "v")
    val day2 = (1 to 4000).map(i => ("ev", s"u${(i % 1500) + 800}")).toDF("g", "v")

    // sketch each day's raw rows once; persist ONLY the sketch rows
    store.append("hll_daily",
      Sketches.hllRegisters(day1, Seq("g"), "v", m = 256)
        .withColumn("day", lit(1)))
    store.append("hll_daily",
      Sketches.hllRegisters(day2, Seq("g"), "v", m = 256)
        .withColumn("day", lit(2)))

    // estimate from the persisted sketch table alone
    val merged = Sketches.hllMerge(store.read("hll_daily").drop("day"), Seq("g"))
    val est = Sketches.hllEstimate(merged, Seq("g"), m = 256)
      .select("estimate").as[Double].head()

    // reference: sketch the union of raw rows directly
    val direct = Sketches.hllEstimate(
      Sketches.hllRegisters(day1.unionByName(day2), Seq("g"), "v", m = 256),
      Seq("g"), m = 256).select("estimate").as[Double].head()
    assert(est == direct, s"rollup-from-store $est != direct $direct")

    // and the estimate tracks the true distinct count (2300)
    assert(math.abs(est - 2300) / 2300 < 0.2, s"estimate $est")
  }

  test("persisted CMS counters merge by sum across loads") {
    val store = new TableStore(Files.createTempDirectory("sk").toString, spark)
    val load1 = (1 to 1000).map(i => s"u${i % 20}").toDF("v")
    val load2 = Seq.fill(300)("u7").toDF("v")
    store.append("cms", Sketches.cmsCounters(load1, "v", depth = 4, width = 128))
    store.append("cms", Sketches.cmsCounters(load2, "v", depth = 4, width = 128))
    val merged = store.read("cms").groupBy("j", "idx").agg(sum("cnt").as("cnt"))
    val est = Sketches.cmsEstimate(merged, Seq("u7").toDF("key"),
      depth = 4, width = 128).select("cms_est").as[Long].head()
    assert(est >= 350L, s"u7 appears 50 + 300 times, est $est")
  }
}
