package graft.pipeline

import scala.concurrent.duration._

import graft.SparkSpec

/** LimitItem parity (reference items_transform.py:174-239): generator
  * row/time/batch budgets with the reference's edge semantics, plus the
  * Resource-level addLimit(maxRows, maxTime) binding. */
class LimitsSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(sizes: Int*): (Iterator[Seq[Int]], () => Int) = {
    var pulled = 0
    val it = sizes.iterator.map { n => pulled += 1; Seq.fill(n)(1) }
    (it, () => pulled)
  }

  test("row budget: the crossing chunk lands, later chunks are never pulled") {
    val (it, pulled) = chunks(3, 3, 3, 3)
    val out = Limits.bounded(it, maxRows = Some(5L), rowsOf = (c: Seq[Int]) => c.size.toLong).toSeq
    // 3 + 3 crosses the 5-row budget → both land, chunk 3 never requested
    assert(out.map(_.size) === Seq(3, 3))
    assert(pulled() === 2)
  }

  test("maxRows=0 yields nothing and pulls nothing (add_limit(0))") {
    val (it, pulled) = chunks(3, 3)
    assert(Limits.bounded(it, maxRows = Some(0L), rowsOf = (c: Seq[Int]) => c.size.toLong).isEmpty)
    assert(pulled() === 0)
  }

  test("time budget: chunks past the deadline are not pulled") {
    var now = 0L
    val clock = () => now
    var pulled = 0
    // each pull advances the fake clock 40ms; budget 100ms → 3 pulls
    // (checked BEFORE each pull: 0, 40, 80 < 100; 120 stops)
    val it = Iterator.continually { pulled += 1; now += 40L * 1000000L; Seq(1) }
    val out = Limits.bounded(it, maxTime = Some(100.millis),
      rowsOf = (c: Seq[Int]) => c.size.toLong, clock = clock).take(10).toSeq
    assert(out.size === 3 && pulled === 3)
  }

  test("batch-counting mode counts every pulled chunk, empty ones included") {
    val (it, pulled) = chunks(2, 0, 2, 2)
    val out = Limits.bounded(it, maxRows = Some(3L),
      rowsOf = (c: Seq[Int]) => c.size.toLong, countRows = false).toSeq
    // 3 batches admitted (the third crosses the budget), 4th never pulled
    assert(out.map(_.size) === Seq(2, 0, 2))
    assert(pulled() === 3)
  }

  test("boundedUnion assembles admitted DataFrame chunks; empty admission keeps schema") {
    val schema = Seq(1).toDF("v").schema
    val frames = Iterator(Seq(1, 2).toDF("v"), Seq(3, 4).toDF("v"), Seq(5).toDF("v"))
    val out = Limits.boundedUnion(spark, frames, schema, maxRows = Some(3L))
    assert(out.as[Int].collect().sorted.toSeq === Seq(1, 2, 3, 4))
    val none = Limits.boundedUnion(spark, Iterator(Seq(1).toDF("v")), schema,
      maxRows = Some(0L))
    assert(none.schema === schema && none.count() === 0)
  }

  test("Resource.addLimit(maxRows, maxTime): rows limit now, deadline kills late extraction") {
    val df = Seq(1, 2, 3, 4, 5).toDF("v")
    val limited = Resource("r", df).addLimit(maxRows = Some(2), maxTime = None)
    assert(limited.frame.count() === 2)
    // an already-expired deadline: the pipeline loads NOTHING for the
    // resource but still records the table (exhausted-pipe semantics)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lim").toString
    val p = new Pipeline("lim", tmp, spark)
    val expired = Resource("evs", df).addLimit(maxRows = None, maxTime = Some(0.millis))
    Thread.sleep(5)
    p.run(Seq(expired), "1")
    assert(p.store.read("evs").count() === 0)
    // a generous deadline loads normally
    val fresh = Resource("evs2", df).addLimit(maxRows = None, maxTime = Some(10.minutes))
    p.run(Seq(fresh), "2")
    assert(p.store.read("evs2").count() === 5)
  }
}
