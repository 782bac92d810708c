package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Epoch-shuffle invariants beyond the oracle gate: exact permutation,
  * determinism, epoch independence, curriculum stage-majority, and the
  * scale guard — the per-row rank window must be partitioned by the
  * hash bucket, never a corpus-wide single-partition window. */
class TrainingOrderSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (1 to n).map(i =>
    (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    .toDF("id", "stage")

  test("ranks form an exact 0..n-1 permutation, stable across evaluations") {
    val df = docs(500)
    val out = TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 1)
    val ranks = out.select("shuffle_rank").as[Long].collect().sorted
    assert(ranks.toSeq === (0L until 500L))
    val again = TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 1)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val first = out.select("id", "shuffle_rank").as[(Long, Long)]
      .collect().toMap
    assert(first === again, "same (seed, epoch) must reproduce every rank")
  }

  test("different epochs produce substantially different permutations") {
    val df = docs(400)
    val e1 = TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 1)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val e2 = TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 2)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val same = e1.count { case (id, r) => e2(id) == r }
    assert(same < 10, s"epochs must decorrelate: $same/400 fixed points")
  }

  test("stages impose curriculum order: stage-major, shuffled within") {
    val df = docs(300)
    val out = TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 1,
      stages = Seq("stage"))
      .select("stage", "shuffle_rank").as[(String, Long)].collect()
    val byStage = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // every 'a' rank below every 'b' rank below every 'c' rank
    assert(byStage("a").max < byStage("b").min)
    assert(byStage("b").max < byStage("c").min)
    // and the whole thing is still a permutation
    assert(out.map(_._2).sorted.toSeq === (0L until 300L))
  }

  test("null stage rows survive (null-safe join) and rank first") {
    val df = (1 to 90).map(i =>
      (i.toLong, if (i % 3 == 0) null else if (i % 3 == 1) "a" else "b"))
      .toDF("id", "stage")
    val out = TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 1,
      stages = Seq("stage"))
      .select("stage", "shuffle_rank").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
    assert(out.length === 90, "null-stage rows must not vanish in the join")
    assert(out.map(_._2).sorted.toSeq === (0L until 90L))
    val byStage = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // Spark's null-first window order: the null stage IS a stage,
    // ranked before every named one
    assert(byStage(None).max < byStage(Some("a")).min)
    assert(byStage(Some("a")).max < byStage(Some("b")).min)
  }

  test("a null id fails loudly — silent same-hash ties would break determinism") {
    val df = Seq((Some(1L), "a"), (None: Option[Long], "a"))
      .toDF("id", "stage")
    val e = intercept[Exception] {
      TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 1).collect()
    }
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("ranks are bucket-width invariant: widths 1, 2, 3 agree exactly") {
    // the bucket is a PREFIX of the order hash, so any width must yield
    // the identical global rank — widening the default for scale can
    // never move a rank (the 100 TB parallelism dial is semantics-free)
    val df = docs(300)
    val byWidth = Seq(1, 2, 3).map { w =>
      TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 1,
        stages = Seq("stage"), bucketChars = w)
        .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    }
    assert(byWidth(0) === byWidth(1), "width 1 vs 2 rank drift")
    assert(byWidth(1) === byWidth(2), "width 2 vs 3 rank drift")
  }

  test("auto width scales with the input's size estimate, clamped to [2, 5]") {
    assert(TrainingOrder.autoWidth(docs(100)) === 2,
      "a tiny frame must take the 256-bucket floor")
    // the formula itself, against the documented thresholds: 4 GiB per
    // bucket target → width w covers 16^w × 4 GiB
    def widthFor(bytes: BigInt): Int =
      (2 to 5).find(w => BigInt(16).pow(w) * BigInt(4L << 30) >= bytes)
        .getOrElse(5)
    assert(widthFor(BigInt(1L) << 40) === 2)          //   1 TiB → 256
    assert(widthFor(BigInt(100L) * BigInt(1L << 40)) === 4) // 100 TiB → 65,536
    assert(widthFor(BigInt(1L) << 60) === 5)          //   1 EiB → cap
  }

  test("the per-row rank window is bucket-partitioned, never corpus-wide") {
    val df = docs(100)
    val plan = TrainingOrder.epochShuffle(df, "id", seed = 7L, epoch = 1)
      .queryExecution.executedPlan.toString()
    val rowNumberWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number"))
      .toSeq
    assert(rowNumberWindows.nonEmpty, s"expected a row_number window in:\n$plan")
    rowNumberWindows.foreach(l =>
      assert(l.contains("__bucket"),
        s"row_number window must partition by __bucket:\n$l"))
  }
}
