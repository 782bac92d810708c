package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization invariants beyond the oracle gate. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, d: Int = 8) = (1 to n).map { i =>
    (i.toLong, Array.tabulate(d)(k =>
      (math.sin(i * 0.9 + k * 0.3) + (if (i % 3 == 0) 1.5 else -0.5)).toFloat))
  }.toDF("id", "v")

  test("codes are in range and reconstruction error is consistent") {
    val df = vecs(120)
    val model = Pq.train(df, "id", "v", m = 4, ksub = 4, iters = 2)
    assert(model.codebooks.length === 4)
    assert(model.codebooks.forall(_.length === 4))
    assert(model.codebooks.forall(_.forall(_.length === 2)))
    val enc = Pq.encode(df, "id", "v", model).collect()
    assert(enc.length === 120)
    enc.foreach { r =>
      val codes = r.getAs[scala.collection.Seq[Int]]("codes")
      assert(codes.length === 4)
      assert(codes.forall(c => c >= 0 && c < 4))
      assert(r.getAs[Double]("recon_err") >= 0.0)
    }
  }

  test("a corpus of exactly ksub distinct vectors reconstructs losslessly") {
    // 4 distinct 4-dim points repeated: after 2 rounds each subspace's
    // centroids land exactly on the points -> recon_err 0 everywhere
    val pts = Seq(
      Array(0f, 0f, 8f, 8f), Array(1f, 1f, 6f, 6f),
      Array(4f, 4f, 2f, 2f), Array(9f, 9f, 0f, 0f))
    val df = (1 to 40).map(i => (i.toLong, pts((i - 1) % 4)))
      .toDF("id", "v")
    val model = Pq.train(df, "id", "v", m = 2, ksub = 4, iters = 3)
    val errs = Pq.encode(df, "id", "v", model)
      .select("recon_err").as[Double].collect()
    assert(errs.forall(_ === 0.0), s"worst=${errs.max}")
  }

  test("training is partition-invariant (decimal-exact means)") {
    val df = vecs(90)
    val m1 = Pq.train(df, "id", "v", m = 2, ksub = 3, iters = 2)
    val m2 = Pq.train(df.repartition(13), "id", "v", m = 2, ksub = 3, iters = 2)
    for (j <- 0 until 2; c <- 0 until 3; i <- 0 until 4)
      assert(m1.codebooks(j)(c)(i) === m2.codebooks(j)(c)(i),
        s"codebook drifted at ($j, $c, $i)")
  }

  test("encode is map-only: no shuffle, no join in the plan") {
    val df = vecs(50)
    val model = Pq.train(df, "id", "v", m = 4, ksub = 4, iters = 1)
    val plan = Pq.encode(df, "id", "v", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
  }

  test("adc top-k ranks the true nearest first on separated clusters") {
    val df = vecs(80)
    val model = Pq.train(df, "id", "v", m = 4, ksub = 4, iters = 2)
    val out = Pq.adcTopK(df, "id", "v", df.filter(col("id") <= 2), model,
      k = 3, shortlist = 10)
    val rows = out.collect()
    assert(rows.length === 6) // 2 queries x k=3
    // exact re-rank: cosine non-increasing within each query
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }
}
