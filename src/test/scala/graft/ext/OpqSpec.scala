package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OPQ invariants beyond the oracle gate: allocation balance,
  * rotation orthonormality, cosine preservation, and the reason the
  * operator exists — lower quantization error than plain PQ on
  * correlated data. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  /** Strongly correlated corpus: d=8 observed dims driven by 2 latent
    * factors + small deterministic "noise" — the covariance has 2
    * dominant eigenvalues, the regime where plain PQ's contiguous
    * blocks concentrate energy in one subspace. */
  private def correlated(n: Int, d: Int = 8) = (1 to n).map { i =>
    val z1 = math.sin(i * 0.37)
    val z2 = math.cos(i * 0.61)
    (i.toLong, Array.tabulate(d) { k =>
      (z1 * (1.0 + 0.3 * k) + z2 * (2.0 - 0.25 * k) +
        0.05 * math.sin(i * 1.7 + k)).toFloat
    })
  }.toDF("id", "v")

  test("allocate balances bucket sizes and beats the contiguous split") {
    val lams = Array(100.0, 50.0, 10.0, 5.0, 2.0, 1.0, 0.5, 0.1)
    val buckets = Opq.allocate(lams, 2)
    assert(buckets.length === 2)
    assert(buckets.forall(_.length === 4))
    assert(buckets.flatten.sorted.toSeq === (0 until 8))
    val greedy = Opq.logVarianceSpread(lams, buckets)
    val contiguous = Opq.logVarianceSpread(lams,
      Array(Array(0, 1, 2, 3), Array(4, 5, 6, 7)))
    assert(greedy <= contiguous + 1e-12,
      s"greedy spread $greedy must not exceed contiguous $contiguous")
    // deterministic: same input, same allocation
    assert(Opq.allocate(lams, 2).map(_.toSeq).toSeq ===
      buckets.map(_.toSeq).toSeq)
  }

  test("allocate is scale-invariant: sub-unit spectra still balance") {
    // all λ < 1 (unit-normalized embeddings): an uncentered Σ log λ
    // greedy degenerates here — the first bucket's negative sum keeps
    // it the minimum and it swallows the largest eigenvalues
    val lams = Array(0.5, 0.4, 0.3, 0.2)
    val buckets = Opq.allocate(lams, 2)
    assert(buckets.map(_.toSeq).toSeq === Seq(Seq(0, 3), Seq(1, 2)),
      "the balanced pairing (largest with smallest), not contiguous")
    // scaling the whole spectrum cannot change a single decision
    val scaled = Opq.allocate(lams.map(_ * 1e6), 2)
    assert(scaled.map(_.toSeq).toSeq === buckets.map(_.toSeq).toSeq)
    assert(Opq.logVarianceSpread(lams, buckets) <
      Opq.logVarianceSpread(lams, Array(Array(0, 1), Array(2, 3))),
      "strictly beats the contiguous split on this spectrum")
  }

  test("allocate survives zero eigenvalues (rank-deficient spectrum)") {
    val lams = Array(10.0, 1.0, 0.0, 0.0)
    val buckets = Opq.allocate(lams, 2)
    assert(buckets.forall(_.length === 2))
    assert(buckets.flatten.sorted.toSeq === (0 until 4))
  }

  test("trained rotation is orthonormal and preserves cosine") {
    val df = correlated(150)
    val model = Opq.train(df, "id", "v", dim = 8, m = 4, ksub = 4, iters = 2)
    val r = model.rotation
    for (i <- r.indices; j <- r.indices) {
      val dot = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"rotation rows $i,$j not orthonormal: $dot")
    }
    // cosine preservation: rotated pairwise cosine == raw cosine (fp tol)
    val rot = df.select(col("id"),
      Opq.rotated(col("v"), r).as("rv"),
      col("v").cast("array<double>").as("dv"))
    val pairs = rot.as("a").join(rot.as("b"),
        col("a.id") === col("b.id") - 75)
      .select(
        Dedup.cosine(col("a.rv"), col("b.rv")).as("crot"),
        Dedup.cosine(col("a.dv"), col("b.dv")).as("craw"))
      .collect()
    assert(pairs.length === 75)
    pairs.foreach { p =>
      assert(math.abs(p.getDouble(0) - p.getDouble(1)) < 1e-9)
    }
  }

  test("OPQ reconstruction error undercuts plain PQ on correlated data") {
    val df = correlated(200)
    val opq = Opq.train(df, "id", "v", dim = 8, m = 4, ksub = 4, iters = 3)
    val pq = Pq.train(df, "id", "v", m = 4, ksub = 4, iters = 3)
    val rot = df.select(col("id"), Opq.rotated(col("v"), opq.rotation).as("rv"))
    val opqErr = Pq.encode(rot, "id", "rv", opq.pq)
      .agg(avg(col("recon_err"))).head().getDouble(0)
    val pqErr = Pq.encode(df, "id", "v", pq)
      .agg(avg(col("recon_err"))).head().getDouble(0)
    assert(opqErr < pqErr,
      s"OPQ avg recon_err $opqErr must undercut plain PQ $pqErr " +
        "on a 2-latent-factor corpus")
  }

  test("adcTopK returns k ranked matches per query with rotated-space cosine") {
    val df = correlated(120)
    val model = Opq.train(df, "id", "v", dim = 8, m = 4, ksub = 4, iters = 2)
    val out = Opq.adcTopK(df, "id", "v",
      df.filter(col("id") <= 5), model, k = 3, shortlist = 12)
    assert(out.columns.toSeq ===
      Seq("query_id", "rank", "match_id", "cosine"))
    val rows = out.collect()
    assert(rows.length === 15)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === (1L to 5L).toSet)
    byQ.values.foreach { g =>
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L))
      // ranks ordered by descending cosine
      val sorted = g.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
      // no self-matches
      g.foreach(r => assert(
        r.getAs[Long]("match_id") !== r.getAs[Long]("query_id")))
    }
  }
}
