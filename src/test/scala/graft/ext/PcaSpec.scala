package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PCA invariants beyond the oracle gate: the one-pass GramMatrixAgg
  * path agrees with the decimal-exact declarative covariance, the
  * Jacobi solve is a true eigendecomposition, whitening produces unit
  * variances, and everything is partition-invariant up to fp noise. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic correlated 2-blob data in 6 dims
  private def vecs(n: Int, d: Int = 6) = (1 to n).map { i =>
    val base = if (i % 2 == 0) 1.0 else -1.0
    (i.toLong, Array.tabulate(d)(k =>
      (base * (k + 1) * 0.3 + math.sin(i * 0.7 + k) * 0.1).toFloat))
  }.toDF("id", "v")

  test("gram-agg covariance matches the declarative decimal path") {
    val df = vecs(400)
    val (_, _, cov) = Pca.gram(df, "v", dim = 6)
    val decl = Pca.covariance(df, "id", "v")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    for (i <- 0 until 6; j <- i until 6) {
      assert(math.abs(cov(i)(j) - decl((i + 1, j + 1))) < 1e-5,
        s"cov($i,$j): agg=${cov(i)(j)} decl=${decl((i + 1, j + 1))}")
    }
  }

  test("gram-agg merge: result invariant to input partitioning") {
    val df = vecs(300)
    val (n1, m1, c1) = Pca.gram(df, "v", dim = 6)
    val (n2, m2, c2) = Pca.gram(df.repartition(13), "v", dim = 6)
    assert(n1 == n2)
    for (i <- 0 until 6) assert(math.abs(m1(i) - m2(i)) < 1e-9)
    for (i <- 0 until 6; j <- 0 until 6)
      assert(math.abs(c1(i)(j) - c2(i)(j)) < 1e-9)
  }

  test("decimal gram agg equals a pure-BigDecimal reference (fast path exactness)") {
    // adversarial magnitudes: tiny, ~1, large (still < 10 product),
    // negative — exercises both the long fast path and the guard band
    val data = (1 to 300).map { i =>
      (i.toLong, Array.tabulate(4)(k =>
        (math.sin(i * 1.3 + k) * math.pow(10.0, (i + k) % 4 - 2)).toFloat))
    }
    val df = data.toDF("id", "v")
    val got = Pca.covariance(df, "id", "v")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // reference: exact BigDecimal sums of CAST(xi*xj AS DECIMAL(28,12))
    val d = 4
    val sums = Array.fill(d, d)(java.math.BigDecimal.ZERO)
    val mSums = Array.fill(d)(java.math.BigDecimal.ZERO)
    data.foreach { case (_, arr) =>
      val xs = arr.map(_.toDouble)
      for (i <- 0 until d) {
        mSums(i) = mSums(i).add(java.math.BigDecimal.valueOf(xs(i))
          .setScale(12, java.math.RoundingMode.HALF_UP))
        for (j <- i until d)
          sums(i)(j) = sums(i)(j).add(java.math.BigDecimal.valueOf(xs(i) * xs(j))
            .setScale(12, java.math.RoundingMode.HALF_UP))
      }
    }
    val n = data.size.toDouble
    for (i <- 0 until d; j <- i until d) {
      val expect = BigDecimal(
        sums(i)(j)).toDouble / n -
        (BigDecimal(mSums(i)).toDouble / n) * (BigDecimal(mSums(j)).toDouble / n)
      val rounded = BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
      assert(got((i + 1, j + 1)) == rounded,
        s"($i,$j): got ${got((i + 1, j + 1))}, expect $rounded")
    }
  }

  test("jacobi: A v = lambda v, orthonormal vectors, descending values") {
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.2, 0.1),
      Array(0.5, 0.2, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (values, vectors) = Pca.eigenSym(a)
    assert(values.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    for (e <- values.indices) {
      val v = vectors(e)
      // residual ||A v - lambda v||
      for (i <- a.indices) {
        val av = a(i).indices.map(j => a(i)(j) * v(j)).sum
        assert(math.abs(av - values(e) * v(i)) < 1e-9,
          s"eigen residual at ($e, $i)")
      }
    }
    for (e1 <- vectors.indices; e2 <- vectors.indices) {
      val dot = vectors(e1).zip(vectors(e2)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (e1 == e2) 1.0 else 0.0)) < 1e-9)
    }
    // trace preserved
    assert(math.abs(values.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-9)
  }

  test("projection variances equal eigenvalues; whitening gives unit variance") {
    val df = vecs(500)
    val model = Pca.fit(df, "v", dim = 6, r = 3)
    def componentVars(whiten: Boolean): Map[Int, Double] =
      df.select(posexplode(Pca.projection(model, col("v"), whiten))
          .as(Seq("k", "y")))
        .groupBy("k")
        .agg((avg(col("y") * col("y")) - avg("y") * avg("y")).as("variance"))
        .as[(Int, Double)].collect().toMap
    val raw = componentVars(whiten = false)
    for (k <- 0 until 3)
      assert(math.abs(raw(k) - model.variances(k))
        <= 1e-8 * math.max(1.0, model.variances(k)), s"var pc$k")
    val white = componentVars(whiten = true)
    for (k <- 0 until 3)
      assert(math.abs(white(k) - 1.0) < 1e-6, s"whitened var pc$k = ${white(k)}")
  }

  test("subspace iteration recovers a planted spectrum at d=2048 in seconds") {
    // A = 9·uuᵀ + 4·wwᵀ + 1·I with orthonormal planted u, w: exact top
    // eigenpairs (10, u), (5, w), bulk at 1 — analytic ground truth
    // without an O(d³) reference solve
    val d = 2048
    val u = Array.tabulate(d)(i => math.sin(0.37 * i + 1))
    val un = math.sqrt(u.map(x => x * x).sum)
    for (i <- 0 until d) u(i) /= un
    val w0 = Array.tabulate(d)(i => math.cos(0.53 * i))
    val uw = u.zip(w0).map { case (a, b) => a * b }.sum
    val w = w0.zip(u).map { case (b, a) => b - uw * a }
    val wn = math.sqrt(w.map(x => x * x).sum)
    for (i <- 0 until d) w(i) /= wn
    val a = Array.tabulate(d, d)((i, j) =>
      9.0 * u(i) * u(j) + 4.0 * w(i) * w(j) + (if (i == j) 1.0 else 0.0))
    val t0 = System.nanoTime()
    val (lams, vecs) = Pca.eigenSymTop(a, r = 2)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"d=2048 rank-2 solve took $secs s — the large-dim" +
      " path must stay far below Jacobi's O(d^3)")
    assert(math.abs(lams(0) - 10.0) < 1e-8 && math.abs(lams(1) - 5.0) < 1e-8,
      s"planted eigenvalues, got ${lams.toSeq}")
    def absDot(x: Array[Double], y: Array[Double]): Double =
      math.abs(x.zip(y).map { case (p, q) => p * q }.sum)
    assert(absDot(vecs(0), u) > 1 - 1e-8, "first component aligns with u")
    assert(absDot(vecs(1), w) > 1 - 1e-8, "second component aligns with w")
    // contract parity with eigenSym: orthonormal, canonical sign
    assert(math.abs(absDot(vecs(0), vecs(0)) - 1.0) < 1e-9)
    assert(absDot(vecs(0), vecs(1)) < 1e-8)
  }

  test("eigenSymTop surfaces non-convergence instead of a best-effort basis") {
    // a generic spectrum a random start basis cannot resolve in zero
    // refinement sweeps: with maxSweeps = 0 the residual test must fail
    // and the solver must RAISE, never hand back the unconverged Ritz
    // pairs silently
    val d = 64
    val a = Array.tabulate(d, d)((i, j) =>
      if (i == j) 1.0 + 0.5 * i else 0.0)
    val e = intercept[IllegalStateException] {
      Pca.eigenSymTop(a, r = 2, maxSweeps = 0)
    }
    assert(e.getMessage.contains("did not converge"))
    assert(e.getMessage.contains("residual"))
    // a negative budget is a caller bug: rejected up front, never an NPE
    val neg = intercept[IllegalArgumentException] {
      Pca.eigenSymTop(a, r = 2, maxSweeps = -1)
    }
    assert(neg.getMessage.contains("maxSweeps"))
    // the same problem converges with the default budget
    val (lams, _) = Pca.eigenSymTop(a, r = 2)
    assert(math.abs(lams(0) - (1.0 + 0.5 * (d - 1))) < 1e-8)
  }

  test("fit past JacobiDimLimit yields true eigenpairs of the gram covariance") {
    val d = 600 // > JacobiDimLimit: exercises the subspace-iteration switch
    assert(d > Pca.JacobiDimLimit)
    val df = (1 to 80).map { i =>
      (i.toLong, Array.tabulate(d)(k =>
        (math.sin(i * 0.7 + k * 0.13) + (if (i % 2 == 0) 0.5 else -0.5)
          * math.cos(k * 0.05)).toFloat))
    }.toDF("id", "v")
    val model = Pca.fit(df, "v", dim = d, r = 3)
    assert(model.variances.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // eigenpair residual against the same covariance fit() solved:
    // ||C v − λ v|| small relative to λ
    val (_, _, cov) = Pca.gram(df, "v", d)
    for (k <- 0 until 3) {
      val v = model.components(k)
      val lam = model.variances(k)
      var worst = 0.0
      for (i <- 0 until d) {
        var av = 0.0
        for (j <- 0 until d) av += cov(i)(j) * v(j)
        worst = math.max(worst, math.abs(av - lam * v(i)))
      }
      assert(worst < 1e-8 * math.max(1.0, lam),
        s"component $k residual $worst (lambda=$lam)")
    }
  }

  test("top component separates the two blobs") {
    val df = vecs(200)
    val model = Pca.fit(df, "v", dim = 6, r = 1)
    val signs = df.select(col("id"),
        element_at(Pca.projection(model, col("v")), 1).as("pc1"))
      .as[(Long, Double)].collect()
    val even = signs.filter(_._1 % 2 == 0).map(_._2)
    val odd = signs.filter(_._1 % 2 == 1).map(_._2)
    // the blobs land on opposite sides of the first component
    assert(even.forall(_ > 0) != even.forall(_ < 0) || even.nonEmpty)
    assert(math.signum(even.sum) != math.signum(odd.sum))
  }
}
