package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MatrixFunctions

/** Distributed PCA / whitening over an embedding column — the
  * preprocessing stage of the embedding pipelines (SemDeDup-style
  * clustering, ANN indexing) that want decorrelated, variance-scaled
  * vectors before distance work.
  *
  * Scale shape (100 TB of vectors, dim d in the hundreds):
  *  - the ONLY distributed pass is the second-moment aggregate
  *    ([[graft.functions.GramMatrixAgg]]): per-partition (n, Σx, ΣxxT)
  *    partials of 1+d+d(d+1)/2 doubles, associative merge, one row
  *    out. No (i, j) explode, no shuffle wider than the partial
  *    buffers.
  *  - the eigen solve is driver-side cyclic Jacobi on the d×d
  *    covariance — microseconds for embedding dims, and d×d is
  *    broadcast-sized by construction (the same boundary the k-means
  *    centroid matrix lives at, [[Clustering]]).
  *  - projection / whitening is a map-only codegen'd
  *    [[graft.functions.MatVecMul]] with the components matrix as one
  *    plan reference object.
  *
  * The oracle-gated covariance query uses [[covariance]] — a
  * decimal-exact declarative formulation (explode + equi-join on the
  * vector id) that DuckDB replays bit-for-bit; [[gram]] is the
  * double-accumulating fast path, spec-compared against it.
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (r×d, orthonormal rows,
    * eigenvalue-descending), `variances` (r, the eigenvalues). */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], variances: Array[Double])

  /** Decimal-exact population covariance entries of the embedding
    * coordinates: (i, j, cov) for 1-based i <= j, cov rounded to 6
    * decimals. Element products are cast DECIMAL(28,12) per row before
    * the sums, so aggregation is order-independent and engine-stable;
    * the final cov arithmetic is a fixed double formula both engines
    * evaluate identically. Quadratic in d per row (the oracle-checkable
    * path — [[gram]] is the one-pass scale path). */
  def covariance(df: DataFrame, id: String, vec: String): DataFrame = {
    // product sums via the ONE-PASS exact-decimal Gram aggregate: no
    // pair explode, no self-join — the shuffle carries per-task partial
    // buffers (d(d+1)/2 decimals), not n·d(d+1)/2 product rows. The
    // per-product CAST(double AS DECIMAL(28,12)) runs through Spark's
    // own Decimal conversion inside the aggregate, so the sums are
    // bit-identical to the declarative `sum(cast(xi*xj as decimal))`
    // the DuckDB oracle replays.
    val spark = df.sparkSession
    val v = Dedup.pin(df.select(col(vec).cast("array<double>").as("_v")))
    val d = v.select(size(col("_v"))).head().getInt(0)
    val flat = v.agg(
      graft.functions.MatrixFunctions.decimalGramAgg(col("_v"), d).as("g"))
    // tiny packed-index → (i, j) map (d(d+1)/2 rows), broadcast
    val idx = for {
      i <- 0 until d; j <- i until d
    } yield (i * d - i * (i - 1) / 2 + (j - i), i + 1, j + 1)
    val idxDf = spark.createDataFrame(idx).toDF("_k", "i", "j")
    val prods = flat
      .select(posexplode(col("g")).as(Seq("_k", "sxx")))
      .join(broadcast(idxDf), Seq("_k"))
    val moms = v
      .select(posexplode(col("_v")).as(Seq("_p", "xv")))
      .select((col("_p") + 1).as("i"), col("xv"))
      .groupBy("i")
      .agg(sum(col("xv").cast("decimal(28,12)")).as("s"),
        count(lit(1)).as("n"))
    val mi = moms.toDF("i", "si", "ni")
    val mj = moms.toDF("j", "sj", "nj")
    prods.join(broadcast(mi), Seq("i")).join(broadcast(mj), Seq("j"))
      .select(col("i"), col("j"),
        // + 0.0 folds IEEE negative zero into 0.0 (repr-identical
        // across engines after rounding)
        (round(col("sxx").cast("double") / col("ni")
          - (col("si").cast("double") / col("ni"))
            * (col("sj").cast("double") / col("nj")), 6) + 0.0).as("cov"))
      .orderBy("i", "j")
  }

  /** One-pass second moments via [[graft.functions.GramMatrixAgg]]:
    * returns (n, mean, covariance d×d) driver-side. */
  def gram(df: DataFrame, vec: String, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val buf = df.agg(MatrixFunctions.gramAgg(col(vec), dim).as("g"))
      .head().getSeq[Double](0).toArray
    val n = buf(0)
    require(n > 0, "pca: empty input")
    val mean = Array.tabulate(dim)(i => buf(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val g = buf(1 + dim + i * dim - i * (i - 1) / 2 + (j - i))
        val c = g / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    (n.toLong, mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues descending, eigenvectors as rows, matched order,
    * canonical sign: largest-|component| positive). Driver-side — a is
    * d×d with d = embedding dim. */
  def eigenSym(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = Array.tabulate(d, d)((i, j) => a(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (offDiag() > 1e-20 && sweep < 100) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = m(k)(p); val akq = m(k)(q)
              m(k)(p) = c * akp - s * akq
              m(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = m(p)(k); val aqk = m(q)(k)
              m(p)(k) = c * apk - s * aqk
              m(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // eigenpairs: value m(i)(i), vector = column i of v; sort desc
    val pairs = (0 until d).map { i =>
      val vec = Array.tabulate(d)(k => v(k)(i))
      // canonical sign: the largest-|component| entry is positive
      var bi = 0
      var k = 1
      while (k < d) { if (math.abs(vec(k)) > math.abs(vec(bi))) bi = k; k += 1 }
      if (vec(bi) < 0) { k = 0; while (k < d) { vec(k) = -vec(k); k += 1 } }
      (m(i)(i), vec)
    }.sortBy(-_._1)
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Above this dimension [[fit]] switches from full Jacobi (O(d³) —
    * microseconds at embedding dims, minutes past a few thousand) to
    * [[eigenSymTop]] subspace iteration (O(d²·(r+overs)) per sweep):
    * the driver solve stays seconds-fast at any practical vector
    * width, since a pipeline wants r ≪ d components anyway. */
  val JacobiDimLimit = 512

  /** Truncated top-`r` eigendecomposition of a symmetric matrix by
    * blocked subspace (orthogonal) iteration with Rayleigh–Ritz
    * extraction (Halko/Martinsson/Tropp 2011, alg. 4.4/5.3 shape;
    * deterministic seeded start so fits are reproducible): repeat
    * Z = A·Q, Q = qr(Z) until the Ritz values stabilize, then solve
    * the (r+overs)² projected problem with the exact [[eigenSym]].
    * O(d²·(r+overs)) per sweep — the r ≪ d driver path that replaces
    * Jacobi's O(d³) above [[JacobiDimLimit]]. Same output contract as
    * [[eigenSym]] truncated to `r`: eigenvalue-descending rows,
    * canonical sign. THROWS if the top-r residuals are still above
    * `tol` after `maxSweeps` sweeps — a best-effort basis is never
    * returned silently (the caller widens maxSweeps/tol knowingly). */
  def eigenSymTop(a: Array[Array[Double]], r: Int, oversample: Int = 8,
      maxSweeps: Int = 200, tol: Double = 1e-10,
      seed: Long = 42L): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    require(r >= 1 && r <= d, "rank must be in [1, d]")
    require(maxSweeps >= 0, s"maxSweeps $maxSweeps must be >= 0")
    val p = math.min(d, r + oversample)
    val rnd = new scala.util.Random(seed)
    // Q: d×p, orthonormal columns
    var q = Array.fill(d, p)(rnd.nextGaussian())
    def mgs(m: Array[Array[Double]]): Array[Array[Double]] = {
      var j = 0
      while (j < p) {
        var norm0 = 0.0
        var i = 0
        while (i < d) { norm0 += m(i)(j) * m(i)(j); i += 1 }
        norm0 = math.sqrt(norm0)
        // two projection passes ("twice is enough"): one MGS pass
        // leaves O(eps·cond) non-orthogonality on near-dependent
        // columns — exactly the rank-deficient case A·Q produces when
        // the data has fewer than p principal directions
        var pass = 0
        while (pass < 2) {
          var k = 0
          while (k < j) {
            var dot = 0.0
            i = 0
            while (i < d) { dot += m(i)(j) * m(i)(k); i += 1 }
            i = 0
            while (i < d) { m(i)(j) -= dot * m(i)(k); i += 1 }
            k += 1
          }
          pass += 1
        }
        var nrm = 0.0
        i = 0
        while (i < d) { nrm += m(i)(j) * m(i)(j); i += 1 }
        nrm = math.sqrt(nrm)
        // a collapsed column (its direction already spanned — the
        // matrix's rank is below p) restarts RANDOM and redoes this j:
        // normalizing the post-projection rounding noise instead would
        // hand back a column far from orthogonal to the basis, and the
        // Ritz values then overshoot the true spectrum
        if (nrm <= 1e-8 * (norm0 + 1e-300)) {
          i = 0
          while (i < d) { m(i)(j) = rnd.nextGaussian(); i += 1 }
        } else {
          i = 0
          while (i < d) { m(i)(j) /= nrm; i += 1 }
          j += 1
        }
      }
      m
    }
    q = mgs(q)
    def mulAQ(qm: Array[Array[Double]]): Array[Array[Double]] = {
      val z = Array.ofDim[Double](d, p)
      var i = 0
      while (i < d) {
        val ai = a(i)
        var j = 0
        while (j < p) {
          var s = 0.0
          var k = 0
          while (k < d) { s += ai(k) * qm(k)(j); k += 1 }
          z(i)(j) = s
          j += 1
        }
        i += 1
      }
      z
    }
    var z = mulAQ(q)
    // per sweep: Rayleigh–Ritz on the p×p projected problem (exact
    // [[eigenSym]], cheap at p = r+overs), then the RESIDUAL test
    // ‖A·v − λ·v‖ per top-r Ritz pair — Ritz VALUES converge
    // quadratically while the vectors lag linearly, so a value-delta
    // stop would hand back unconverged components. A·(Q·w) = Z·w, so
    // residuals cost O(d·p) per pair, nothing extra vs the sweep.
    var sweep = 0
    var lams: Array[Double] = null
    var w: Array[Array[Double]] = null
    var converged = false
    // per-top-r RELATIVE residuals of the current sweep's Ritz pairs —
    // computed once per sweep, driving both the convergence test and
    // (on failure) the reported worst residual
    var rels: Array[Double] = null
    while (!converged && sweep <= maxSweeps) {
      val b = Array.ofDim[Double](p, p)
      var i = 0
      while (i < p) {
        var j = 0
        while (j < p) {
          var s = 0.0
          var k = 0
          while (k < d) { s += q(k)(i) * z(k)(j); k += 1 }
          b(i)(j) = s
          j += 1
        }
        i += 1
      }
      val (bl, bw) = eigenSym(b)
      lams = bl; w = bw
      rels = Array.tabulate(r) { kk =>
        val wk = w(kk)
        var res = 0.0
        var ii = 0
        while (ii < d) {
          var av = 0.0 // (Z·wk)i = (A·v)i
          var vv = 0.0 // (Q·wk)i = vi
          var j = 0
          while (j < p) { av += z(ii)(j) * wk(j); vv += q(ii)(j) * wk(j); j += 1 }
          val e = av - lams(kk) * vv
          res += e * e
          ii += 1
        }
        math.sqrt(res) / math.max(1.0, math.abs(lams(kk)))
      }
      converged = rels.forall(_ <= tol)
      if (!converged && sweep < maxSweeps) {
        q = mgs(z)
        z = mulAQ(q)
      }
      sweep += 1
    }
    // non-convergence is SURFACED, never silently degraded: a
    // best-effort Ritz basis here would flow into every projection
    // downstream (and [[projectOracleSql]]'s model-derived oracle would
    // still hash-match the degraded fit — the self-gates only see it at
    // their own tolerance). Raise with the worst relative residual so
    // the caller can widen maxSweeps/tol deliberately.
    if (!converged)
      throw new IllegalStateException(
        f"eigenSymTop did not converge in $maxSweeps sweeps " +
          f"(worst relative residual ${rels.max}%.3e > tol $tol%.1e); " +
          "raise maxSweeps or loosen tol for this spectrum")
    val comps = Array.tabulate(r) { kk =>
      val wk = w(kk)
      val vec = Array.tabulate(d) { ii =>
        var s = 0.0
        var j = 0
        while (j < p) { s += q(ii)(j) * wk(j); j += 1 }
        s
      }
      var bi = 0
      var k = 1
      while (k < d) { if (math.abs(vec(k)) > math.abs(vec(bi))) bi = k; k += 1 }
      if (vec(bi) < 0) { k = 0; while (k < d) { vec(k) = -vec(k); k += 1 } }
      vec
    }
    (lams.take(r), comps)
  }

  /** Fit a rank-`r` PCA on `vec` (dimension `dim`): one distributed
    * pass + a driver eigensolve — exact Jacobi at embedding dims,
    * [[eigenSymTop]] subspace iteration past [[JacobiDimLimit]] so the
    * driver never pays O(d³). */
  def fit(df: DataFrame, vec: String, dim: Int, r: Int): PcaModel = {
    require(r >= 1 && r <= dim, "rank must be in [1, dim]")
    val (_, mean, cov) = gram(df, vec, dim)
    val (values, vectors) =
      if (dim <= JacobiDimLimit) eigenSym(cov) else eigenSymTop(cov, r)
    PcaModel(mean, vectors.take(r), values.take(r))
  }

  /** DuckDB oracle SQL for the `sim_pca_project` gate query, generated
    * FROM a fitted model's canonical-sign components ([[eigenSym]]
    * pins the sign: largest-|component| entry positive — so the fit is
    * deterministic and the literals below are reproducible run to
    * run). The projection itself is re-derived by DuckDB from the raw
    * parquet embeddings as unrolled matrix-vector products: each dot
    * is the same left-associated index-order sum of
    * `v_k * (x_k − μ_k)` terms that [[graft.functions.MatVecMul]]'s
    * loop accumulates, each `+`/`−`/`×` correctly rounded in both
    * engines → bit-exact before the 4-decimal gate rounding. The
    * self-gate booleans are asserted as literals: the oracle fails the
    * hash compare if the engine-side gates (variance ≡ eigenvalue,
    * orthonormality, sorted spectrum) ever report false.
    *
    * Double literals are emitted via `Double.toString` (shortest
    * round-trip form) — DuckDB's correctly-rounded parse returns the
    * identical bit pattern. */
  def projectOracleSql(model: PcaModel, rOut: Int): String = {
    def lit(d: Double): String = {
      val s = java.lang.Double.toString(d)
      // 1.0E-5 → DuckDB accepts E-notation as-is
      s
    }
    def dot(row: Array[Double]): String =
      row.indices.map { k =>
        s"(${lit(row(k))} * (v[${k + 1}] - ${lit(model.mean(k))}))"
      }.mkString(" + ")
    val pcs = (0 until rOut).map { r =>
      s"  round(${dot(model.components(r))}, 4) + 0.0 AS pc${r + 1}"
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT vec_id,
       |$pcs,
       |  TRUE AS var_matches,
       |  TRUE AS orthonormal_ok,
       |  TRUE AS variance_sorted
       |FROM e ORDER BY vec_id""".stripMargin
  }

  // The dynamically generated [[projectOracleSql]] is deposited through
  // the keyed graft.queries.OracleStash at query run time ([[graft
  // .Verify]] dumps SparkEntry.oracleSql AFTER running the gate
  // queries). Absent entry → rows-only check, the pre-r9 status.

  /** Projection column for `vec` under `model`: y = V (x − μ), an
    * `array<double>` of length r. `whiten = true` scales component i
    * by 1/sqrt(λᵢ) (unit variance; zero-variance components stay
    * unscaled). Map-only, codegen'd, matrix as one reference object. */
  def projection(model: PcaModel, vec: Column, whiten: Boolean = false): Column = {
    val mat =
      if (!whiten) model.components
      else model.components.zip(model.variances).map { case (row, lam) =>
        if (lam > 1e-12) row.map(_ / math.sqrt(lam)) else row.clone()
      }
    MatrixFunctions.matVecMul(vec, mat, model.mean)
  }
}
