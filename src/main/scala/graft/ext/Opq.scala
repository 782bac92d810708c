package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MatrixFunctions

/** Optimized Product Quantization, parametric solution (Ge/He/Ke/Sun
  * 2013, "Optimized Product Quantization for Approximate Nearest
  * Neighbor Search", CVPR — the eigenvalue-allocation variant): learn
  * an ORTHOGONAL rotation R that decorrelates the data and balances
  * variance across the m PQ subspaces, then run plain [[Pq]] in the
  * rotated space. Plain PQ quantizes whatever coordinate blocks the
  * input happens to arrive in; when dimensions are correlated or
  * variance is concentrated (embeddings after PCA-ish training
  * pipelines: always), some subspaces carry most of the energy and
  * their ksub centroids saturate. The parametric fix assumes a
  * Gaussian spectrum: rotate into the PCA eigenbasis (decorrelates),
  * then PERMUTE eigencoordinates into buckets balancing the product of
  * eigenvalues per bucket (greedy on Σ log λ — Ge et al. §4.2), so
  * every subspace quantizes a comparable information load.
  *
  * Cosine search stays exact under the rotation: R is orthogonal, so
  * ⟨Rx, Ry⟩ = ⟨x, y⟩ and norms are preserved — probes, ADC
  * reconstructions and the exact re-rank all run IN ROTATED SPACE and
  * rank identically to the unrotated cosine (bit-level: both engines
  * replay the identical rotated computation, so the oracle gate is a
  * hash gate, not a tolerance gate; the rotated cosine agrees with the
  * unrotated one to fp error, which the 6-decimal rounding absorbs).
  *
  * Scale shape — identical to [[Pq]] by construction:
  *  - FIT: one [[Pca.gram]] pass (distributed) + a driver 64×64 Jacobi
  *    eigensolve + the greedy allocation (driver, O(d·m)); the rotation
  *    rides every later plan as a broadcast-literal matrix.
  *  - ROTATE: map-only codegen matvec ([[graft.functions.MatVecMul]] —
  *    the [[Pca.projection]] kernel with a zero center), fused into the
  *    same stage as the encode argmin.
  *  - TRAIN/ENCODE/ADC: exactly [[Pq]] over the rotated column.
  *
  * Reference anchor: the reference has no ANN engine of its own — this
  * extends the training-data plane the same way [[Pq]]/[[Quantize]] do,
  * from the published algorithm only. */
object Opq {

  /** Fitted model: `rotation(i)` = the eigenvector feeding rotated
    * coordinate i (bucket-major: subspace j owns rows [j·dsub,
    * (j+1)·dsub)); `spectrum(i)` = its eigenvalue (per-bucket
    * non-increasing, the greedy assignment order); `pq` = the codebooks
    * trained in rotated space. */
  final case class OpqModel(rotation: Array[Array[Double]],
      spectrum: Array[Double], pq: Pq.PqModel)

  /** Greedy eigenvalue allocation (Ge et al. §4.2): eigenvalues arrive
    * sorted non-increasing ([[Pca.fit]]'s contract); each is assigned
    * to the non-full bucket with the smallest running Σ of
    * GEOMEAN-CENTERED logs (first-minimum = lowest bucket index on
    * ties — deterministic). The centering makes the greedy
    * SCALE-INVARIANT: on a raw Σ log λ, an all-sub-unit spectrum
    * (unit-normalized embeddings — λ < 1 everywhere, logs all
    * negative) makes whichever bucket received an item the running
    * minimum, so it absorbs the largest eigenvalues until full and the
    * allocation degenerates to the contiguous split OPQ exists to
    * beat. Centered logs depend only on eigenvalue RATIOS — scaling
    * every λ by a constant cannot change a single decision — and the
    * COMPLETED buckets' spread objective is shift-invariant (every
    * full bucket shifts by dsub·mean). Returns the eigen indexes per
    * bucket in assignment order. λ clamps at 1e-12 before the log: a
    * numerically-zero eigenvalue must not produce −∞ and pin its
    * bucket open forever. */
  def allocate(lams: Array[Double], m: Int): Array[Array[Int]] = {
    require(m >= 1 && lams.length % m == 0,
      s"dim ${lams.length} must split into $m even subspaces")
    val dsub = lams.length / m
    val logs = lams.map(l => math.log(math.max(l, 1e-12)))
    val shift = logs.sum / logs.length
    val buckets = Array.fill(m)(Vector.empty[Int])
    val logSum = new Array[Double](m)
    for (i <- lams.indices) {
      val open = (0 until m).filter(buckets(_).size < dsub)
      val b = open.minBy(logSum(_))
      buckets(b) = buckets(b) :+ i
      logSum(b) += logs(i) - shift
    }
    buckets.map(_.toArray)
  }

  /** max−min spread of per-bucket Σ log λ for a given allocation —
    * the greedy objective, exposed so gates can assert the allocation
    * beats the naive contiguous split. */
  def logVarianceSpread(lams: Array[Double], buckets: Array[Array[Int]]): Double = {
    val sums = buckets.map(_.map(i => math.log(math.max(lams(i), 1e-12))).sum)
    sums.max - sums.min
  }

  /** The self-gate triple both OPQ gate queries assert (and the oracle
    * pins as literal TRUEs): rotation orthonormality (max |R·Rᵀ − I| <
    * 1e-8, driver O(d³)), greedy allocation at least as balanced as the
    * naive contiguous eigen split, per-bucket spectrum non-increasing
    * (the greedy assignment order). ONE implementation — the fresh-fit
    * and store-read-back gates must never drift apart. */
  def selfGates(rotation: Array[Array[Double]], spectrum: Array[Double],
      m: Int): (Boolean, Boolean, Boolean) = {
    val d = rotation.length
    var worst = 0.0
    for (i <- 0 until d; j <- i until d) {
      var s = 0.0
      var kk = 0
      while (kk < d) { s += rotation(i)(kk) * rotation(j)(kk); kk += 1 }
      worst = math.max(worst, math.abs(s - (if (i == j) 1.0 else 0.0)))
    }
    val dsub = d / m
    val blockIdx = Array.tabulate(m)(j =>
      Array.range(j * dsub, (j + 1) * dsub))
    val balanced = logVarianceSpread(spectrum, blockIdx) <=
      logVarianceSpread(spectrum.sorted(Ordering[Double].reverse),
        blockIdx) + 1e-9
    val sorted = blockIdx.forall(b => b.map(spectrum).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)))
    (worst < 1e-8, balanced, sorted)
  }

  /** The rotated vector R·x as a map-only codegen column (zero center:
    * OPQ must NOT mean-shift — a shift breaks cosine preservation;
    * x−0.0 ≡ x bitwise, so the shared [[graft.functions.MatVecMul]]
    * kernel emits the exact `Σ wᵢ·xᵢ` chain the oracle unrolls). */
  def rotated(vec: Column, rotation: Array[Array[Double]]): Column =
    MatrixFunctions.matVecMul(vec, rotation,
      new Array[Double](if (rotation.isEmpty) 0 else rotation(0).length))

  /** Fit rotation + codebooks: one [[Pca.gram]] pass for the
    * covariance, a FULL eigendecomposition (exact Jacobi —
    * [[Pca.eigenSym]] directly, NOT [[Pca.fit]]: fit's r = dim request
    * would route dims past [[Pca.JacobiDimLimit]] into the top-r
    * subspace iteration, which at full rank costs MORE than Jacobi and
    * can throw on the degenerate near-zero tail of a rank-deficient
    * covariance — OPQ needs the whole basis, so the O(d³) driver
    * solve is the honest price at any dim), greedy eigenvalue
    * allocation, then [[Pq.train]] on the rotated corpus (same
    * init/tie-break/decimal-mean contract, so the oracle re-derives
    * every code from the rotation literals alone). */
  def train(vecs: DataFrame, id: String, vec: String, dim: Int,
      m: Int, ksub: Int, iters: Int): OpqModel = {
    val (_, _, cov) = Pca.gram(vecs, vec, dim)
    val (values, vectors) = Pca.eigenSym(cov)
    val alloc = allocate(values, m)
    val order = alloc.flatten
    val rotation = order.map(vectors(_))
    val spectrum = order.map(values(_))
    val rot = vecs.select(col(id),
      rotated(col(vec), rotation).as("__rv"))
    OpqModel(rotation, spectrum,
      Pq.train(rot, id, "__rv", m, ksub, iters))
  }

  /** ADC top-k in rotated space: rotate corpus + queries (map-only),
    * encode the corpus under the rotated codebooks, shortlist on
    * code-reconstruction cosine, exact re-rank on the rotated
    * full-precision vectors — the shared [[Quantize.shortlistRerank]]
    * tail, so tie-breaks match the proven oracle shape. Output cosine
    * is the rotated-space value (≡ the unrotated cosine up to fp,
    * inside the 6-decimal rounding). */
  def adcTopK(vecs: DataFrame, id: String, vec: String,
      queries: DataFrame, model: OpqModel, k: Int,
      shortlist: Int): DataFrame = {
    // rotate, then DELEGATE — the oracle-shape-critical chain (encode →
    // reconstruction → inequality join → shortlist/re-rank tie-breaks)
    // has ONE implementation, [[Pq.adcTopK]]; a second copy here would
    // have to track every future tie-break change in lock-step
    val rotC = Dedup.pin(vecs.select(col(id),
      rotated(col(vec), model.rotation).as("__rv")))
    val rotQ = queries.select(col(id),
      rotated(col(vec), model.rotation).as("__rv"))
    Pq.adcTopK(rotC, id, "__rv", rotQ, model.pq, k, shortlist)
  }

  // ---- oracle ------------------------------------------------------------

  // Model-derived oracles are deposited through the KEYED
  // graft.queries.OracleStash (one entry per query name — a rerun can
  // only overwrite its own entry); [[graft.Verify]] dumps oracles after
  // the gate queries ran, so the rotation-literal SQL is populated by
  // dump time.

  /** DuckDB re-derivation of the WHOLE chain from the rotation
    * literals: rotate (unrolled left-associated `Σ wᵢ·v[i]` per
    * coordinate — the exact [[graft.functions.MatVecMul]] loop order,
    * each op correctly rounded in both engines → bit-exact rotated
    * vectors), per-subspace k-means over the rotated slices (shared
    * [[Clustering.stagesSql]] with `from = rot`), codebook-concat
    * reconstruction, ADC shortlist, exact re-rank — the [[Pq]] oracle
    * shape in rotated space. Self-gate booleans are asserted as
    * literal TRUEs: a false engine-side gate fails the hash. Double
    * literals via `Double.toString` (shortest round-trip — DuckDB's
    * correctly-rounded parse restores the identical bits). */
  def adcOracleSql(model: OpqModel, ksub: Int, iters: Int,
      k: Int, shortlist: Int, maxQueryId: Int): String =
    adcOracleSqlOver(model, ksub, iters, k, shortlist, maxQueryId,
      corpusWhere = "TRUE",
      tailCols = Seq("TRUE AS orthonormal_ok",
        "TRUE AS allocation_beats_contiguous",
        "TRUE AS buckets_nonincreasing"))

  /** [[adcOracleSql]] with a corpus predicate and caller-chosen literal
    * tail columns — the OPQ generation-probe gate replays the SAME
    * chain (rotation literals, per-subspace trainings, codes, ADC
    * shortlist, exact re-rank) over the SUBSET the pinned historical
    * model was trained on, mirroring [[Pq.adcOracleSqlOver]]. Queries
    * and the re-rank corpus restrict too: a generation probe sees only
    * that generation's pinned corpus. */
  def adcOracleSqlOver(model: OpqModel, ksub: Int, iters: Int,
      k: Int, shortlist: Int, maxQueryId: Int, corpusWhere: String,
      tailCols: Seq[String]): String = {
    val m = model.pq.m
    val dsub = model.pq.dsub
    def dlit(d: Double): String = java.lang.Double.toString(d)
    def dot(row: Array[Double]): String =
      row.indices.map(i => s"(${dlit(row(i))} * v[${i + 1}])")
        .mkString(" + ")
    val coords = model.rotation.map(dot).mkString(",\n    ")
    val stages = (0 until m).map { j =>
      Clustering.stagesSql(ksub, iters, ns = s"o${j}_",
        vecExpr = s"rv[${j * dsub + 1}:${(j + 1) * dsub}]",
        dim = dsub, from = "rot")
    }.mkString(",\n")
    val joins = (0 until m).map(j =>
      s"JOIN o${j}_a${iters + 1} s$j USING (vec_id)").mkString("\n  ")
    val recon = (0 until m).map(j => s"sc$j.c").mkString(" || ")
    val reconJoins = (0 until m).map(j =>
      s"JOIN o${j}_c$iters sc$j ON sc$j.cl = s$j.cl").mkString("\n  ")
    // rot/deq are MATERIALIZED like the [[Clustering.stagesSql]] stages:
    // rot is referenced by every subspace training chain plus deq/
    // approx/exact — inlined, DuckDB re-runs the unrolled d×d matvec
    // (4096 fp ops/row at dim 64) once per reference
    s"""WITH rot AS MATERIALIZED (
       |  SELECT vec_id, [
       |    $coords] AS rv
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |        WHERE $corpusWhere)),
       |$stages,
       |deq AS MATERIALIZED (
       |  SELECT vec_id, $recon AS deq
       |  FROM (SELECT DISTINCT vec_id FROM rot) vv
       |  $joins
       |  $reconJoins),
       |approx AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
       |    list_cosine_similarity(q.rv, c.deq) AS adc
       |  FROM rot q JOIN deq c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $maxQueryId),
       |short AS (
       |  SELECT query_id, match_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY adc DESC, match_id) AS ar
       |  FROM approx),
       |exact AS (
       |  SELECT s.query_id, s.match_id,
       |    list_cosine_similarity(q.rv, c.rv) AS cs
       |  FROM short s
       |  JOIN rot q ON q.vec_id = s.query_id
       |  JOIN rot c ON c.vec_id = s.match_id
       |  WHERE s.ar <= $shortlist)
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id
       |                     ORDER BY cs DESC, match_id) AS rank,
       |  match_id, round(cs, 6) AS cosine,
       |  ${tailCols.mkString(",\n  ")}
       |FROM exact
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }
}
