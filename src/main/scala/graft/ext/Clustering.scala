package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions

/** Distributed Lloyd's k-means (Lloyd 1982, "Least squares quantization
  * in PCM") over an embedding column — the clustering stage of
  * SemDeDup-style semantic dedup (Abbas et al. 2023) and of topic
  * balancing, hand-rolled so an external SQL engine can re-derive every
  * iteration exactly (the spark.ml KMeans in [[Similarity.ivfTrain]]
  * stays for IVF, where centroid provenance doesn't matter; here the
  * assignment IS the output).
  *
  * 100 TB shape, per iteration:
  *  - assignment is a MAP-ONLY pass: the k centroids ride the plan as
  *    broadcast literals inside a native codegen argmin (one
  *    [[graft.functions.SqDist]] per centroid in an array column) — no
  *    join, no shuffle, no per-row allocation beyond the k-element
  *    array;
  *  - the update is one posexplode + hash aggregate with map-side
  *    combine: the shuffle carries partitions × k × dim partial rows,
  *    not the corpus; the driver sync per iteration is k × dim doubles
  *    (the algorithm's inherent sequential dependency).
  *
  * Cross-engine determinism (the oracle re-derives, not approximates):
  *  - init = the k lowest-id vectors (deterministic, no RNG);
  *  - ties in the argmin break to the lowest cluster index on both
  *    sides (array_position finds the FIRST minimum; the oracle orders
  *    by (distance, cl));
  *  - centroid means: components are cast DECIMAL(28,12) pre-sum so the
  *    distributed sum is order-independent and exact, then the exact
  *    decimal is cast to double and divided by the member count — both
  *    engines perform the same two correctly-rounded operations;
  *  - an empty cluster keeps its previous centroid on both sides. */
object Clustering {

  /** Final (id, cluster, dist) assignment after `iters` Lloyd rounds
    * with k = `k`; `dist` is the euclidean distance to the winning
    * centroid rounded to 6 places. */
  def lloydAssign(vecs: DataFrame, id: String, vec: String,
      k: Int, iters: Int): DataFrame = {
    val assigned = lloydAssignRaw(vecs, id, vec, k, iters)
    assigned.select(col("__id").as(id), col("__cl").as("cluster"),
      round(sqrt(col("__d")), 6).as("dist"))
      .orderBy(id)
  }

  /** [[lloydAssign]] before the presentation projection: (__id, __e,
    * __cl, __d) with __d the SQUARED distance — for composition
    * ([[Dedup.semanticPairs]] needs the vector and the cluster). */
  private[ext] def lloydAssignRaw(vecs: DataFrame, id: String, vec: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 1, "k and iters must be positive")
    val v = Dedup.pin(
      vecs.select(col(id).as("__id"), col(vec).cast("array<double>").as("__e")))

    // init: the k lowest-id vectors (driver-small: k rows); fewer than
    // k distinct vectors just lowers the effective k
    var centroids: Array[Array[Double]] =
      v.orderBy("__id").limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "k-means needs a non-empty vector input")

    for (_ <- 1 to iters) {
      val stats = assign(v, centroids)
        .select(col("__cl"), posexplode(col("__e")).as(Seq("__i", "__x")))
        .groupBy("__cl", "__i")
        .agg(sum(col("__x").cast(DecimalType(28, 12))).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        // exact decimal → double, then one double division: both
        // correctly rounded, so the oracle's (sum::DOUBLE)/count matches
        next(r.getInt(0))(r.getInt(1)) =
          r.getDecimal(2).doubleValue / r.getLong(3)
      }
      centroids = next
    }
    assign(v, centroids)
  }

  /** Above this k the assignment switches from the k-wide literal
    * expression array to [[graft.functions.CentroidArgMin]]: one
    * reference-object matrix + a codegen'd two-level loop, so plan size
    * and closure size stay constant in k. Below it the literal array
    * stays — identical results (same strict-< first-minimum
    * tie-break), and for small k a k-element array column per row is
    * cheap while the unrolled SqDist subtrees JIT slightly tighter. At
    * SemDeDup-scale k (10⁴–10⁵ clusters) only the matrix path is
    * viable: k literal subtrees would blow both codegen and the task
    * closure. */
  private[ext] val LiteralKMax = 64

  /** Map-only argmin assignment: adds __cl (winning cluster, first
    * minimum wins ties) and __d (squared distance to it).
    * `forceMatrix` is a spec hook to exercise the large-k path below
    * the threshold (results must be identical either way). */
  private[ext] def assign(v: DataFrame, centroids: Array[Array[Double]],
      forceMatrix: Boolean = false): DataFrame =
    if (centroids.length <= LiteralKMax && !forceMatrix) {
      val ds: Column = array(centroids.toIndexedSeq.map(c =>
        VectorFunctions.sqDist(col("__e"), typedLit(c.toSeq))): _*)
      v.withColumn("__ds", ds)
        .withColumn("__d", array_min(col("__ds")))
        .withColumn("__cl",
          (array_position(col("__ds"), col("__d")) - 1).cast("int"))
        .drop("__ds")
    } else {
      v.withColumn("__am", VectorFunctions.centroidArgMin(col("__e"), centroids))
        .withColumn("__cl", col("__am.cl"))
        .withColumn("__d", col("__am.d"))
        .drop("__am")
    }

  /** The `iters`-stage unrolled CTE prefix shared by the k-means oracles:
    * e (vectors as DOUBLE[]), c0 (first-k init) and c1..c`iters`
    * (assign → decimal-mean → coalesce-empty per round). `ns` prefixes
    * every CTE name and `vecExpr` selects the (sub)vector — the hooks
    * [[Pq]]'s per-subspace oracle uses to unroll m independent
    * trainings in one statement. */
  private[ext] def stagesSql(k: Int, iters: Int, ns: String = "",
      vecExpr: String = "embedding::DOUBLE[]", dim: Int = 64,
      where: String = "TRUE", from: String = "embeddings"): String = {
    // d2 = the engine's exact squared distance: the same left-
    // associated index-order sum of (eᵢ−cᵢ)² that SqDist's loop
    // accumulates (each op correctly rounded in both engines → bit-
    // exact). Ordering by (d2, cl) replays the engine's first-minimum
    // argmin without the sqrt-then-square double rounding that
    // list_distance would introduce; d = sqrt(d2) is one further
    // correctly-rounded op, matching round(sqrt(__d), 6) exactly.
    val d2Expr = (1 to dim)
      .map(i => s"(e[$i]-c[$i])*(e[$i]-c[$i])").mkString(" + ")
    // Every stage CTE is MATERIALIZED: DuckDB inlines plain CTEs, so a
    // chain where a_i reads c_{i-1} and c_i reads (c_{i-1}, m_i, a_i)
    // re-evaluates the whole upstream tree PER REFERENCE — evaluation
    // cost grows exponentially in `iters` (measured: the 3 OPQ oracles
    // at sf0.01 cost 87-99 s inlined vs ~5 s materialized, bit-identical
    // results). The hint pins one evaluation per stage, which is also
    // what the engine side computes.
    def assignSql(i: Int, from: String): String =
      s"""${ns}a$i AS MATERIALIZED (
         |  SELECT vec_id, e, cl, d2, sqrt(d2) AS d FROM (
         |    SELECT vec_id, e, cl, d2,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY d2, cl) AS rn
         |    FROM (SELECT vec_id, e, cl, $d2Expr AS d2
         |          FROM ${ns}e CROSS JOIN $from)) WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${assignSql(i, s"${ns}c${i - 1}")},
         |${ns}m$i AS MATERIALIZED (
         |  SELECT cl, list(avg ORDER BY i) AS c FROM (
         |    SELECT cl, g.i AS i,
         |      (sum(e[g.i]::DECIMAL(28,12))::DOUBLE) / count(*) AS avg
         |    FROM ${ns}a$i, LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g
         |    GROUP BY cl, g.i) GROUP BY cl),
         |${ns}c$i AS MATERIALIZED (
         |  SELECT p.cl, coalesce(m.c, p.c) AS c
         |  FROM ${ns}c${i - 1} p LEFT JOIN ${ns}m$i m USING (cl))""".stripMargin
    }.mkString(",\n")
    // d2Expr is unrolled to exactly `dim` terms: a corpus whose vectors
    // are a DIFFERENT length would make DuckDB's out-of-range list
    // index return NULL and silently corrupt every distance — so the
    // vector CTE asserts the length and fails LOUDLY on a mismatch
    val prefix =
      s"""${ns}e AS MATERIALIZED (
         |  SELECT vec_id, CASE WHEN len(v) = $dim THEN v
         |    ELSE error('oracle dim mismatch: len=' || len(v) ||
         |      ' expected=$dim') END AS e
         |  FROM (SELECT vec_id, $vecExpr AS v FROM $from
         |        WHERE $where)),
         |${ns}c0 AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, e AS c
         |  FROM (SELECT vec_id, e FROM ${ns}e ORDER BY vec_id LIMIT $k)),
         |$rounds,
         |${assignSql(iters + 1, s"${ns}c$iters")}""".stripMargin
    prefix
  }

  /** DuckDB re-derivation of [[lloydAssign]]. */
  def oracleSql(k: Int, iters: Int): String =
    s"""WITH ${stagesSql(k, iters)}
       |SELECT vec_id, cl AS cluster, round(d, 6) AS dist
       |FROM a${iters + 1} ORDER BY vec_id""".stripMargin

  /** DuckDB re-derivation of [[Dedup.semanticPairs]]: the same k-means
    * stages, then within-cluster pairs over the final assignment. */
  def semanticOracleSql(k: Int, iters: Int, threshold: Double): String =
    s"""WITH ${stagesSql(k, iters)}
       |SELECT l.cl AS cluster, l.vec_id AS id_a, r.vec_id AS id_b,
       |  round(list_cosine_similarity(l.e, r.e), 6) AS cosine
       |FROM a${iters + 1} l JOIN a${iters + 1} r
       |  ON l.cl = r.cl AND l.vec_id < r.vec_id
       |WHERE list_cosine_similarity(l.e, r.e) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
}
