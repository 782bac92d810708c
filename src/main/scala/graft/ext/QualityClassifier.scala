package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality scoring: a ridge-regression seed
  * discriminator over surface text statistics — the "quality
  * classifier" stage of LLM data curation (CCNet / GPT-3 / LLaMA
  * pipelines train a linear model to separate a high-quality seed
  * corpus from random web text, then keep the top-scoring documents).
  * The reference has no model plane of its own (SURVEY.md §2.10 —
  * scalar work is delegated to destination SQL); this is a
  * training-data extension like the rest of [[TextOps]].
  *
  * Shape, not sophistication, is the point at 100 TB:
  *  - featurization is the same pure-codegen [[TextOps]] column pack
  *    every text query uses (no UDFs, no shuffle);
  *  - the FIT is one aggregation pass producing the d×d Gram matrix
  *    and X·y moments (d = 5 here — driver-tiny at any corpus size),
  *    solved closed-form on the driver;
  *  - SCORING is a map-only broadcast-literal dot product — the fitted
  *    weights ride the plan as literals, so a 100 TB scoring pass is
  *    one scan with zero exchanges.
  *
  * Determinism: scoring is sequential literal arithmetic over
  * engine-replayable features, so a DuckDB oracle built from the
  * fitted weights ([[scoreOracleSql]]) replays it bit-for-bit — the
  * same model-derived-oracle contract as [[Pca.projectOracleSql]].
  */
object QualityClassifier {

  /** Fitted linear model: `score = w(0) + Σ w(i)·fᵢ` (w(0) = bias). */
  final case class RidgeModel(featureNames: Seq[String], weights: Array[Double],
      lambda: Double) {
    require(weights.length == featureNames.length + 1,
      s"weights (${weights.length}) must be bias + one per feature " +
        s"(${featureNames.length})")
  }

  /** A PLUGGABLE classifier feature: the Spark column producing the
    * final feature double from the text column, PAIRED with its DuckDB
    * mirror over a text SQL expression — the pair is what keeps the
    * model-derived oracle bit-replayable when a user extends the pack
    * (the fastText-style curation models are exactly "my features, the
    * same linear plane"). Both sides must evaluate the identical IEEE
    * arithmetic: integer counts, one correctly-rounded division,
    * `least` clamps — the discipline of the default pack. */
  final case class Feature(name: String, column: Column => Column,
      sql: String => String)

  /** SQL fragment: whitespace token count of `t` ('' → 0 — DuckDB's
    * string_split_regex('') yields [''] where the engine says 0). */
  private def tokCntSql(t: String): String =
    s"""(CASE WHEN length(trim($t)) = 0 THEN 0
       |          ELSE len(string_split_regex(trim($t), '\\s+')) END)""".stripMargin

  /** The default surface-statistics pack, each mirrored 1:1 by a
    * self-contained DuckDB expression. */
  val DefaultFeatures: Seq[Feature] = {
    val stops = TextOps.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    Seq(
      Feature("len_sat",
        t => least(lit(1.0), TextOps.tokenCount(t).cast("double") / 50.0),
        t => s"least(1.0, ${tokCntSql(t)}::DOUBLE / 50.0)"),
      Feature("punct_ratio",
        t => TextOps.punctRatio(t),
        t => s"""(CASE WHEN length($t) = 0 THEN 0.0
                |          ELSE len(regexp_extract_all($t, '[^A-Za-z0-9\\s]'))::DOUBLE
                |               / length($t) END)""".stripMargin),
      Feature("stop_ratio",
        t => TextOps.stopwordRatio(t),
        t => s"""(CASE WHEN ${tokCntSql(t)} = 0 THEN 0.0
                |          ELSE len(list_filter(string_split_regex(trim($t), '\\s+'),
                |                   w -> w IN ($stops)))::DOUBLE
                |               / ${tokCntSql(t)} END)""".stripMargin),
      Feature("char_sat",
        t => least(lit(1.0), length(t).cast("double") / 2000.0),
        t => s"least(1.0, length($t)::DOUBLE / 2000.0)"))
  }

  /** The feature pack as (name → column) pairs — [[DefaultFeatures]]
    * unless a custom pack is given. */
  def features(text: Column, feats: Seq[Feature] = DefaultFeatures)
      : Seq[(String, Column)] = feats.map(f => f.name -> f.column(text))

  /** Ridge fit of `label` (0/1 seed membership) on [[features]]:
    * w = (XᵀX + λ·diag(0,1,…,1))⁻¹ Xᵀy — bias unpenalized, one Spark
    * aggregation for the moments, 5×5 Gaussian elimination on the
    * driver. */
  def fit(docs: DataFrame, textCol: String, label: Column,
      lambda: Double = 1e-3,
      feats: Seq[Feature] = DefaultFeatures): RidgeModel = {
    val fs = features(col(textCol), feats)
    val names = fs.map(_._1)
    val cols = lit(1.0) +: fs.map(_._2)
    val d = cols.length
    // one pass: upper-triangle Gram sums + moment vector. NULL text
    // must be rejected, not skipped: a null row nulls every FEATURE
    // product (sum ignores it) but still counts in the bias×bias sum —
    // an inconsistent Gram that silently skews the fit. The null count
    // rides the same aggregate for free.
    val aggs =
      (for (i <- 0 until d; j <- i until d)
        yield sum(cols(i) * cols(j)).as(s"g_${i}_$j")) ++
        (0 until d).map(i => sum(cols(i) * label.cast("double")).as(s"m_$i")) :+
        sum(when(col(textCol).isNull || label.isNull, lit(1L))
          .otherwise(lit(0L))).as("n_null")
    val row = docs.agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(0), "fit over an empty corpus")
    require(row.getLong(row.length - 1) == 0L,
      s"fit: ${row.getLong(row.length - 1)} rows carry NULL $textCol/label " +
        "— filter or impute them first (null features would drop from " +
        "some Gram sums but not others, silently skewing the fit)")
    val a = Array.ofDim[Double](d, d)
    val b = new Array[Double](d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      a(i)(j) = row.getDouble(idx); a(j)(i) = a(i)(j); idx += 1
    }
    for (i <- 0 until d) { b(i) = row.getDouble(idx); idx += 1 }
    for (i <- 1 until d) a(i)(i) += lambda
    RidgeModel(names, solve(a, b), lambda)
  }

  /** In-place Gaussian elimination with partial pivoting (d ≤ ~10 by
    * construction — the feature pack is hand-sized). */
  private[ext] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val d = b.length
    for (p <- 0 until d) {
      var best = p
      for (r <- p + 1 until d) if (math.abs(a(r)(p)) > math.abs(a(best)(p))) best = r
      if (best != p) { val t = a(p); a(p) = a(best); a(best) = t
        val tb = b(p); b(p) = b(best); b(best) = tb }
      require(math.abs(a(p)(p)) > 1e-12,
        s"singular normal-equation matrix at pivot $p (degenerate features?)")
      for (r <- p + 1 until d) {
        val f = a(r)(p) / a(p)(p)
        for (c <- p until d) a(r)(c) -= f * a(p)(c)
        b(r) -= f * b(p)
      }
    }
    val w = new Array[Double](d)
    for (p <- d - 1 to 0 by -1) {
      var s = b(p)
      for (c <- p + 1 until d) s -= a(p)(c) * w(c)
      w(p) = s / a(p)(p)
    }
    w
  }

  /** Map-only scoring column: `w₀ + w₁·f₁ + … ` — left-associated
    * literal arithmetic, bit-replayable by [[scoreOracleSql]]. */
  def score(model: RidgeModel, text: Column,
      feats: Seq[Feature] = DefaultFeatures): Column = {
    val fs = features(text, feats)
    require(model.featureNames == fs.map(_._1),
      s"model features ${model.featureNames.mkString(",")} do not match " +
        s"this engine's feature pack ${fs.map(_._1).mkString(",")} — " +
        "the model was trained against a different featurization")
    fs.zipWithIndex.foldLeft(lit(model.weights(0))) {
      case (acc, ((_, f), i)) => acc + lit(model.weights(i + 1)) * f
    }
  }

  /** Model-derived oracle for an ARBITRARY feature pack: featurize via
    * each feature's own SQL mirror, then the same left-associated
    * literal polynomial — `w0 + w1·f1 + …` in pack order, the exact
    * fold of [[score]]. The fixed-pack [[scoreOracleSql]] keeps its
    * historical CTE shape; this is the extensibility path. */
  def scoreOracleSqlFeatures(model: RidgeModel, feats: Seq[Feature],
      seedSql: String, threshold: Double, gates: Seq[String]): String = {
    require(model.featureNames == feats.map(_.name),
      "feature pack does not match the model's featurization")
    val w = model.weights.map(x => java.lang.Double.toString(x))
    val featCols = feats.map(f =>
      s"    ${f.sql("text")} AS f_${f.name}").mkString(",\n")
    val poly = feats.zipWithIndex
      .map { case (f, i) => s"${w(i + 1)} * f_${f.name}" }
      .mkString(s"${w(0)}\n            + ", "\n            + ", "")
    val gateCols = gates.map(n => s", TRUE AS $n").mkString
    s"""WITH t AS (
       |  SELECT doc_id, $seedSql AS is_seed,
       |$featCols
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, is_seed,
       |    $poly AS score
       |  FROM t)
       |SELECT doc_id, is_seed, round(score, 6) AS score,
       |  score >= ${java.lang.Double.toString(threshold)} AS kept$gateCols
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Persist the fitted model as a lakehouse artifact (one driver-file
    * table: (idx, feature, weight, lambda) — bias at idx 0): train
    * once, score any corpus anywhere from a cold read, the
    * [[BpeStore]] train-once/apply-everywhere contract. Parquet
    * doubles round-trip IEEE-exactly, so the loaded model scores
    * bit-identically to the fitted one. */
  def save(store: graft.write.TableStore, name: String,
      model: RidgeModel): Unit = {
    import graft.write.TinyParquet
    import graft.write.TinyParquet.{DCell, ICell, SCell}
    store.overwriteDriverFile(name) { p =>
      TinyParquet.write(p, model.weights.toSeq.zipWithIndex.map {
        case (w, i) => Seq(
          "idx" -> ICell(i),
          "feature" -> SCell(if (i == 0) "__bias" else model.featureNames(i - 1)),
          "weight" -> DCell(w),
          "lambda" -> DCell(model.lambda))
      })
    }
  }

  /** Cold-read counterpart of [[save]]. */
  def load(store: graft.write.TableStore, name: String): RidgeModel = {
    val rows = store.readDriverRows(name)
      .sortBy(_("idx").asInstanceOf[Int])
    require(rows.nonEmpty, s"classifier artifact '$name' is empty")
    RidgeModel(
      rows.tail.map(_("feature").asInstanceOf[String]),
      rows.map(_("weight").asInstanceOf[Double]).toArray,
      rows.head("lambda").asInstanceOf[Double])
  }

  // The three gate queries (text_quality_classifier / _persisted /
  // stream_quality_filter) deposit their model-derived oracles through
  // the keyed graft.queries.OracleStash — one entry per query name, so
  // a rerun or a concurrent unrelated fit can never clobber another
  // query's oracle.

  /** The GUARDED featurization columns (n_tok, pr, n_stop, n_ch) as a
    * pre-stripped DuckDB SELECT fragment over `documents` — the SINGLE
    * owner of the SQL mirror of [[features]]/[[TextOps]]. The guards
    * matter on degenerate docs: `string_split_regex('')` yields ['']
    * (n_tok 1 where [[TextOps.tokenCount]] says 0) and `x / length('')`
    * is NULL where [[TextOps.punctRatio]] says 0.0 — unguarded, a
    * blank-doc corpus hash-diverges. Non-empty docs evaluate the exact
    * same arithmetic as before the guards. Stopword RATIOS built on
    * this must themselves guard `n_tok = 0` → 0.0 (mirroring
    * [[TextOps.stopwordRatio]]); the raw n_stop count needs no guard
    * ('' is not a stopword on either engine). */
  def featurizationSql: String = featurizationSqlOver("text")

  /** [[featurizationSql]] over an arbitrary text COLUMN/EXPRESSION —
    * composed oracles (corpus assembly) featurize the CLEANED text of
    * a mid-pipeline CTE, not raw `documents.text`; sharing the one
    * fragment keeps the two from silently diverging. */
  def featurizationSqlOver(t: String): String = {
    val stops = TextOps.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    s"""    CASE WHEN length(trim($t)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim($t), '\\s+')) END AS n_tok,
       |    CASE WHEN length($t) = 0 THEN 0.0
       |         ELSE len(regexp_extract_all($t, '[^A-Za-z0-9\\s]'))::DOUBLE
       |              / length($t) END AS pr,
       |    len(list_filter(string_split_regex(trim($t), '\\s+'),
       |        t -> t IN ($stops))) AS n_stop,
       |    length($t) AS n_ch""".stripMargin
  }

  /** The literal score polynomial over the [[featurizationSqlOver]]
    * column names (n_tok, pr, n_stop, n_ch) — the SINGLE SQL mirror of
    * [[score]]'s left-associated arithmetic, shared by [[scoreCtes]]
    * and composed oracles. Weights as `Double.toString` round-trip
    * literals. */
  def scoreExprSql(model: RidgeModel): String = {
    val w = model.weights.map(x => java.lang.Double.toString(x))
    s"""${w(0)} + ${w(1)} * least(1.0, n_tok::DOUBLE / 50.0)
       |            + ${w(2)} * pr
       |            + ${w(3)} * (CASE WHEN n_tok = 0 THEN 0.0
       |                         ELSE n_stop::DOUBLE / n_tok END)
       |            + ${w(4)} * least(1.0, n_ch::DOUBLE / 2000.0)""".stripMargin
  }

  /** The shared `WITH t …, s …` CTE block: featurization + the literal
    * score polynomial. `seedSql` rides through as `is_seed` when
    * non-empty. */
  private def scoreCtes(model: RidgeModel, seedSql: Option[String]): String = {
    val seedT = seedSql.map(s => s" $s AS is_seed,").getOrElse("")
    val seedS = seedSql.map(_ => " is_seed,").getOrElse("")
    s"""WITH t AS (
       |  SELECT doc_id,$seedT
       |$featurizationSql
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,$seedS
       |    ${scoreExprSql(model)} AS score
       |  FROM t)""".stripMargin
  }

  /** DuckDB replay of [[score]] over the raw `documents` table, with
    * the fitted weights as round-trip literals (`Double.toString` is
    * the shortest repr that parses back to the same IEEE double in any
    * engine). `gates` are ASSERTED: the oracle emits `TRUE AS <gate>`
    * unconditionally, so the Spark side's MEASURED boolean must be
    * true or the hash fails — the same contract as every other
    * asserted gate (sim_ivf_rebalance's skew booleans, the OPQ
    * orthonormality triple). Embedding the measured value instead
    * would make the gate tautological: both sides would agree on
    * `false` and certify a broken fit. */
  def scoreOracleSql(model: RidgeModel, seedSql: String, threshold: Double,
      gates: Seq[String]): String = {
    val gateCols = gates.map(n => s", TRUE AS $n").mkString
    s"""${scoreCtes(model, Some(seedSql))}
       |SELECT doc_id, is_seed, round(score, 6) AS score,
       |  score >= ${java.lang.Double.toString(threshold)} AS kept$gateCols
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of the KEPT set alone (the streaming gate's final
    * table): same CTEs, unrounded threshold comparison, rounded
    * projection. */
  def keptOracleSql(model: RidgeModel, threshold: Double): String =
    s"""${scoreCtes(model, None)}
       |SELECT doc_id, round(score, 6) AS score
       |FROM s WHERE score >= ${java.lang.Double.toString(threshold)}
       |ORDER BY doc_id""".stripMargin
}
