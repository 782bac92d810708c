package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("solve inverts a known system (partial pivoting)") {
    // A = [[0,2,1],[1,1,1],[2,0,3]] (det = -4) forces a pivot swap on column 0
    val a = Array(
      Array(0.0, 2.0, 1.0),
      Array(1.0, 1.0, 1.0),
      Array(2.0, 0.0, 3.0))
    val x = Array(3.0, -1.0, 2.0)
    val b = a.map(row => row.zip(x).map { case (p, q) => p * q }.sum)
    val got = QualityClassifier.solve(a.map(_.clone()), b.clone())
    got.zip(x).foreach { case (g, w) => assert(math.abs(g - w) < 1e-10) }
  }

  test("solve rejects singular systems") {
    val a = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    intercept[IllegalArgumentException] {
      QualityClassifier.solve(a, Array(1.0, 2.0))
    }
  }

  test("fit recovers an exactly-linear label (lambda ~ 0)") {
    // label constructed as a known linear function of the features ->
    // ridge at tiny lambda must recover the coefficients
    val docs = Seq(
      "the cat sat on the mat",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb cc",
      "hello, world! punctuation; heavy: text???",
      "plain words only here nothing else at all",
      "the the the of of to in is it that",
      "short",
      "numbers 123 and 456 mixed with text and the usual words",
      "this is a long document " * 20
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fs = QualityClassifier.features(col("text"))
    val target = lit(0.25) + lit(2.0) * fs(0)._2 + lit(-1.5) * fs(1)._2 +
      lit(0.75) * fs(2)._2 + lit(0.5) * fs(3)._2
    val model = QualityClassifier.fit(docs, "text", target, lambda = 1e-12)
    val want = Array(0.25, 2.0, -1.5, 0.75, 0.5)
    model.weights.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-6, s"got ${model.weights.mkString(",")}")
    }
    // scoring the training frame reproduces the target
    val resid = docs.agg(max(abs(
      QualityClassifier.score(model, col("text")) - target))).head().getDouble(0)
    assert(resid < 1e-6)
  }

  test("ridge shrinks feature weights but never the bias") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, ("word " * (i + 1)) + (if (i % 2 == 0) "!!!" else ""))
    ).toDF("doc_id", "text")
    val label = col("doc_id") % 2 === 0
    val loose = QualityClassifier.fit(docs, "text", label, lambda = 1e-9)
    val tight = QualityClassifier.fit(docs, "text", label, lambda = 100.0)
    val normLoose = loose.weights.drop(1).map(w => w * w).sum
    val normTight = tight.weights.drop(1).map(w => w * w).sum
    assert(normTight < normLoose)
    // at huge lambda the model degenerates toward bias-only = mean label
    val huge = QualityClassifier.fit(docs, "text", label, lambda = 1e9)
    assert(huge.weights.drop(1).forall(w => math.abs(w) < 1e-6))
    assert(math.abs(huge.weights(0) - 0.5) < 1e-3)
  }

  test("save/load round-trips the model bit-exactly through the store") {
    val store = new graft.write.TableStore(
      java.nio.file.Files.createTempDirectory("graft-qcspec").toString, spark)
    val m = QualityClassifier.RidgeModel(
      Seq("len_sat", "punct_ratio", "stop_ratio", "char_sat"),
      Array(0.1, -2.5E-4, 1.0 / 3.0, math.Pi, 42.0), lambda = 1e-3)
    QualityClassifier.save(store, "qc", m)
    val loaded = QualityClassifier.load(store, "qc")
    assert(loaded.featureNames === m.featureNames)
    assert(loaded.lambda === m.lambda)
    assert(java.util.Arrays.equals(loaded.weights, m.weights))
    // a SECOND save overwrites (no append duplication)
    QualityClassifier.save(store, "qc", loaded)
    assert(QualityClassifier.load(store, "qc").weights.length === 5)
  }

  test("score rejects a model trained against a different feature pack") {
    val alien = QualityClassifier.RidgeModel(
      Seq("something", "else", "entirely", "here"),
      Array(1.0, 2.0, 3.0, 4.0, 5.0), lambda = 1e-3)
    intercept[IllegalArgumentException] {
      QualityClassifier.score(alien, col("text"))
    }
  }

  test("scoreOracleSql embeds round-trip weight literals and gates") {
    val m = QualityClassifier.RidgeModel(
      Seq("len_sat", "punct_ratio", "stop_ratio", "char_sat"),
      Array(0.1, -2.5E-4, 1.0 / 3.0, 0.0, 42.0), lambda = 1e-3)
    val sql = QualityClassifier.scoreOracleSql(m, "(lang = 'en')", 0.5,
      Seq("fit_beats_null", "seed_mean_higher"))
    assert(sql.contains(java.lang.Double.toString(1.0 / 3.0)))
    assert(sql.contains("-2.5E-4"))
    // gates are ASSERTED (always TRUE in the oracle) — a false
    // measurement on the Spark side must break the hash, never echo
    assert(sql.contains("TRUE AS fit_beats_null"))
    assert(sql.contains("TRUE AS seed_mean_higher"))
    assert(!sql.contains("FALSE AS"))
    assert(sql.contains("(lang = 'en') AS is_seed"))
    // every literal parses back to the exact double it came from
    m.weights.foreach { w =>
      assert(java.lang.Double.parseDouble(java.lang.Double.toString(w)) == w)
    }
  }
}
