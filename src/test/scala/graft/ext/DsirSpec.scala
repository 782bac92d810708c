package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR semantics the oracle gate can't see: directionality (docs that
  * look like the target outrank docs that don't), featurization edges,
  * and determinism across re-partitioning. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a cat and the mat")
  ).toDF("doc_id", "text")

  private val raw = Seq(
    (10L, "the cat sat on the mat"),       // verbatim target-style
    (11L, "stock market index futures"),   // out-of-domain
    (12L, "the cat sat near a mat"),       // close to target
    (13L, "quantum flux capacitor array")  // out-of-domain
  ).toDF("doc_id", "text")

  test("target-like documents outrank out-of-domain documents") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", m = 1024)
      .select("doc_id", "weight").as[(Long, Double)].collect().toMap
    assert(w(10L) > w(11L) && w(10L) > w(13L))
    assert(w(12L) > w(11L) && w(12L) > w(13L))
  }

  test("select returns top-k in weight-desc, id-asc order") {
    val sel = Dsir.select(raw, target, "doc_id", "text", m = 1024, k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(sel.length == 2)
    assert(sel.contains(10L)) // the verbatim-style doc must make the cut
  }

  test("features: blank docs contribute nothing; single-token docs have no bigrams") {
    val docs = Seq((1L, "  "), (2L, "solo"), (3L, "a b")).toDF("doc_id", "text")
    val f = Dsir.features(docs, "doc_id", "text", m = 64)
    val perDoc = f.groupBy("doc_id").agg(sum("cnt").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(!perDoc.contains(1L))
    assert(perDoc(2L) == 1L)     // one unigram, zero bigrams
    assert(perDoc(3L) == 3L)     // two unigrams + one bigram
  }

  test("selectByPredicate equals select over the two slices") {
    val docs = target.withColumn("lang", lit("en"))
      .unionByName(raw.withColumn("lang", lit("xx")))
    val fused = Dsir.selectByPredicate(docs, "doc_id", "text",
        isTarget = col("lang") === "en", m = 512, k = 4)
      .collect().toSeq
    val sliced = Dsir.select(raw, target, "doc_id", "text", m = 512, k = 4)
      .collect().toSeq
    assert(fused == sliced)
  }

  test("weights are invariant to input partitioning") {
    val a = Dsir.importanceWeights(raw, target, "doc_id", "text", m = 256)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(raw.repartition(7), target.repartition(3),
        "doc_id", "text", m = 256)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("CharTrigrams space: sliding 3-char windows, short docs empty") {
    val docs = Seq((1L, " abcde "), (2L, "ab"), (3L, "   "), (4L, "xyz"))
      .toDF("doc_id", "text")
    val grams = docs.select($"doc_id",
        Dsir.CharTrigrams.grams($"text").as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(grams(1L) === Seq("abc", "bcd", "cde")) // trimmed, 3 windows
    assert(grams(2L) === Seq.empty)                // too short
    assert(grams(3L) === Seq.empty)                // blank after trim
    assert(grams(4L) === Seq("xyz"))
    // the pluggable space rides the same selection math: a trigram run
    // over slices ≡ the fused predicate path (the UnigramBigram
    // equivalence test, under the swapped space)
    val docs2 = target.withColumn("lang", lit("en"))
      .unionByName(raw.withColumn("lang", lit("xx")))
    val fused = Dsir.selectByPredicate(docs2, "doc_id", "text",
        isTarget = col("lang") === "en", m = 512, k = 4,
        space = Dsir.CharTrigrams).collect().toSeq
    val sliced = Dsir.select(raw, target, "doc_id", "text", m = 512, k = 4,
        space = Dsir.CharTrigrams).collect().toSeq
    assert(fused == sliced)
    assert(fused.nonEmpty)
  }
}
