package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (1L, Array(0.0f, 10.0f, 5.0f, 3.0f)),
    (2L, Array(1.0f, 20.0f, 5.0f, -3.0f)),
    (3L, Array(0.5f, 15.0f, 5.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("int8 codes stay in range and reconstruct within the SQ8 bound") {
    val out = Quantize.int8(emb, "vec_id", "embedding").orderBy("vec_id").collect()
    assert(out.length === 3)
    out.foreach { r =>
      val q = r.getAs[scala.collection.Seq[Int]]("q")
      assert(q.length === 4)
      assert(q.forall(c => c >= -128 && c <= 127))
      assert(r.getAs[Long]("qsum") === q.map(_.toLong).sum)
    }
    // worst per-dim span is 23 (dim 3: -3..20); SQ8 error bound span/510
    val maxErr = out.map(_.getAs[Double]("max_err")).max
    assert(maxErr <= 23.0 / 510.0 + 1e-9)
  }

  test("corpus min/max rows hit the code range endpoints") {
    val rows = Quantize.int8(emb, "vec_id", "embedding").orderBy("vec_id")
      .select("q").as[Seq[Int]].collect()
    // dim 0: min 0.0 (row 1) -> -128, max 1.0 (row 2) -> 127
    assert(rows(0)(0) === -128)
    assert(rows(1)(0) === 127)
    // dim 2 is zero-span (all 5.0): r = 0 -> code -128, zero error
    assert(rows.forall(_(2) === -128))
  }

  test("zero-span dimensions reconstruct exactly") {
    val one = Seq((1L, Array(7.0f, 7.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8(one, "vec_id", "embedding").head()
    assert(r.getAs[scala.collection.Seq[Int]]("q") === Seq(-128, -128))
    assert(r.getAs[Double]("max_err") === 0.0)
  }

  test("rerank returns exact top-k when the shortlist covers the corpus") {
    val vecs = (1 to 40).map(i =>
      (i.toLong, Array(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat)))
      .toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") <= 2)
    val got = Quantize.rerankTopK(vecs, "vec_id", "embedding", qs,
      k = 3, shortlist = 39).orderBy("query_id", "rank")
      .select("query_id", "match_id").as[(Long, Long)].collect().toSeq
    val exact = graft.ext.Similarity.bruteForceTopK(vecs, qs,
      "vec_id", "embedding", k = 3).orderBy("query_id", "rank")
      .select("query_id", "match_id").as[(Long, Long)].collect().toSeq
    // shortlist = whole corpus -> the exact re-rank IS brute force
    assert(got === exact)
    assert(got.forall { case (q, m) => q != m })
  }

  test("stats pass emits one row of dim-ordered arrays") {
    val s = Quantize.dimStats(emb, "embedding").collect()
    assert(s.length === 1)
    val mins = s.head.getAs[scala.collection.Seq[Double]]("mins")
    val maxs = s.head.getAs[scala.collection.Seq[Double]]("maxs")
    assert(mins === Seq(0.0, 10.0, 5.0, -3.0))
    assert(maxs === Seq(1.0, 20.0, 5.0, 3.0))
  }
}
