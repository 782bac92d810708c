package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quality-aware near-dup resolution ([[Dedup.canonicalByScore]]):
  * component-best selection, singleton passthrough, tie-breaks. */
class CanonicalSelectSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a", 0.5), (2L, "b", 0.9), (3L, "c", 0.7),   // cluster {1,2,3}
    (4L, "d", 0.1), (5L, "e", 0.1),                   // cluster {4,5}, tie
    (6L, "f", 0.0)                                    // singleton
  ).toDF("doc_id", "text", "score")

  private val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")

  test("keeps the best-scoring member per component, singletons pass") {
    val kept = Dedup.canonicalByScore(docs, "doc_id", pairs, col("score"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    // cluster {1,2,3}: 2 wins (0.9); cluster {4,5}: tie 0.1 -> lowest id 4
    assert(kept === Seq(2L, 4L, 6L))
  }

  test("equals resolveNearDups when the score is the negated id") {
    // score = -id makes "best score" = "minimum id" = the component label
    val byScore = Dedup.canonicalByScore(docs, "doc_id", pairs, -col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val byMin = Dedup.resolveNearDups(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(byScore === byMin)
  }

  test("no pairs → everything survives") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val kept = Dedup.canonicalByScore(docs, "doc_id", empty, col("score"))
    assert(kept.count() === 6L)
  }

  test("transitive clusters resolve to one survivor") {
    // chain 1-2, 2-3, 3-4, 4-5 is ONE component even though 1 and 5
    // never pair directly
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.canonicalByScore(docs, "doc_id", chain, col("score"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 6L)) // 2 has the max score 0.9 in the chain
  }
}
