package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.write.TableStore

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    new TableStore(Files.createTempDirectory("graft-incd").toString, spark)

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely different text with no overlap here at all"),
    (3L, "spark engines shuffle data between executors by key")
  ).toDF("doc_id", "text")

  test("checkBatch finds near-dups of indexed docs without full rescan") {
    val store = freshStore()
    Dedup.withPins {
      IncrementalDedup.indexCorpus(store, "c", corpus, "doc_id", "text")
      val batch = Seq(
        (10L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 1
        (11L, "some fresh unseen content about entirely new things")
      ).toDF("doc_id", "text")
      val pairs = IncrementalDedup.checkBatch(store, "c", batch, "doc_id", "text")
        .collect()
      assert(pairs.length === 1)
      assert(pairs.head.getAs[Long]("new_id") === 10L)
      assert(pairs.head.getAs[Long]("old_id") === 1L)
      assert(pairs.head.getAs[Double]("jaccard") === 1.0)
    }
  }

  test("appendBatch grows the index so later batches see earlier ones") {
    val store = freshStore()
    Dedup.withPins {
      IncrementalDedup.indexCorpus(store, "c", corpus, "doc_id", "text")
      val b1 = Seq((10L, "a brand new document about streaming joins today"))
        .toDF("doc_id", "text")
      assert(IncrementalDedup.checkBatch(store, "c", b1, "doc_id", "text").isEmpty)
      IncrementalDedup.appendBatch(store, "c", b1, "doc_id", "text")
      val b2 = Seq((20L, "a brand new document about streaming joins today"))
        .toDF("doc_id", "text")
      val pairs = IncrementalDedup.checkBatch(store, "c", b2, "doc_id", "text")
        .select("new_id", "old_id").as[(Long, Long)].collect().toSeq
      assert(pairs === Seq((20L, 10L)))
    }
  }

  test("band table is candidate-bounded: clean batches verify nothing") {
    val store = freshStore()
    Dedup.withPins {
      IncrementalDedup.indexCorpus(store, "c", corpus, "doc_id", "text")
      val clean = Seq(
        (30L, "unrelated musings on compiler optimization passes"),
        (31L, "gardening advice for cold climates and short seasons")
      ).toDF("doc_id", "text")
      val out = IncrementalDedup.checkBatch(store, "c", clean, "doc_id", "text")
      assert(out.isEmpty)
    }
  }

  test("mismatched hash-space parameters fail loudly, never match nothing") {
    val store = freshStore()
    Dedup.withPins {
      IncrementalDedup.indexCorpus(store, "c", corpus, "doc_id", "text")
      val batch = Seq((10L, "anything at all")).toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException] {
        IncrementalDedup.checkBatch(store, "c", batch, "doc_id", "text",
          perms = 32)
      }
      assert(e.getMessage.contains("hash space"))
      val e2 = intercept[IllegalArgumentException] {
        IncrementalDedup.appendBatch(store, "c", batch, "doc_id", "text",
          n = 5)
      }
      assert(e2.getMessage.contains("hash space"))
    }
  }
}
