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

  // ---- embedding (sign-code Hamming) variant -----------------------------

  private def vecCorpus(n: Int, dim: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)((rng.nextDouble() - 0.5).toFloat)))
  }

  test("checkVectorBatch = brute force new x old under both contract filters") {
    val store = freshStore()
    Dedup.withPins {
      val base = vecCorpus(20, 100, seed = 3L) // 100 dims -> 2 packed words
      val baseDf = base.toDF("vec_id", "embedding")
      IncrementalDedup.indexVectors(store, "emb", baseDf,
        "vec_id", "embedding", dim = 100, maxHamming = 9)
      // batch: near-twins of half the corpus + fresh unrelated vectors
      val twins = base.take(10).map { case (i, v) =>
        (i + 100L, v.map(x => x * 1.01f + 0.004f)) }
      val fresh = vecCorpus(5, 100, seed = 99L).map { case (i, v) => (i + 500L, v) }
      val batch = twins ++ fresh
      val got = IncrementalDedup.checkVectorBatch(store, "emb",
          batch.toDF("vec_id", "embedding"), "vec_id", "embedding",
          threshold = 0.9, maxHamming = 9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expect = (for {
        (in, vn) <- batch; (io, vo) <- base
        h = vn.zip(vo).count { case (x, y) => (x > 0) != (y > 0) }
        dot = vn.zip(vo).map { case (x, y) => x.toDouble * y.toDouble }.sum
        na = math.sqrt(vn.map(x => x.toDouble * x).sum)
        nb = math.sqrt(vo.map(x => x.toDouble * x).sum)
        if h <= 9 && dot / (na * nb) >= 0.9
      } yield (in, io, h)).toSet
      assert(got === expect)
      assert(got.size >= 10, "every twin must find its base") // twins collide
    }
  }

  test("vector index appends grow the screen; tighter check budgets allowed") {
    val store = freshStore()
    Dedup.withPins {
      val base = vecCorpus(8, 64, seed = 7L)
      IncrementalDedup.indexVectors(store, "emb", base.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = 64, maxHamming = 6)
      // append one more indexed vector, then a twin of IT must be found
      val extra = vecCorpus(1, 64, seed = 11L).map { case (_, v) => (50L, v) }
      IncrementalDedup.appendVectorBatch(store, "emb",
        extra.toDF("vec_id", "embedding"), "vec_id", "embedding")
      val twin = extra.map { case (i, v) =>
        (i + 100L, v.map(x => x * 1.01f + 0.002f)) }
      // budget 3 <= indexed 6: allowed, and recall still perfect within 3
      val got = IncrementalDedup.checkVectorBatch(store, "emb",
          twin.toDF("vec_id", "embedding"), "vec_id", "embedding",
          threshold = 0.95, maxHamming = 3)
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
      assert(got.contains((150L, 50L)), s"twin of the appended vector: $got")
      got.foreach { case (n, _) => assert(n === 150L) }
    }
  }

  test("vector band-space mismatches fail loudly, never match nothing") {
    val store = freshStore()
    Dedup.withPins {
      val base = vecCorpus(4, 64, seed = 13L)
      IncrementalDedup.indexVectors(store, "emb", base.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = 64, maxHamming = 4)
      // re-index at a different budget: refused (one band space per table)
      val e = intercept[IllegalArgumentException] {
        IncrementalDedup.indexVectors(store, "emb",
          base.toDF("vec_id", "embedding"), "vec_id", "embedding",
          dim = 64, maxHamming = 8)
      }
      assert(e.getMessage.contains("band space"), e.getMessage)
      // checking WIDER than indexed: refused (bands cannot guarantee it)
      val e2 = intercept[IllegalArgumentException] {
        IncrementalDedup.checkVectorBatch(store, "emb",
          base.toDF("vec_id", "embedding"), "vec_id", "embedding",
          threshold = 0.9, maxHamming = 10)
      }
      assert(e2.getMessage.contains("indexed"), e2.getMessage)
      // checking an unindexed table: loud, not empty
      val e3 = intercept[IllegalArgumentException] {
        IncrementalDedup.checkVectorBatch(store, "nosuch",
          base.toDF("vec_id", "embedding"), "vec_id", "embedding",
          threshold = 0.9, maxHamming = 2)
      }
      assert(e3.getMessage.contains("indexVectors"), e3.getMessage)
    }
  }
}
