package graft.ext

import graft.SparkSpec

/** BPE trainer semantics pinned by hand-computed fixtures: weighted
  * argmax, (score DESC, a, b) tie-break, leftmost non-overlapping merge
  * application including the shared-delimiter "A B A B" corner, and
  * early exhaustion when the vocabulary runs out of adjacent pairs. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def train(rounds: Int, docs: String*) =
    BpeTrainer.train(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("weighted argmax learns merges in frequency order and exhausts early") {
    // words: "aa" ×2 → " a a ", "ab" ×1 → " a b "
    // r1: (a,a)=2 beats (a,b)=1; r2: only (a,b)=1 remains; r3: no pairs
    val m = train(rounds = 5, "aa aa ab")
    assert(m === Seq(
      (1, "a", "a", "aa", 2L),
      (2, "a", "b", "ab", 1L)))
  }

  test("ties break on symbol-pair bytes ascending after score") {
    // "xy" and "zw" both count 1 → tie; (x,y) < (z,w) lexicographically
    val m = train(rounds = 1, "xy zw")
    assert(m === Seq((1, "x", "y", "xy", 1L)))
  }

  test("leftmost non-overlapping replace: the shared-space A B A B corner") {
    // word "abab" → " a b a b ": r1 scores (a,b)=2 (both occurrences
    // count) but the shared delimiter space means only the FIRST
    // occurrence merges (" ab a b "); the second pair merges in r2;
    // r3 joins the halves
    val m = train(rounds = 3, "abab")
    assert(m === Seq(
      (1, "a", "b", "ab", 2L),
      (2, "a", "b", "ab", 1L),
      (3, "ab", "ab", "abab", 1L)))
  }

  test("word frequency weights the pair counts (Sennrich formulation)") {
    // "st" appears in 3 distinct word TYPES but 6 tokens; counts are
    // token-weighted: (s,t) = 4+1+1 = 6
    val m = train(rounds = 1, "stop stop stop stop step stem")
    assert(m.head === ((1, "s", "t", "st", 6L)))
  }

  test("segmentCounts: per-doc token counts under the learned merges") {
    val docs = Seq((0L, "aa aa ab"), (1L, "ab aa")).toDF("doc_id", "text")
    // rounds=1 learns only (a,a): "aa" → 1 symbol, "ab" stays 2
    val one = BpeTrainer.segmentCounts(docs, "doc_id", "text", rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(one === Seq((0L, 3L, 4L), (1L, 2L, 3L)))
    // rounds=2 also learns (a,b): every word is 1 token
    val two = BpeTrainer.segmentCounts(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(two === Seq((0L, 3L, 3L), (1L, 2L, 2L)))
  }

  test("driver-local merge loop is byte-identical to the distributed loop") {
    // rich enough corpus that 20 rounds exercise ties, overlaps and
    // multi-symbol merges on both paths
    val docs = Seq((0L, "the quick brown fox jumps over the lazy dog the fox"),
      (1L, "pack my box with five dozen liquor jugs the box"),
      (2L, "abab abab baba aa bb ab ba the the the"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val dist = rows(BpeTrainer.train(docs, "text", rounds = 20))
    val local = rows(BpeTrainer.trainLocal(docs, "text", rounds = 20))
    assert(local === dist)
  }

  test("256+ rounds auto-select the driver loop and finish in seconds") {
    // 400 distinct 8-char words over 20 letters: thousands of distinct
    // adjacent pairs, so 300 merge rounds never exhaust
    val words = (0 until 400).map { i =>
      val sb = new StringBuilder
      var x = i * 2654435761L
      for (_ <- 0 until 8) { sb += ('a' + (x % 20).toInt).toChar; x = x / 20 + i + 1 }
      sb.result()
    }
    val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val m = BpeTrainer.train(docs, "text", rounds = 300).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(m.length === 300, s"expected 300 merges, got ${m.length}")
    assert(m.map(_.getInt(0)).toSeq === (1 to 300))
    // scores never increase out of order beyond ties is NOT guaranteed
    // (merges create new pairs), but every score is positive
    assert(m.forall(_.getLong(4) > 0))
    assert(secs < 60.0, f"300-round train took $secs%.1f s — driver loop not selected?")
  }

  test("generated oracle unrolls one CTE stage per round") {
    val sql = BpeTrainer.oracleSql(3)
    for (i <- 1 to 3) {
      // p_i stays inlined (single consumer); b_i/w_i are multi-referenced
      // and pinned MATERIALIZED — inlined they re-evaluate the whole
      // upstream merge chain per reference, exponential in rounds
      assert(sql.contains(s"p$i AS ("))
      assert(sql.contains(s"b$i AS MATERIALIZED ("))
      assert(sql.contains(s"w$i AS MATERIALIZED ("))
    }
    assert(!sql.contains("p4 AS ("))
    assert(sql.contains("ORDER BY round"))
  }

  test("stored tokenizer artifact encodes later corpora without retraining") {
    import org.apache.spark.sql.functions._
    val store = new graft.write.TableStore(
      java.nio.file.Files.createTempDirectory("graft-bpes").toString, spark)
    val corpus = Seq((1L, "aa ab aa"), (2L, "ab b")).toDF("doc_id", "text")
    BpeStore.save(store, "tok", corpus, "text", rounds = 1)
    // merge table is the portable artifact
    val m = BpeStore.merges(store, "tok").collect()
    assert(m.length === 1 && m.head.getAs[String]("merged") === "aa")
    // a LATER batch encodes from the cold artifact; OOV words drop
    // (closed-vocab contract)
    val batch = Seq((9L, "aa zz ab")).toDF("doc_id", "text")
    val enc = BpeStore.encodeFrom(store, "tok", batch, "doc_id", "text")
      .head()
    assert(enc.getAs[Long]("n_tokens") === 3L) // aa=1 sym, zz OOV, ab=2 syms
    assert(enc.getAs[scala.collection.Seq[Long]]("token_ids") === Seq(2L, 1L, 3L))
  }

  test("character fallback makes encoding total without moving stored ids") {
    import org.apache.spark.sql.functions._
    val store = new graft.write.TableStore(
      java.nio.file.Files.createTempDirectory("graft-bpef").toString, spark)
    val corpus = Seq((1L, "aa ab aa"), (2L, "ab b")).toDF("doc_id", "text")
    BpeStore.save(store, "tok", corpus, "text", rounds = 1)
    // stored vocab: a=1, aa=2, b=3
    // in-vocab corpus: fallback path must equal the strict path exactly
    val strict = BpeStore.encodeFrom(store, "tok", corpus, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq.map(_.toString)
    val fb = BpeStore.encodeFromWithFallback(store, "tok", corpus,
      "doc_id", "text").orderBy("doc_id").collect().toSeq.map(_.toString)
    assert(fb === strict)
    // OOV word "za" now encodes per character: z is a NEW symbol -> id 4
    val batch = Seq((9L, "aa za")).toDF("doc_id", "text")
    val enc = BpeStore.encodeFromWithFallback(store, "tok", batch,
      "doc_id", "text").head()
    assert(enc.getAs[Long]("n_tokens") === 3L) // aa + (z, a)
    assert(enc.getAs[scala.collection.Seq[Long]]("token_ids") === Seq(2L, 4L, 1L))
    // fallback ids persist: a LATER batch introducing q appends q=5
    // while z keeps id 4 — "za" encodes identically across batches
    val batch2 = Seq((10L, "qa za")).toDF("doc_id", "text")
    val enc2 = BpeStore.encodeFromWithFallback(store, "tok", batch2,
      "doc_id", "text").head()
    assert(enc2.getAs[scala.collection.Seq[Long]]("token_ids") ===
      Seq(5L, 1L, 4L, 1L)) // (q,a) then (z,a)
  }

  test("retraining replaces the whole artifact, fallback ids included") {
    import org.apache.spark.sql.functions._
    val store = new graft.write.TableStore(
      java.nio.file.Files.createTempDirectory("graft-bper").toString, spark)
    val corpus = Seq((1L, "aa ab aa"), (2L, "ab b")).toDF("doc_id", "text")
    BpeStore.save(store, "tok", corpus, "text", rounds = 1)
    // first sighting of x persists a fallback id keyed to the OLD
    // vocab's id space
    BpeStore.encodeFromWithFallback(store, "tok",
      Seq((9L, "xa")).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(store.readOption("tok__fallback").isDefined)
    // retrain on a corpus where x IS a vocab character: the stale
    // fallback row would otherwise duplicate every x occurrence
    val corpus2 = Seq((1L, "aa ab aa"), (2L, "ab b"), (3L, "bx bx"))
      .toDF("doc_id", "text")
    BpeStore.save(store, "tok", corpus2, "text", rounds = 1)
    assert(store.readOption("tok__fallback").isEmpty,
      "save must replace the fallback table with the rest of the artifact")
    val strict = BpeStore.encodeFrom(store, "tok", corpus2, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq.map(_.toString)
    val fb = BpeStore.encodeFromWithFallback(store, "tok", corpus2,
      "doc_id", "text").orderBy("doc_id").collect().toSeq.map(_.toString)
    assert(fb === strict)
  }

  test("encode emits dense in-range token ids matching the segmentation") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "aa ab aa"), (2L, "ab b")).toDF("doc_id", "text")
    // 1 round: merge (a,a) -> "aa"; segmentations: aa->[aa], ab->[a,b]
    // vocab sorted: a=1, aa=2, b=3
    val out = BpeTrainer.encode(docs, "doc_id", "text", rounds = 1)
      .collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"),
        r.getAs[scala.collection.Seq[Long]]("token_ids"))).toMap
    assert(byId(1L) === ((4L, Seq(2L, 1L, 3L, 2L))))  // aa, a b, aa
    assert(byId(2L) === ((3L, Seq(1L, 3L, 3L))))      // a b, b
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") ===
        r.getAs[scala.collection.Seq[Long]]("token_ids").length.toLong)
    }
  }
}
