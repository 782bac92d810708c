package graft.ext

import graft.SparkSpec

/** Unigram trainer semantics pinned by hand-computed fixtures: the
  * weighted substring seed with (count DESC, bytes ASC) selection,
  * greedy leftmost-longest segmentation, the integer usage prune with
  * the character coverage floor, and local ≡ distributed. */
class UnigramTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def df(docs: String*) =
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def cfg(vocab: Int, seed: Int, maxLen: Int = 4, iters: Int = 2) =
    UnigramTrainer.Config(vocab, seed, maxLen, iters)

  private def pieceRows(p: org.apache.spark.sql.DataFrame) =
    p.orderBy("tok_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("single-word corpus: greedy longest-match wins and usage counts " +
      "weight by word frequency") {
    // "abab" ×3: seed keeps (within budget) all substrings; greedy
    // segments "abab" as [abab] once "abab" itself is retained —
    // usage(abab) = 3, every other piece shadowed to 0
    val (pieces, reps) = UnigramTrainer.trainWithVocab(
      df("abab abab abab"), "text", cfg(vocab = 8, seed = 32))
    val byPiece = pieceRows(pieces).map(t => t._1 -> t._2).toMap
    assert(byPiece("abab") === 3L)
    assert(byPiece("a") === 0L && byPiece("b") === 0L,
      "characters survive the prune but are shadowed by the long piece")
    val rep = reps.filter($"w" === "abab").head().getAs[String]("rep")
    assert(rep.trim === "abab")
  }

  test("characters are never pruned even at vocabSize 1") {
    val (pieces, _) = UnigramTrainer.trainWithVocab(
      df("xy xy qr"), "text", cfg(vocab = 1, seed = 4, maxLen = 2, iters = 1))
    val ps = pieceRows(pieces).map(_._1).toSet
    assert(Set("x", "y", "q", "r").subsetOf(ps),
      s"coverage floor violated: $ps")
    // exactly one multi-char survivor: "xy" (weight 2) beats "qr" (1)
    assert(ps.filter(_.length > 1) === Set("xy"))
  }

  test("greedy is leftmost-longest, not optimal: a long prefix can " +
      "force more pieces") {
    // vocab keeps "ab" (weight wins) over rarer pieces; "aba" with
    // only {ab, a, b} segments [ab, a] — the greedy rule, documented
    val (_, reps) = UnigramTrainer.trainWithVocab(
      df("ab ab ab aba"), "text", cfg(vocab = 1, seed = 2, maxLen = 2, iters = 1))
    val rep = reps.filter($"w" === "aba").head().getAs[String]("rep")
    assert(rep.trim.split(" ").toSeq === Seq("ab", "a"))
  }

  test("driver-local loop is byte-identical to the distributed loop") {
    val docs = df(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "the five boxing wizards jump quickly",
      "how vexingly quick daft zebras jump")
    val c = cfg(vocab = 12, seed = 48, maxLen = 4, iters = 2)
    val (pl, rl) = UnigramTrainer.trainLocal(docs, "text", c)
    val (pd, rd) = UnigramTrainer.trainDistributed(docs, "text", c)
    assert(pieceRows(pl) === pieceRows(pd))
    def repRows(r: org.apache.spark.sql.DataFrame) =
      r.orderBy("w").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getString(2))).toSeq
    assert(repRows(rl) === repRows(rd))
  }

  test("store round-trip: encodeFrom the cold artifact equals the " +
      "in-plan encode") {
    val store = new graft.write.TableStore(
      java.nio.file.Files.createTempDirectory("uni-store").toString, spark)
    val docs = df("alpha beta gamma alpha", "beta delta alpha beta")
    val c = cfg(vocab = 10, seed = 40)
    UnigramStore.save(store, "tok", docs, "text", c)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Long](2).mkString(","))).toSeq
    assert(rows(UnigramStore.encodeFrom(store, "tok", docs, "doc_id", "text"))
      === rows(UnigramTrainer.encode(docs, "doc_id", "text", c)))
    // the persisted piece table is the trained one
    assert(pieceRows(UnigramStore.pieces(store, "tok"))
      === pieceRows(UnigramTrainer.train(docs, "text", c)))
  }
}
