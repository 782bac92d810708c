package graft.ext

import graft.SparkSpec

/** Exact-substring contamination semantics pinned by planted
  * fixtures: the reported length is the LONGEST shared character
  * span (maximal — no longer span exists), matches never span two
  * eval documents, the cap clamps, and the automaton agrees with a
  * brute-force LCS on randomized inputs. */
class SuffixContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def bruteLcs(doc: String, evals: Seq[String]): Int = {
    var best = 0
    for (e <- evals; i <- 0 until doc.length) {
      var l = best + 1
      while (i + l <= doc.length && e.contains(doc.substring(i, i + l))) {
        best = l; l += 1
      }
    }
    best
  }

  test("planted verbatim span is reported exactly and maximally") {
    val quote = "the seven wonders of the ancient world endure"
    val eval = Seq((0L, s"prefix text $quote suffix text"))
      .toDF("doc_id", "text")
    val train = Seq(
      (100L, s"leading words $quote trailing words"), // full 45-char plant
      (101L, "totally unrelated content zzz qqq vvv"),
      (102L, "the seven wonders")                      // partial overlap
    ).toDF("doc_id", "text")
    val out = SuffixContamination
      .maxOverlap(train, eval, "doc_id", "text", cap = 64)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // doc 100 shares " the seven wonders...endure " PLUS the spaces
    // around it that both sides embed in the same phrase boundary:
    // the exact value is the brute-force LCS, not the quote length
    val evalTexts = Seq(s"prefix text $quote suffix text")
    assert(out(100L) === bruteLcs(s"leading words $quote trailing words", evalTexts))
    assert(out(100L) >= quote.length, "the planted span is a lower bound")
    assert(out(102L) === bruteLcs("the seven wonders", evalTexts))
    assert(out(101L) === bruteLcs("totally unrelated content zzz qqq vvv", evalTexts),
      "unrelated docs still share short char runs, never more")
  }

  test("matches cannot span two eval documents") {
    val eval = Seq((0L, "abcdef"), (1L, "ghijkl")).toDF("doc_id", "text")
    val train = Seq((100L, "cdefghij")).toDF("doc_id", "text")
    val out = SuffixContamination
      .maxOverlap(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(100L) === 4, s"cdef|ghij are separate docs: ${out(100L)}")
  }

  test("cap clamps the reported length") {
    val span = "x" * 100
    val eval = Seq((0L, span)).toDF("doc_id", "text")
    val train = Seq((100L, span)).toDF("doc_id", "text")
    val out = SuffixContamination
      .maxOverlap(train, eval, "doc_id", "text", cap = 32)
      .head().getInt(1)
    assert(out === 32)
  }

  test("automaton equals brute-force LCS on randomized fixtures") {
    val rnd = new scala.util.Random(42)
    def word() = (1 to (1 + rnd.nextInt(4)))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    def doc() = (1 to (5 + rnd.nextInt(20))).map(_ => word()).mkString(" ")
    val evals = Seq.fill(5)(doc())
    val trains = Seq.tabulate(30)(i => (100L + i, doc()))
    val out = SuffixContamination.maxOverlap(
        trains.toDF("doc_id", "text"),
        evals.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", cap = 64)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    trains.foreach { case (id, t) =>
      assert(out(id) === math.min(bruteLcs(t, evals), 64),
        s"doc $id: '$t'")
    }
  }
}
