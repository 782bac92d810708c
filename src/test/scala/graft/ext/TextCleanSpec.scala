package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.HashSplit

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  test("nfc composes combining sequences and is an ASCII identity") {
    val df = Seq(
      (1L, "cafe\u0301"),        // e + combining acute -> precomposed
      (2L, "caf\u00E9"),         // already NFC
      (3L, "A\u030Angstro\u0308m"), // ring + diaeresis compose
      (4L, "plain ascii text")
    ).toDF("id", "t")
    val out = df.select(col("id"), TextClean.nfc(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "caf\u00E9")
    assert(out(2L) === "caf\u00E9")
    assert(out(3L) === "\u00C5ngstr\u00F6m")
    assert(out(4L) === "plain ascii text")
  }

  test("clean strips controls, collapses whitespace, and is idempotent") {
    val df = Seq((1L, "  abc \u0007 def\u000Bg \t\n hi  ")).toDF("id", "t")
    val once = df.select(TextClean.clean(col("t")).as("c"))
    val c = once.as[String].head()
    assert(c === "abc def g hi")
    val twice = once.select(TextClean.clean(col("c")).as("c2")).as[String].head()
    assert(twice === c)
  }

  test("cleanReport counts controls and replacement chars") {
    val df = Seq(
      (1L, "ok text"),
      (2L, "bad\u0007 bytes\uFFFD\uFFFD here\u007F")
    ).toDF("id", "t")
    val r = TextClean.cleanReport(df, "id", "t").orderBy("id").collect()
    assert(r(0).getAs[Int]("n_ctrl") === 0)
    assert(r(0).getAs[Int]("n_fffd") === 0)
    assert(!r(0).getAs[Boolean]("changed"))
    assert(r(1).getAs[Int]("n_ctrl") === 2)
    assert(r(1).getAs[Int]("n_fffd") === 2)
    assert(r(1).getAs[Boolean]("changed"))
    assert(r(1).getAs[String]("clean") === "bad bytes\uFFFD\uFFFD here")
  }

  test("chunkWindows covers every token with the right overlap") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val chunks = TextClean.chunkWindows(df, "doc_id", "text", width = 32, stride = 24)
      .orderBy("chunk_idx").collect()
    // n=100: ceil((100-32)/24)+1 = ceil(68/24)+1 = 3+1 = 4 chunks
    assert(chunks.length === 4)
    assert(chunks.map(_.getAs[Int]("n_tokens")).toSeq === Seq(32, 32, 32, 28))
    assert(chunks.map(_.getAs[Int]("chunk_idx")).toSeq === Seq(0, 1, 2, 3))
  }

  test("chunkWindows yields one chunk for short documents") {
    val df = Seq((1L, "just five words in here")).toDF("doc_id", "text")
    val chunks = TextClean.chunkWindows(df, "doc_id", "text", 32, 24).collect()
    assert(chunks.length === 1)
    assert(chunks.head.getAs[Int]("n_tokens") === 5)
  }

  test("htmlToText drops blocks, strips tags, and decodes entities once") {
    val df = Seq(
      (1L, "<html><style>p{x}</style><body><h1>T</h1>" +
        "<p>hello &amp;lt; world &quot;q&quot; A&nbsp;B</p>" +
        "<script>if (1 < 2) alert('x')</script>done</body></html>"),
      (2L, "no markup at all")
    ).toDF("id", "h")
    val out = df.select(col("id"),
      TextClean.htmlToText(col("h")).as("t"),
      TextClean.tagCount(col("h")).as("n"))
      .orderBy("id").collect()
    // &amp;lt; decodes to the literal text "&lt;" (single decode only)
    assert(out(0).getAs[String]("t") === "T hello &lt; world \"q\" A B done")
    assert(out(0).getAs[Int]("n") > 5)
    assert(out(1).getAs[String]("t") === "no markup at all")
    assert(out(1).getAs[Int]("n") === 0)
  }

  test("urlDomainAudit extracts registered domains and flags blocklist hits") {
    val df = Seq(
      (1L, "see https://a.b.example.com/x and http://tracker.bad/y?z=1 done"),
      (2L, "no urls at all"),
      (3L, "bare https://localhost/only and https://single"),
      (4L, "dup https://x.site.org/1 https://y.site.org/2")
    ).toDF("id", "t")
    val r = TextClean.urlDomainAudit(df, "id", "t", Seq("tracker.bad"))
      .orderBy("id").collect()
    assert(r(0).getAs[Int]("n_urls") === 2)
    assert(r(0).getAs[Int]("n_blocked") === 1)
    assert(!r(0).getAs[Boolean]("keep"))
    assert(r(0).getAs[String]("domains") === "example.com,tracker.bad")
    assert(r(1).getAs[Int]("n_urls") === 0)
    assert(r(1).getAs[Boolean]("keep"))
    assert(r(2).getAs[String]("domains") === "localhost,single")
    assert(r(3).getAs[Int]("n_urls") === 2)
    assert(r(3).getAs[String]("domains") === "site.org")
  }

  test("urlDomainAudit terminates URLs at any whitespace, not just space") {
    val df = Seq(
      (1L, "visit http://ads.tracker.bad\nmore text"),
      (2L, "see https://ok.example.org\tthen stop")
    ).toDF("id", "t")
    val r = TextClean.urlDomainAudit(df, "id", "t", Seq("tracker.bad"))
      .orderBy("id").collect()
    // a newline after the URL must NOT be swallowed into the host —
    // the blocklisted domain still matches
    assert(r(0).getAs[String]("domains") === "tracker.bad")
    assert(r(0).getAs[Int]("n_blocked") === 1)
    assert(!r(0).getAs[Boolean]("keep"))
    assert(r(1).getAs[String]("domains") === "example.org")
  }

  test("shardShuffle is a salt-keyed deterministic permutation") {
    val df = (1L to 200L).toDF("doc_id")
    val a = HashSplit.shardShuffle(df, "doc_id", nShards = 8, salt = "ep0")
    val b = HashSplit.shardShuffle(df, "doc_id", nShards = 8, salt = "ep0")
    val c = HashSplit.shardShuffle(df, "doc_id", nShards = 8, salt = "ep1")
    // every row survives with a unique (shard, pos) slot
    assert(a.count() === 200)
    assert(a.select("shard", "pos").distinct().count() === 200)
    assert(a.agg(max("shard")).head().getLong(0) < 8)
    // same salt = identical deal; new salt = a different permutation
    val da = a.orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val db = b.orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val dc = c.orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    assert(da === db)
    assert(da !== dc)
    assert(da.sorted === (1L to 200L))
    assert(dc.sorted === (1L to 200L))
  }
}
