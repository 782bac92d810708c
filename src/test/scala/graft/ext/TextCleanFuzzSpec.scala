package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded adversarial inputs for the text-canonicalization kernels —
  * the corrupt-input contract ("never throw, never hang, output stays
  * within type") enforced by test, the same discipline as the codec
  * fuzz spec. Random inputs include lone surrogates, control bytes,
  * truncated URL schemes and pathological nesting the fixture corpora
  * never produce. */
class TextCleanFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260814L)

  private def randomString(len: Int): String = {
    val sb = new StringBuilder(len)
    (0 until len).foreach { _ =>
      rnd.nextInt(8) match {
        case 0 => sb.append((rnd.nextInt(26) + 'a').toChar)
        case 1 => sb.append(' ')
        case 2 => sb.append((rnd.nextInt(0x20)).toChar)        // controls
        case 3 => sb.append((0xD800 + rnd.nextInt(0x800)).toChar) // lone surrogates
        case 4 => sb.append((0x300 + rnd.nextInt(0x70)).toChar) // combining marks
        case 5 => sb.append("http")
        case 6 => sb.append(Seq("://", ".", "/", "<", ">", "&").apply(rnd.nextInt(6)))
        case _ => sb.append((rnd.nextInt(0x2000) + 1).toChar)
      }
    }
    sb.toString
  }

  test("clean / urlDomains / htmlToText survive 200 adversarial strings") {
    val rows = (1 to 200).map(i => (i.toLong, randomString(rnd.nextInt(300))))
    val df = rows.toDF("id", "t")
    val out = df.select(col("id"),
      TextClean.clean(col("t")).as("c"),
      TextClean.htmlToText(col("t")).as("h"))
      .collect()
    assert(out.length === 200)
    out.foreach { r =>
      val c = r.getAs[String]("c")
      // collapsed: no runs of spaces, no leading/trailing space
      assert(!c.contains("  ") && c == c.trim)
    }
    val audit = TextClean.urlDomainAudit(df, "id", "t", Seq("x.bad")).collect()
    assert(audit.length === 200)
    audit.foreach { r =>
      assert(r.getAs[Int]("n_blocked") <= r.getAs[Int]("n_urls"))
      val doms = r.getAs[String]("domains")
      // extracted domains never contain whitespace or '/'
      assert(!doms.exists(ch => ch == ' ' || ch == '/' || ch == '\n'))
    }
  }

  test("nfc is idempotent on adversarial strings") {
    val rows = (1 to 100).map(i => (i.toLong, randomString(rnd.nextInt(200))))
    val df = rows.toDF("id", "t")
    val once = df.select(col("id"), TextClean.nfc(col("t")).as("n1"))
    val twice = once.select(col("id"), col("n1"),
      TextClean.nfc(col("n1")).as("n2"))
    assert(twice.filter(col("n1") =!= col("n2")).count() === 0)
  }

  test("chunkWindows covers adversarial token counts without loss") {
    val rows = (1 to 50).map { i =>
      val n = rnd.nextInt(200)
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    val chunks = TextClean.chunkWindows(df, "doc_id", "text", 32, 24)
      .groupBy("doc_id").agg(max("chunk_idx").as("mx"), count(lit(1)).as("n"))
      .collect()
    chunks.foreach { r =>
      // chunk indexes are dense 0..n-1
      assert(r.getAs[Int]("mx").toLong === r.getAs[Long]("n") - 1)
    }
  }
}
