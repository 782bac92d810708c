package graft.write

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    new TableStore(Files.createTempDirectory("graft-zo").toString, spark)

  test("morton key interleaves normalized bits of both columns") {
    // x,y in [0,3] with bits=2: key = interleave(x, y) exactly
    val df = Seq((0, 0), (3, 0), (0, 3), (3, 3), (2, 1))
      .toDF("x", "y")
    val keyed = Zorder.withKey(df, Seq("x", "y"), bits = 2)
      .select("x", "y", "__z").as[(Int, Int, Long)].collect()
      .map { case (x, y, z) => (x, y) -> z }.toMap
    // scaled value = v (max=3 = 2^2-1); bit b of col i at position b*2+i
    def morton(x: Int, y: Int): Long =
      ((x & 1) | ((y & 1) << 1) | ((x & 2) << 1) | ((y & 2) << 2)).toLong
    keyed.foreach { case ((x, y), z) =>
      assert(z === morton(x, y), s"($x,$y)")
    }
  }

  test("z-ordered segments prune on EITHER clustered column") {
    val store = freshStore()
    val df = (0 until 4096).map(i => (i % 64, i / 64, s"r$i"))
      .toDF("a", "b", "payload")
    Zorder.overwrite(store, "t", df, Seq("a", "b"), segments = 16)
    val segs = store.segments("t")
    assert(segs.length >= 8, s"expected many segments, got ${segs.length}")
    // a narrow predicate on EACH dimension must skip most segments
    def surviving(colName: String): Int =
      segs.count { s =>
        val st = s.stats(colName)
        BigDecimal(st.max) >= 3 && BigDecimal(st.min) <= 4
      }
    assert(surviving("a") < segs.length / 2,
      s"a-predicate kept ${surviving("a")}/${segs.length}")
    assert(surviving("b") < segs.length / 2,
      s"b-predicate kept ${surviving("b")}/${segs.length}")
    // and the pruned read loses no qualifying row
    val pruned = store.readPruned("t", "b", Some("3"), Some("4"))
      .filter(col("b") >= 3 && col("b") <= 4)
    assert(pruned.count() === df.filter(col("b") >= 3 && col("b") <= 4).count())
  }

  test("null clustered values survive the overwrite in the first segment") {
    val store = freshStore()
    val df = Seq((Some(1), Some(10), "a"), (None, Some(20), "b"),
      (Some(3), None, "c"), (None, None, "d"), (Some(5), Some(50), "e"))
      .toDF("a", "b", "v")
    Zorder.overwrite(store, "t", df, Seq("a", "b"), segments = 2)
    assert(store.read("t").count() === 5)
    assert(store.read("t").select("v").as[String].collect().sorted.toSeq ===
      Seq("a", "b", "c", "d", "e"))
  }

  test("compact re-clusters a table grown past the segment budget") {
    val store = freshStore()
    (0 until 12).foreach { b =>
      store.append("t", (0 until 100).map(i =>
        (b * 100 + i, (b * 100 + i) % 50, s"r$b-$i")).toDF("a", "b", "v"))
    }
    assert(store.segments("t").length === 12)
    assert(!Zorder.compact(store, "t", Seq("a", "b"), segments = 4,
      maxSegments = 16), "under budget: must be a no-op")
    assert(Zorder.compact(store, "t", Seq("a", "b"), segments = 4,
      maxSegments = 8), "over budget: must rewrite")
    assert(store.segments("t").length <= 4)
    assert(store.read("t").count() === 1200)
    // every segment now carries stats on BOTH clustered columns
    store.segments("t").foreach { s =>
      assert(s.stats.contains("a") && s.stats.contains("b"))
    }
  }

  test("z-order overwrite round-trips every row") {
    val store = freshStore()
    val df = (0 until 1000).map(i => (i, (i * 37) % 100, s"v$i"))
      .toDF("a", "b", "v")
    Zorder.overwrite(store, "t", df, Seq("a", "b"), segments = 8)
    val back = store.read("t").select("a", "b", "v")
      .as[(Int, Int, String)].collect().sortBy(_._1)
    assert(back.toSeq === df.as[(Int, Int, String)].collect().sortBy(_._1).toSeq)
  }
}
