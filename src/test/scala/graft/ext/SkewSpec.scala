package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 1000 rows of hot key 1, a few of everything else
    val left = ((1 to 1000).map(i => (1L, s"h$i")) ++
      Seq((2L, "x"), (3L, "y"), (4L, "z"))).toDF("k", "lv")
    val right = Seq((1L, "ONE"), (2L, "TWO"), (5L, "FIVE")).toDF("k", "rv")

    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lv", "rv").as[(Long, String, Option[String])]
        .collect().sortBy(t => (t._1, t._2))

    val plainInner = sorted(left.join(right, Seq("k"), "inner"))
    val saltedInner = sorted(Skew.saltedJoin(left, right, Seq("k"), buckets = 8))
    assert(saltedInner === plainInner)
    assert(plainInner.length === 1001)

    val plainLeft = sorted(left.join(right, Seq("k"), "left"))
    val saltedLeft = sorted(Skew.saltedJoin(left, right, Seq("k"), 8, "left"))
    assert(saltedLeft === plainLeft)
    assert(plainLeft.length === 1003) // keys 3,4 survive with null rv
  }
}
