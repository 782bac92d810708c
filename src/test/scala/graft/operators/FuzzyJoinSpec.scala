package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q-gram count filter must lose NOTHING the exact verify would
  * keep — recall is the whole contract. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq(
    (1L, "spark"), (2L, "spork"), (3L, "sparks"), (4L, "shark"),
    (5L, "quartz"), (6L, "quarts"), (7L, "completely"), (8L, "different"),
    (9L, "differant"), (10L, "sprk")
  ).toDF("id", "s")

  private def brute(k: Int) =
    words.as("a").join(words.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s")).as("dist"))
      .filter(col("dist") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("self-join equals brute force at k = 1 and k = 2") {
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.selfJoin(words, "id", "s", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === brute(k), s"k=$k")
    }
  }

  test("two-table join finds cross matches with exact distances") {
    val left = Seq((1L, "margarine"), (2L, "volatile")).toDF("lid", "ls")
    val right = Seq((7L, "margarins"), (8L, "volatile"), (9L, "unrelated"))
      .toDF("rid", "rs")
    val got = FuzzyJoin.join(left, "lid", "ls", right, "rid", "rs", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 7L, 1), (2L, 8L, 0)))
  }

  test("short strings below the gram bound pair via the value branch") {
    // "ab"/"ac" share ZERO bigrams yet are within k=1 — the count
    // filter cannot see them (bound <= 0); the distinct-value branch
    // must. Single-char strings (no grams at all) included.
    val short = Seq((1L, "ab"), (2L, "ac"), (3L, "ab"), (4L, "a"),
      (5L, "b"), (6L, "xyz")).toDF("id", "s")
    val got = FuzzyJoin.selfJoin(short, "id", "s", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = short.as("a").join(short.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
    assert(got.contains((1L, 2L, 1)), "the zero-shared-gram pair")
    assert(got.contains((4L, 5L, 1)), "the no-gram pair")
  }

  test("blocking restricts matches to equal block values, long and short") {
    val df = Seq(
      (1L, "spark", "x"), (2L, "spork", "x"), (3L, "spark", "y"),
      (4L, "ab", "x"), (5L, "ac", "x"), (6L, "ab", "y")
    ).toDF("id", "s", "blk")
    val got = FuzzyJoin.selfJoin(df, "id", "s", k = 1,
        blockCol = Some("blk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1-2 (long, same block), 4-5 (short, same block); NEVER 1-3 or
    // 4-6 despite distance 0 — they live in different blocks
    assert(got === Set((1L, 2L), (4L, 5L)))
    // unblocked, the cross-block exact dups appear
    val open = FuzzyJoin.selfJoin(df, "id", "s", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(open.contains((1L, 3L)) && open.contains((4L, 6L)))
  }

  test("candidates come from the gram equi-join, never a cartesian") {
    val plan = FuzzyJoin.selfJoin(words, "id", "s", k = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must stay candidate-restricted:\n$plan")
  }
}
