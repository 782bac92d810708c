package graft.schema

import graft.SparkSpec

/** The pluggable conventions, pinned against the reference's own test
  * examples (tests/common/normalizers/test_naming_duck_case.py,
  * test_naming_sql.py, test_naming_s3_tables.py), plus driver ≡ column
  * agreement for the value-level forms. */
class NamingConventionsSpec extends SparkSpec {
  import spark.implicits._
  import NamingConventions._

  test("duck_case: preserve case + unicode, translate only newline/quote") {
    def n(s: String) = DuckCase.normalizeIdentifier(s)
    // test_naming_duck_case.py:13-27
    assert(n("+1") === "+1")
    assert(n("-1") === "-1")
    assert(n("1-1") === "1-1")
    assert(n("🦚Peacock") === "🦚Peacock")
    assert(n("🦚🦚peacocks") === "🦚🦚peacocks")
    assert(n("A\nB\"C\rD") === "A_B_C_D")
    assert(n("a__b") === "a_b") // __ stays reserved for paths
  }

  test("direct: minimal changes, ▶ separator") {
    def n(s: String) = Direct.normalizeIdentifier(s)
    assert(n("A'B\"C") === "A_B_C")
    assert(n("a+b-c") === "a+b-c") // untouched
    assert(n("Column Name") === "Column Name")
    assert(n("x▶y") === "x_y") // the separator itself is cleaned
    assert(Direct.pathSeparator === "▶")
    assert(Direct.joinPath(Seq("a", "b")) === "a▶b")
  }

  test("sql_cs_v1 / sql_ci_v1: the reference's shared example table") {
    for (c <- Seq(SqlCsV1, SqlCiV1)) {
      def n(s: String) = c.normalizeIdentifier(s)
      // test_naming_sql.py:9-30
      assert(n("event_value") === "event_value")
      assert(n("event value") === "event_value")
      assert(n("event-.!:*<>value") === "event_value")
      assert(n("1event_n'") === "_1event_n")
      assert(n("123event_n'") === "_123event_n")
      assert(n("___a___b") === "_a_b")
      assert(n(" small love potion ") === "small_love_potion")
      assert(n("+-!$*@#=|:") === "_")
      assert(n("_") === "_")
      assert(n("+1") === "_1")
      assert(n("-1") === "_1")
      // "__" strips to "" in the reference; this engine's totality
      // contract maps it to _empty instead of an empty (colliding) name
      assert(n("__") === Naming.EmptyKey)
    }
    // test_naming_sql.py:33-42 — cs preserves casing…
    assert(SqlCsV1.normalizeIdentifier("123BaNaNa") === "_123BaNaNa")
    assert(SqlCsV1.normalizeIdentifier("BANANA") === "BANANA")
    assert(SqlCsV1.normalizeIdentifier("Small Love Potion") === "Small_Love_Potion")
    // …ci lower-cases (test_naming_sql.py:45-56)
    assert(SqlCiV1.normalizeIdentifier("123BaNaNa") === "_123banana")
    assert(SqlCiV1.normalizeIdentifier("BANaNA") === "banana")
    assert(SqlCiV1.normalizeIdentifier("Small Love Potion") === "small_love_potion")
  }

  test("s3_tables: snake_case + 255 cap + no leading underscore on tables") {
    assert(S3Tables.normalizeIdentifier("CamelCase") === "camel_case")
    assert(S3Tables.normalizeTableIdentifier("_hidden_table") === "hidden_table")
    assert(S3Tables.normalizeTableIdentifier("1Table") === "1_table")
    val long = "a" * 400
    assert(S3Tables.normalizeIdentifier(long, maxLength = 1000).length <= 255)
  }

  test("registry resolves every convention by reference module name") {
    for (c <- all) assert(byName(c.name) eq c)
    assert(SnakeCase.normalizeIdentifier("CamelCase") ===
      Naming.normalizeIdentifier("CamelCase"))
    val e = intercept[IllegalArgumentException](byName("nope"))
    assert(e.getMessage.contains("unknown naming convention"))
  }

  test("value-level column form agrees with the driver-side function") {
    // no astral-plane trailing runs: the column form is code-point
    // based, the driver form UTF-16-char based — they agree everywhere
    // except trailing astral runs feeding snake's trailing-x count
    val corpus = Seq(
      "event_value", "Event Value", "event-.!:*<>value", "1event_n'",
      "123BaNaNa", "___a___b", " small love potion ", "+-!$*@#=|:",
      "_", "+1", "-1", "CamelCase99Mix", "HTTPResponse", "a__b",
      "Tail_", "Tail__", "ALL CAPS", "a'b\"c", "A\nB\"C\rD", "x▶y",
      "🦚Peacock", "Ölüber Straße", "col.umn", "  ", "a|b@c+d*e-f",
      // tab/newline PADDING (Scala trim ≤0x20 vs Spark space-only trim)
      // and all-underscore identifiers (sql family strips them to "")
      "a\t", "\tb", " c\n ", "__", "___x___")
    val df = corpus.toDF("ident")
    for (c <- all) {
      val got = df.select(c.normalizeColumn(org.apache.spark.sql.functions
        .col("ident")).as("n")).as[String].collect().toSeq
      val want = corpus.map(s =>
        if (s.trim.isEmpty) Naming.EmptyKey
        else c.normalizeIdentifier(s, maxLength = 10000))
      assert(got === want, s"column ≠ driver for ${c.name}")
    }
  }

  test("Normalizer applies the schema-wide convention to tables, columns, children") {
    import org.apache.spark.sql.functions._
    import graft.normalize.{NormalizeConfig, Normalizer}
    val doc = Seq((1L, Seq(("x", 2L)), "k")).toDF("Root Key", "Line Items", "V")
      .select(col("`Root Key`"),
        transform(col("`Line Items`"), e => struct(
          e.getField("_1").as("Item'Name"), e.getField("_2").as("Qty Count")))
          .as("Line Items"), col("V"))
    val cfg = NormalizeConfig(loadId = "1",
      naming = NamingConventions.DuckCase)
    val tables = Normalizer.normalize(doc, "My Orders", cfg)
    // duck_case preserves case and spaces in table names AND columns
    assert(tables.keySet === Set("My Orders", "My Orders__Line Items"))
    assert(tables("My Orders").columns.contains("Root Key"))
    val child = tables("My Orders__Line Items")
    assert(child.columns.contains("Item'Name"))
    assert(child.columns.contains("Qty Count"))
    assert(child.count() === 1L)
    // the default stays byte-identical snake_case
    val snake = Normalizer.normalize(doc, "My Orders",
      NormalizeConfig(loadId = "1"))
    assert(snake.keySet === Set("my_orders", "my_orders__line_items"))
  }

  test("Flatten honors the convention's identifiers and separator") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, ("x", 2L))).toDF("Outer Key", "Nested Val")
      .select(col("`Outer Key`"), struct(lit("x").as("Inner'Name"),
        lit(2L).as("Deep Count")).as("Nested Val"))
    assert(graft.normalize.Flatten(df).columns.toSeq ===
      Seq("outer_key", "nested_val__inner_name", "nested_val__deep_count"))
    assert(graft.normalize.Flatten(df,
        naming = NamingConventions.Direct).columns.toSeq ===
      Seq("Outer Key", "Nested Val▶Inner_Name", "Nested Val▶Deep Count"))
    assert(graft.normalize.Flatten(df,
        naming = NamingConventions.SqlCsV1).columns.toSeq ===
      Seq("Outer_Key", "Nested_Val__Inner_Name", "Nested_Val__Deep_Count"))
  }
}
