package graft.queries


import org.apache.spark.sql.functions._

import graft.normalize.{Coerce, JsonIngest, NormalizeConfig, Normalizer, RootIdType}
import graft.normalize.Flatten

/** Normalize-plane operators (SURVEY.md §2.4) demonstrated on the driver
  * tables, each with a DuckDB oracle: JSON flatten, list explode → child
  * table with propagated root key + `_dlt_list_idx`, naming normalization,
  * hex coercion, deterministic row ids (rows-only).
  */
object NormalizeQueries {

  private val cfg = NormalizeConfig(loadId = "1700000000.0")

  /** DuckDB re-derivation of every naming-convention chain (the same
    * regex/translate steps `NamingConventions.*.normalizeColumn` run in
    * Spark), built per ident prefix via lateral column aliases. */
  private def namingConventionsOracle: String = {
    def steps(p: String, src: String): String =
      s"""
         |    regexp_replace(translate(trim($src), '+-*@|', 'x_xal'),
         |      '[^a-zA-Z0-9_]', '_', 'g') AS ${p}_s1,
         |    lower(regexp_replace(regexp_replace(${p}_s1,
         |      '([^_])([A-Z][a-z]+)', '\\1_\\2', 'g'),
         |      '([a-z0-9])([A-Z])', '\\1_\\2', 'g')) AS ${p}_s3,
         |    CASE WHEN regexp_matches(${p}_s3, '^[0-9]')
         |      THEN '_' || ${p}_s3 ELSE ${p}_s3 END AS ${p}_s4,
         |    rtrim(${p}_s4, '_') || repeat('x',
         |      length(${p}_s4) - length(rtrim(${p}_s4, '_'))) AS ${p}_s5,
         |    regexp_replace(${p}_s5, '_{2,}', '_', 'g') AS ${p}_snake,
         |    regexp_replace(translate(trim($src),
         |      chr(10) || chr(13) || '"', '___'),
         |      '_{2,}', '_', 'g') AS ${p}_duck,
         |    translate(trim($src),
         |      chr(10) || chr(13) || '''' || '"' || '▶',
         |      '_____') AS ${p}_direct,
         |    regexp_replace(trim($src), '[^a-zA-Z0-9_]+', '_', 'g') AS ${p}_c1,
         |    CASE WHEN regexp_matches(${p}_c1, '^[0-9]')
         |      THEN '_' || ${p}_c1 ELSE ${p}_c1 END AS ${p}_c2,
         |    CASE WHEN ${p}_c2 = '_' THEN ${p}_c2
         |      ELSE regexp_replace(${p}_c2, '_+$$', '') END AS ${p}_c3,
         |    regexp_replace(${p}_c3, '_{2,}', '_', 'g') AS ${p}_sqlcs,
         |    lower(${p}_sqlcs) AS ${p}_sqlci""".stripMargin
    s"""WITH ids AS (
       |  SELECT n_name || '+Key_' || CAST(n_nationkey AS VARCHAR)
       |      || ' 1"x__Y' AS ident_a,
       |    CAST(n_nationkey AS VARCHAR) || n_name || ' Go_' AS ident_b
       |  FROM nation
       |), steps AS (
       |  SELECT ident_a, ident_b,${steps("a", "ident_a")},${steps("b", "ident_b")}
       |  FROM ids
       |)
       |SELECT ident_a, ident_b,
       |  a_snake, a_duck, a_direct, a_sqlcs, a_sqlci,
       |  b_snake, b_duck, b_direct, b_sqlcs, b_sqlci
       |FROM steps ORDER BY ident_a""".stripMargin
  }

  val defs: Map[String, Q] = Map(
    // JSON string column → inferred struct → flattened `props__k`
    "norm_flatten_json" -> q { c =>
      val parsed = JsonIngest.parseColumn(c.t("events").select("event_id", "props"), "props")
      Flatten(parsed).select("event_id", "props__k").orderBy("event_id")
    },

    // nested document (order + items list) → child table with
    // _dlt_list_idx and root-key propagation
    "norm_explode_child" -> q { c =>
      val li = c.t("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(struct(
          col("l_linenumber"), col("l_quantity")))).as("items"))
      val doc = c.t("orders")
        .join(li, col("o_orderkey") === col("l_orderkey"), "inner")
        .select(col("o_orderkey"), col("o_orderstatus"), col("items"))
      val tables = Normalizer.normalize(doc, "orders_doc",
        cfg.copy(propagate = Map("o_orderkey" -> "order_key")))
      tables("orders_doc__items")
        .select("order_key", "_dlt_list_idx", "l_linenumber", "l_quantity")
        .orderBy("order_key", "_dlt_list_idx")
    },

    // naming convention applied to raw identifiers
    "norm_naming" -> q { c =>
      Flatten(c.t("region").select(
        col("r_regionkey").as("Region Key"),
        col("r_name").as("1Name")))
        .orderBy("region_key")
    },

    // the PLUGGABLE naming conventions (reference duck_case / direct /
    // sql_cs_v1 / sql_ci_v1 alongside snake_case), exercised VALUE-LEVEL
    // over data-derived identifiers: each convention's normalizeColumn is
    // the distributed form (identifiers arriving as data — EAV feeds,
    // ingested schema registries), and the oracle re-derives every chain
    // in DuckDB SQL, so the gate hash-pins all five normalization tables
    "norm_naming_conventions" -> q { c =>
      import graft.schema.NamingConventions._
      val ids = c.t("nation").select(
        concat(col("n_name"), lit("+Key_"), col("n_nationkey").cast("string"),
          lit(" 1\"x__Y")).as("ident_a"),
        concat(col("n_nationkey").cast("string"), col("n_name"),
          lit(" Go_")).as("ident_b"))
      def norms(p: String, ident: org.apache.spark.sql.Column) = Seq(
        SnakeCase.normalizeColumn(ident).as(s"${p}_snake"),
        DuckCase.normalizeColumn(ident).as(s"${p}_duck"),
        Direct.normalizeColumn(ident).as(s"${p}_direct"),
        SqlCsV1.normalizeColumn(ident).as(s"${p}_sqlcs"),
        SqlCiV1.normalizeColumn(ident).as(s"${p}_sqlci"))
      ids.select(col("ident_a") +: col("ident_b") +:
          (norms("a", col("ident_a")) ++ norms("b", col("ident_b"))): _*)
        .orderBy("ident_a")
    },

    // text→bigint coercion over '0x…' hex values round-trips p_size
    "norm_coerce_hex" -> q { c =>
      c.t("part")
        .withColumn("hex_text", concat(lit("0x"), hex(col("p_size"))))
        .select(col("p_partkey"),
          Coerce.textToBigint(col("hex_text")).as("coerced"))
        .orderBy("p_partkey")
    },

    // type autodetection on untyped text columns (detections.py analog):
    // all-ISO dates → DateType, all-integers → LongType, mixed stays text
    "norm_autodetect" -> q { c =>
      val untyped = c.t("orders").select(
        col("o_orderkey").cast("string").as("key_txt"),
        col("o_orderdate").cast("string").as("date_txt"),
        col("o_orderpriority").as("prio_txt"))
      graft.schema.Detections.autodetect(untyped)
        .orderBy("key_txt")
    },

    // Spark 4 VariantType path for the dlt `json` type: parse once,
    // extract typed fields with variant_get — no inference scan
    "norm_json_variant" -> q { c =>
      val parsed = JsonIngest.parseVariantColumn(
        c.t("events").select("event_id", "props"), "props")
      parsed.select(col("event_id"),
        variant_get(col("props"), "$.k", "bigint").as("k"))
        .orderBy("event_id")
    },

    // deterministic id modes (row_hash + key_hash), HASH-MATCHED: the
    // ids are base64(first 15 bytes of sha256(to_json(sorted payload)))
    // — every step re-derivable in DuckDB SQL, so the oracle recomputes
    // them from scratch (same portability move as dedup_simhash); only
    // the `random` mode stays uncheckable by construction
    "norm_row_hash_ids" -> q { c =>
      val src = c.t("documents").select("doc_id", "lang", "source")
      val rh = Normalizer.normalize(src, "documents",
          cfg.copy(rootIdType = RootIdType.RowHash))("documents")
        .select(col("doc_id"), col("_dlt_id").as("row_hash_id"))
      val kh = Normalizer.normalize(src, "documents",
          cfg.copy(rootIdType = RootIdType.KeyHash(Seq("doc_id"))))("documents")
        .select(col("doc_id"), col("_dlt_id").as("key_hash_id"))
      rh.join(kh, "doc_id").orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "norm_flatten_json" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS props__k
        |FROM events ORDER BY event_id""".stripMargin,
    "norm_explode_child" ->
      """SELECT l_orderkey AS order_key,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_quantity) - 1 AS INT) AS _dlt_list_idx,
        |  l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders)
        |ORDER BY order_key, _dlt_list_idx""".stripMargin,
    "norm_naming" ->
      """SELECT r_regionkey AS region_key, r_name AS _1_name
        |FROM region ORDER BY region_key""".stripMargin,
    "norm_coerce_hex" ->
      """SELECT p_partkey, CAST(p_size AS BIGINT) AS coerced
        |FROM part ORDER BY p_partkey""".stripMargin,
    "norm_naming_conventions" -> namingConventionsOracle,
    "norm_json_variant" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "norm_autodetect" ->
      """SELECT o_orderkey AS key_txt, CAST(o_orderdate AS DATE) AS date_txt,
        |  o_orderpriority AS prio_txt
        |FROM orders ORDER BY key_txt""".stripMargin,
    // re-derives both deterministic id modes from first principles:
    // base64(first 15 bytes of sha256(to_json of the sorted payload
    // struct)) — DuckDB and Spark render this JSON identically for
    // non-null BIGINT/VARCHAR fields
    "norm_row_hash_ids" ->
      """SELECT doc_id,
        |  to_base64(from_hex(substr(sha256(to_json(struct_pack(
        |    doc_id := doc_id, lang := lang, source := source
        |  ))::VARCHAR), 1, 30))) AS row_hash_id,
        |  to_base64(from_hex(substr(sha256(to_json(struct_pack(
        |    doc_id := doc_id
        |  ))::VARCHAR), 1, 30))) AS key_hash_id
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
