package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational query plane (SURVEY.md §2.6) expressed directly on
  * DataFrames. dlt delegates this algebra to the destination engine via
  * sqlglot/ibis (reference: dlt/dataset/relation.py:66, dlt/helpers/ibis.py);
  * here Spark IS the destination engine, so each operator is the native
  * Catalyst primitive.
  *
  * Exact-match conventions (the driver hash-compares against DuckDB):
  *  - double sums are cast per-row to decimal before aggregation
  *    (order-independent, engine-independent arithmetic);
  *  - aggregate outputs are emitted as SCALED BIGINT (x100 for 2-decimal
  *    money, x1e6 for 6-decimal revenue) on BOTH sides — DECIMAL-typed
  *    outputs hash differently across engines (scale/trailing-zero
  *    rendering), integers never do. The decimal accumulation stays
  *    internal to the aggregate; only the output representation changes;
  *  - timestamps are never emitted raw (events.ts is ns in parquet, Spark
  *    truncates to micros) — emit unix_millis / dates instead;
  *  - every query ends in a deterministic ORDER BY.
  */
object RelationalQueries {

  val defs: Map[String, Q] = Map(
    // --- scan / project / filter (relation.py:325-335, 476-587) ---
    "rel_select_project" -> q { c =>
      c.t("lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },
    "rel_filter_ops" -> q { c =>
      c.t("orders")
        .filter(col("o_orderstatus").isin("F", "O") &&
          col("o_totalprice") > 1000.0 &&
          col("o_custkey") =!= 5L &&
          !col("o_orderpriority").isin("1-URGENT"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // --- grouped aggregation (delegated in dlt; native groupBy here) ---
    "rel_agg_groupby" -> q { c =>
      c.t("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(col("l_quantity").cast("decimal(18,2)")) * 100).cast("long").as("sum_qty"),
          (sum(col("l_extendedprice").cast("decimal(18,2)")) * 100).cast("long").as("sum_base_price"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
            * 1000000).cast("long").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    "rel_agg_minmax" -> q { c =>
      c.t("orders")
        .groupBy("o_orderstatus")
        .agg(
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          countDistinct("o_custkey").as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    },
    "rel_agg_having" -> q { c =>
      c.t("lineitem")
        .groupBy("l_suppkey")
        .agg((sum(col("l_quantity").cast("decimal(18,2)")) * 100).cast("long").as("total_qty"))
        .filter(col("total_qty") > 40000L)
        .orderBy("l_suppkey")
    },

    // --- joins (relation.py:361-440; Catalyst picks the physical join) ---
    "rel_join_inner" -> q { c =>
      c.t("lineitem")
        .join(c.t("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
            * 1000000).cast("long").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },
    "rel_join_left" -> q { c =>
      c.t("customer")
        .join(c.t("orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },
    "rel_join_semi" -> q { c =>
      c.t("customer")
        .join(c.t("orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    "rel_join_anti" -> q { c =>
      c.t("customer")
        .join(c.t("orders").filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    // 5-way star join; dims are broadcast (small at any SF — nation/region
    // are fixed-size), fact tables shuffle on the join key.
    "rel_join_multi" -> q { c =>
      c.t("lineitem")
        .join(c.t("orders"), col("l_orderkey") === col("o_orderkey"))
        .join(c.t("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(c.t("nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(c.t("region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
            * 1000000).cast("long").as("revenue"))
        .orderBy("r_name")
    },

    // --- window functions (dlt only has ROW_NUMBER inside merge dedup,
    //     sql_jobs.py:316-323; full surface is native here) ---
    "rel_window_rownum" -> q { c =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      c.t("orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
    "rel_window_running" -> q { c =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.t("events")
        .withColumn("running_value",
          (sum(col("value").cast("decimal(18,2)")).over(w) * 100).cast("long"))
        .filter(col("user_id") < 20)
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    },
    "rel_window_rank" -> q { c =>
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
      c.t("part")
        .withColumn("price_rank", rank().over(w))
        .withColumn("price_dense_rank", dense_rank().over(w))
        .filter(col("price_rank") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "price_rank", "price_dense_rank")
        .orderBy("p_brand", "price_rank", "p_partkey")
    },
    "rel_window_lag_lead" -> q { c =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      c.t("events")
        .filter(col("user_id") < 10)
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .select("user_id", "event_id", "event_type", "prev_type", "next_type")
        .orderBy("user_id", "event_id")
    },

    // --- order / limit (relation.py:312-359) ---
    "rel_orderby_limit" -> q { c =>
      c.t("orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // --- set operations (delegated in dlt; native here) ---
    "rel_union_all" -> q { c =>
      val cust = c.t("customer").select(col("c_nationkey").as("nationkey"))
        .withColumn("side", lit("customer"))
      val supp = c.t("supplier").select(col("s_nationkey").as("nationkey"))
        .withColumn("side", lit("supplier"))
      cust.unionAll(supp)
        .groupBy("nationkey", "side").agg(count(lit(1)).as("n"))
        .orderBy("nationkey", "side")
    },
    "rel_intersect" -> q { c =>
      c.t("customer").select(col("c_nationkey").as("nationkey"))
        .intersect(c.t("supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },
    "rel_except" -> q { c =>
      import c.spark.implicits._
      c.t("events").select(col("event_type"))
        .except(Seq("click", "view").toDF("event_type"))
        .orderBy("event_type")
    },
    "rel_distinct" -> q { c =>
      c.t("events").select("event_type").distinct().orderBy("event_type")
    },

    // --- rollup / cube / grouping sets ---
    // Also exercises the raw-SQL passthrough plane (dataset.query(sql),
    // dataset.py:228-262 — here `spark.sql` over temp views).
    "rel_rollup" -> q { c =>
      c.t("nation").createOrReplaceTempView("g_nation")
      c.t("region").createOrReplaceTempView("g_region")
      c.spark.sql(
        """SELECT r_name AS region_name, n_name AS nation_name, COUNT(*) AS n
          |FROM g_nation JOIN g_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY region_name NULLS FIRST, nation_name NULLS FIRST""".stripMargin)
    },
    "rel_cube" -> q { c =>
      c.t("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    "rel_grouping_sets" -> q { c =>
      c.t("orders").createOrReplaceTempView("gs_orders")
      c.spark.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          |FROM gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },
    "rel_pivot" -> q { c =>
      c.t("orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    },

    // --- scalar function surface (string / date / math / conditional) ---
    "rel_scalar_string" -> q { c =>
      c.t("part")
        .filter(col("p_name").like("%gear%") || col("p_name").startsWith("red"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_masked"))
        .orderBy("p_partkey")
    },
    "rel_scalar_date" -> q { c =>
      c.t("orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          to_date(date_trunc("month", col("o_orderdate"))).as("o_month_start"),
          to_date(col("o_orderdate")).as("o_date"))
        .orderBy("o_orderkey")
    },
    "rel_scalar_math" -> q { c =>
      c.t("lineitem")
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // the product has exactly <= 4 decimals; quantize to decimal
          // BEFORE rounding so half-way cases round identically in
          // every engine (double round() is binary-representation-
          // sensitive at .xx5 boundaries); emit as cents (x100 BIGINT)
          // for representation-stable hashing
          (round((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"), 2) * 100)
            .cast("long").as("disc_amount"),
          abs(col("l_quantity") - 25.0).as("qty_dev"),
          ceil(col("l_quantity")).as("qty_ceil"),
          floor(col("l_quantity")).as("qty_floor"),
          pmod(col("l_orderkey"), lit(7L)).as("key_mod"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    "rel_case_when" -> q { c =>
      c.t("orders")
        .withColumn("price_band",
          when(col("o_totalprice") < 1000, "low")
            .when(col("o_totalprice") < 10000, "mid")
            .otherwise("high"))
        .groupBy("price_band")
        .agg(count(lit(1)).as("n"))
        .orderBy("price_band")
    },

    // --- subquery shapes ---
    "rel_subquery_scalar" -> q { c =>
      val orders = c.t("orders")
      val threshold = orders.agg(max("o_totalprice").as("m"))
      orders.crossJoin(broadcast(threshold))
        .filter(col("o_totalprice") > col("m") * 0.9)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // --- exact interpolated quantiles (delegated to the engine in dlt;
    // the shared (n-1)·q interpolation definition, computed DISTRIBUTED
    // via graft.operators.Percentiles — Spark's own `percentile`
    // aggregate buffers a per-group value map on one reducer, the one
    // memory-concentration plan this engine refuses; outputs are
    // quantized to scaled BIGINT for representation-stable hashing) ---
    "rel_percentile" -> q { c =>
      import graft.operators.Percentiles, Percentiles.QuantileSpec
      Percentiles.groupQuantiles(c.t("lineitem"), Seq("l_returnflag"), Seq(
          QuantileSpec("l_extendedprice", 0.5, "med_raw"),
          QuantileSpec("l_extendedprice", 0.95, "p95_raw"),
          QuantileSpec("l_quantity", 0.25, "q1_raw")))
        .select(col("l_returnflag"),
          (col("med_raw").cast("decimal(18,4)") * 10000).cast("long").as("med_price"),
          (col("p95_raw").cast("decimal(18,4)") * 10000).cast("long").as("p95_price"),
          (col("q1_raw").cast("decimal(18,4)") * 10000).cast("long").as("q1_qty"))
        .orderBy("l_returnflag")
    },

    // --- row_counts (dataset.py:305-360 — UNION ALL of per-table counts) ---
    "rel_row_counts" -> q { c =>
      Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
        .map(n => c.t(n).agg(count(lit(1)).as("row_count"))
          .withColumn("table_name", lit(n))
          .select("table_name", "row_count"))
        .reduce(_ unionAll _)
        .orderBy("table_name")
    }
  )

  // Scaled-integer aggregate renderings: accumulate in exact decimal, emit
  // BIGINT (x100 / x1e6) so both engines hash identical bytes.
  private def dec2(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) * 100 AS BIGINT)"
  private def dec6(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) * 1000000 AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "rel_select_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "rel_filter_ops" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus IN ('F','O') AND o_totalprice > 1000.0
        |  AND o_custkey <> 5 AND o_orderpriority NOT IN ('1-URGENT')
        |ORDER BY o_orderkey""".stripMargin,
    "rel_agg_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dec2("l_quantity")} AS sum_qty,
         |  ${dec2("l_extendedprice")} AS sum_base_price,
         |  ${dec6("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_agg_minmax" ->
      """SELECT o_orderstatus, MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "rel_agg_having" ->
      s"""SELECT l_suppkey, ${dec2("l_quantity")} AS total_qty
         |FROM lineitem GROUP BY l_suppkey
         |HAVING ${dec2("l_quantity")} > 40000 ORDER BY l_suppkey""".stripMargin,
    "rel_join_inner" ->
      s"""SELECT o_orderpriority,
         |  ${dec6("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "rel_join_left" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "rel_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "rel_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "rel_join_multi" ->
      s"""SELECT r_name,
         |  ${dec6("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "rel_window_rownum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "rel_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT)
        |    AS running_value
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,
    "rel_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, price_rank, price_dense_rank
        |FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    RANK() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
        |    DENSE_RANK() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS price_dense_rank
        |  FROM part) WHERE price_rank <= 2
        |ORDER BY p_brand, price_rank, p_partkey""".stripMargin,
    "rel_window_lag_lead" ->
      """SELECT user_id, event_id, event_type,
        |  LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type,
        |  LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |FROM events WHERE user_id < 10 ORDER BY user_id, event_id""".stripMargin,
    "rel_orderby_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "rel_union_all" ->
      """SELECT nationkey, side, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier)
        |GROUP BY nationkey, side ORDER BY nationkey, side""".stripMargin,
    "rel_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "rel_except" ->
      """SELECT event_type FROM events
        |EXCEPT
        |SELECT * FROM (VALUES ('click'), ('view')) AS t(event_type)
        |ORDER BY event_type""".stripMargin,
    "rel_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "rel_rollup" ->
      """SELECT r_name AS region_name, n_name AS nation_name, COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region_name NULLS FIRST, nation_name NULLS FIRST""".stripMargin,
    "rel_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${dec2("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "rel_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "rel_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "rel_scalar_string" ->
      """SELECT p_partkey, UPPER(p_name) AS name_upper, LENGTH(p_name) AS name_len,
        |  SUBSTRING(p_name, 1, 5) AS name_pfx,
        |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS name_masked
        |FROM part WHERE p_name LIKE '%gear%' OR p_name LIKE 'red%'
        |ORDER BY p_partkey""".stripMargin,
    "rel_scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |  CAST(MONTH(o_orderdate) AS INT) AS o_month,
        |  CAST(DAY(o_orderdate) AS INT) AS o_day,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS o_month_start,
        |  CAST(o_orderdate AS DATE) AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "rel_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)), 2) * 100
        |    AS BIGINT) AS disc_amount,
        |  ABS(l_quantity - 25.0) AS qty_dev,
        |  CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "rel_case_when" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'low'
        |  WHEN o_totalprice < 10000 THEN 'mid' ELSE 'high' END AS price_band,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY price_band""".stripMargin,
    "rel_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.9
        |ORDER BY o_orderkey""".stripMargin,
    "rel_percentile" ->
      """SELECT l_returnflag,
        |  CAST(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(18,4))
        |    * 10000 AS BIGINT) AS med_price,
        |  CAST(CAST(quantile_cont(l_extendedprice, 0.95) AS DECIMAL(18,4))
        |    * 10000 AS BIGINT) AS p95_price,
        |  CAST(CAST(quantile_cont(l_quantity, 0.25) AS DECIMAL(18,4))
        |    * 10000 AS BIGINT) AS q1_qty
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "rel_row_counts" ->
      """SELECT * FROM (
        |  SELECT 'region' AS table_name, COUNT(*) AS row_count FROM region
        |  UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |  UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |  UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |  UNION ALL SELECT 'part', COUNT(*) FROM part
        |  UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |  UNION ALL SELECT 'events', COUNT(*) FROM events
        |  UNION ALL SELECT 'documents', COUNT(*) FROM documents
        |  UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings)
        |ORDER BY table_name""".stripMargin
  )
}
