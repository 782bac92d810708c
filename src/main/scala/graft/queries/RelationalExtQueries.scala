package graft.queries

import org.apache.spark.sql.functions._

/** Second relational-surface pack: unpivot/melt, correlated LATERAL
  * subqueries, EXISTS/NOT EXISTS, array aggregation + array functions,
  * and regex extraction — the remaining query shapes a reference user
  * writes through the dataset SQL plane (`dataset.query(sql)`,
  * reference dlt/dataset/dataset.py:228-262). SQL-shaped operators
  * (lateral, exists) run through `spark.sql` over temp views to
  * exercise the raw-SQL passthrough path; the rest are native
  * DataFrame operators. Oracle conventions as in [[RelationalQueries]]
  * (scaled-BIGINT renderings, total-order sorts).
  */
object RelationalExtQueries {

  val defs: Map[String, Q] = Map(
    // --- unpivot / melt (wide metrics → long) ---
    "rel_unpivot" -> q { c =>
      c.t("lineitem")
        .filter(col("l_orderkey") < 50)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .select(col("l_orderkey"), col("l_linenumber"), col("metric"),
          (col("value").cast("decimal(18,4)") * 10000).cast("long").as("value_e4"))
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },

    // --- correlated LATERAL subquery: top-2 orders per customer.
    // Catalyst decorrelates to a ranked window join — no per-row
    // re-execution of the inner query (that is the point at scale) ---
    "rel_lateral" -> q { c =>
      c.t("customer").createOrReplaceTempView("g_customer")
      c.t("orders").createOrReplaceTempView("g_orders")
      c.spark.sql(
        """SELECT c_custkey, o_orderkey,
          |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
          |FROM g_customer,
          |LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM g_orders
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
          |WHERE c_custkey < 50
          |ORDER BY c_custkey, price_c DESC, o_orderkey""".stripMargin)
    },

    // --- correlated EXISTS / NOT EXISTS (compile to semi/anti joins) ---
    "rel_exists" -> q { c =>
      c.t("customer").createOrReplaceTempView("g_customer")
      c.t("orders").createOrReplaceTempView("g_orders")
      c.spark.sql(
        """SELECT c_custkey, c_name FROM g_customer
          |WHERE EXISTS (
          |  SELECT 1 FROM g_orders
          |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          |AND NOT EXISTS (
          |  SELECT 1 FROM g_orders
          |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
          |ORDER BY c_custkey""".stripMargin)
    },

    // --- array aggregation + array functions (collect_set / sort /
    // join / contains / element_at), emitted as scalars so the hash
    // compare is list-rendering-independent ---
    "rel_array_agg" -> q { c =>
      c.t("orders")
        .groupBy("o_orderstatus")
        .agg(array_sort(collect_set(col("o_orderpriority"))).as("prios"))
        .select(
          col("o_orderstatus"),
          size(col("prios")).as("n_prios"),
          array_join(col("prios"), ",").as("prios_csv"),
          array_contains(col("prios"), "1-URGENT").as("has_urgent"),
          element_at(col("prios"), 1).as("first_prio"),
          array_join(slice(col("prios"), 2, 2), ",").as("mid_prios"))
        .orderBy("o_orderstatus")
    },

    // --- FULL OUTER join: per-day purchase vs error activity; either
    // side may be absent (null-filled) ---
    "rel_join_full" -> q { c =>
      val ev = c.t("events")
      def daily(t: String, as: String) = ev
        .filter(col("event_type") === t)
        .groupBy(expr("ts DIV 86400000000000").as(s"${as}_day"))
        .agg(count(lit(1)).as(s"n_$as"))
      daily("purchase", "p").join(daily("error", "e"),
          col("p_day") === col("e_day"), "full_outer")
        .select(coalesce(col("p_day"), col("e_day")).as("day"),
          coalesce(col("n_p"), lit(0L)).as("n_purchases"),
          coalesce(col("n_e"), lit(0L)).as("n_errors"))
        .orderBy("day")
    },

    // --- distribution window functions: ntile / percent_rank /
    // cume_dist over order values per status ---
    "rel_window_stats" -> q { c =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      c.t("orders")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).as("quartile"),
          (percent_rank().over(w).cast("decimal(18,6)") * 1000000)
            .cast("long").as("pct_rank_e6"),
          (cume_dist().over(w).cast("decimal(18,6)") * 1000000)
            .cast("long").as("cume_dist_e6"))
        .orderBy("o_orderkey")
    },

    // --- null-handling scalar pack over an outer join's null side ---
    "rel_null_funcs" -> q { c =>
      val cust = c.t("customer")
      val big = c.t("orders").filter(col("o_totalprice") > 400000)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big"),
          max("o_totalprice").as("max_big"))
      cust.join(big, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          coalesce(col("n_big"), lit(0L)).as("n_big"),
          nvl2(col("n_big"), lit("whale"), lit("minnow")).as("segment"),
          nullif(coalesce(col("n_big"), lit(0L)), lit(0L)).as("n_or_null"),
          (coalesce(col("max_big"), lit(0.0)).cast("decimal(18,2)") * 100)
            .cast("long").as("max_c"),
          isnull(col("max_big")).as("no_big"))
        .orderBy("c_custkey")
    },

    // --- string-distance pack: levenshtein over nation-name pairs ---
    "rel_edit_distance" -> q { c =>
      val a = c.t("nation").select(col("n_nationkey").as("ka"),
        col("n_name").as("na"))
      val b = c.t("nation").select(col("n_nationkey").as("kb"),
        col("n_name").as("nb"))
      a.join(b, col("ka") < col("kb"))
        .select(col("ka"), col("kb"),
          levenshtein(col("na"), col("nb")).as("dist"))
        .filter(col("dist") <= 4)
        .orderBy("ka", "kb")
    },

    // --- approximate quantile with an error-bound gate: the KLL-style
    // sketch is deterministic; the gate asserts the estimate lands
    // within 2% RANK error of the exact quantile (oracle emits the
    // matching all-true flags) ---
    "rel_approx_quantile" -> q { c =>
      // rank-error check: the approx median must sit between the exact
      // 48th and 52nd percentiles; exact bounds + sketch in ONE
      // aggregation pass (separate aggs would scan the table 3x)
      c.t("lineitem").groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, array(0.48, 0.5, 0.52))").as("ps"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx_med"))
        .select(col("l_returnflag"),
          (element_at(col("ps"), 2).cast("decimal(18,4)") * 10000).cast("long")
            .as("exact_med_e4"),
          (col("approx_med") >= element_at(col("ps"), 1) &&
            col("approx_med") <= element_at(col("ps"), 3))
            .as("within_2pct_rank"))
        .orderBy("l_returnflag")
    },

    // --- regex extraction / backreference replace / rlike filter ---
    "rel_regexp" -> q { c =>
      c.t("part")
        .filter(col("p_name").rlike("^(cold|small) "))
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1)
            .cast("int").as("brand_num"),
          regexp_extract(col("p_name"), "^([a-z]+) ", 1).as("adjective"),
          regexp_replace(col("p_name"), "^([a-z]+) ", "$1-").as("dashed"),
          regexp_count(col("p_type"), lit("O")).as("n_o"))
        .orderBy("p_partkey")
    }
  )

  val oracles: Map[String, String] = Map(
    "rel_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric,
        |  CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS value_e4
        |FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |           FROM lineitem WHERE l_orderkey < 50)
        |  ON l_quantity, l_discount, l_tax
        |  INTO NAME metric VALUE value)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "rel_lateral" ->
      """SELECT c_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
        |FROM customer,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        |WHERE c_custkey < 50
        |ORDER BY c_custkey, price_c DESC, o_orderkey""".stripMargin,

    "rel_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |AND NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "rel_array_agg" ->
      """WITH g AS (
        |  SELECT o_orderstatus,
        |    list_sort(list(DISTINCT o_orderpriority)) AS prios
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus,
        |  len(prios) AS n_prios,
        |  array_to_string(prios, ',') AS prios_csv,
        |  list_contains(prios, '1-URGENT') AS has_urgent,
        |  prios[1] AS first_prio,
        |  array_to_string(prios[2:3], ',') AS mid_prios
        |FROM g ORDER BY o_orderstatus""".stripMargin,

    "rel_join_full" ->
      """WITH p AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS p_day, count(*) AS n_p
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |e AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS e_day, count(*) AS n_e
        |  FROM events WHERE event_type = 'error' GROUP BY 1)
        |SELECT coalesce(p_day, e_day) AS day,
        |  coalesce(n_p, 0) AS n_purchases,
        |  coalesce(n_e, 0) AS n_errors
        |FROM p FULL OUTER JOIN e ON p_day = e_day
        |ORDER BY day""".stripMargin,

    "rel_window_stats" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  CAST(CAST(percent_rank() OVER w AS DECIMAL(18,6)) * 1000000
        |    AS BIGINT) AS pct_rank_e6,
        |  CAST(CAST(cume_dist() OVER w AS DECIMAL(18,6)) * 1000000
        |    AS BIGINT) AS cume_dist_e6
        |FROM orders WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "rel_null_funcs" ->
      """WITH big AS (
        |  SELECT o_custkey, count(*) AS n_big, max(o_totalprice) AS max_big
        |  FROM orders WHERE o_totalprice > 400000 GROUP BY 1)
        |SELECT c_custkey,
        |  coalesce(n_big, 0) AS n_big,
        |  CASE WHEN n_big IS NOT NULL THEN 'whale' ELSE 'minnow' END AS segment,
        |  nullif(coalesce(n_big, 0), 0) AS n_or_null,
        |  CAST(CAST(coalesce(max_big, 0.0) AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS max_c,
        |  max_big IS NULL AS no_big
        |FROM customer LEFT JOIN big ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "rel_edit_distance" ->
      """SELECT a.n_nationkey AS ka, b.n_nationkey AS kb,
        |  levenshtein(a.n_name, b.n_name) AS dist
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |WHERE levenshtein(a.n_name, b.n_name) <= 4
        |ORDER BY ka, kb""".stripMargin,

    "rel_approx_quantile" ->
      """SELECT l_returnflag,
        |  CAST(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(18,4))
        |    * 10000 AS BIGINT) AS exact_med_e4,
        |  true AS within_2pct_rank
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "rel_regexp" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num,
        |  regexp_extract(p_name, '^([a-z]+) ', 1) AS adjective,
        |  regexp_replace(p_name, '^([a-z]+) ', '\1-') AS dashed,
        |  len(regexp_extract_all(p_type, 'O')) AS n_o
        |FROM part WHERE regexp_matches(p_name, '^(cold|small) ')
        |ORDER BY p_partkey""".stripMargin
  )
}
