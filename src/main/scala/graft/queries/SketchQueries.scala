package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.Dsir
import graft.operators.Sketches

/** Sketch-plane queries: mergeable HLL / KMV / CMS rollups
  * ([[graft.operators.Sketches]]) and DSIR importance selection
  * ([[graft.ext.Dsir]]). Every sketch here is md5-deterministic, so the
  * DuckDB oracle replays the REGISTERS/counters exactly — the gate
  * covers the whole estimate path, not just an error band. */
object SketchQueries {

  val defs: Map[String, Q] = Map(
    // HLL distinct-users rollup: daily sketches per event type, merged
    // (max per register) to per-type totals, then estimated — the
    // estimate after the merge hash-matches the oracle's direct
    // computation, proving the rollup path is lossless
    "ops_hll_rollup" -> q { c =>
      val ev = c.t("events")
      val daily = Sketches.hllRegisters(
        ev.withColumn("day", expr("ts div 86400000000000")),
        Seq("event_type", "day"), "user_id", m = 64)
      val merged = Sketches.hllMerge(daily.drop("day"), Seq("event_type"))
      val est = Sketches.hllEstimate(merged, Seq("event_type"), m = 64)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exact, Seq("event_type")).orderBy("event_type")
    },

    // KMV bottom-64 sketches per event type; pairwise Jaccard overlap
    // of the user sets estimated purely from the sketch rows
    "ops_kmv_overlap" -> q { c =>
      val sk = Sketches.kmv(c.t("events"), Seq("event_type"), "user_id",
        k = 64)
      Sketches.kmvJaccard(sk, "event_type", k = 64).orderBy("ga", "gb")
    },

    // count-min frequency estimates for the top-10 users: est >= exact
    // always (collisions only add); registers replayed by the oracle
    "ops_cms_freq" -> q { c =>
      val ev = c.t("events")
      val counters = Sketches.cmsCounters(ev, "user_id",
        depth = 4, width = 256)
      val top = graft.ext.Dedup.pin(
        ev.select(col("user_id").cast("string").as("key"))
          .groupBy("key").agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("key")).limit(10))
      Sketches.cmsEstimate(counters, top, depth = 4, width = 256)
        .join(top, Seq("key"))
        .select("key", "exact_n", "cms_est")
        .orderBy(col("exact_n").desc, col("key"))
    },

    // sample-sketch quantiles: median price per return flag estimated
    // from a deterministic 10% row sample (the mergeable / replayable
    // quantile sketch), gated both ways — the sample is hash-exact AND
    // the estimate must land inside the exact p45..p55 rank band
    "ops_sample_quantile" -> q { c =>
      import graft.operators.Percentiles, Percentiles.QuantileSpec
      val li = c.t("lineitem")
      val key = concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))
      val sk = Sketches.sampleSketch(li,
        Seq("l_returnflag", "l_extendedprice"), key, rate = 0.1)
      val est = Percentiles.groupQuantiles(sk, Seq("l_returnflag"),
        Seq(QuantileSpec("l_extendedprice", 0.5, "est_raw")))
      val exact = Percentiles.groupQuantiles(li, Seq("l_returnflag"), Seq(
        QuantileSpec("l_extendedprice", 0.45, "lo_raw"),
        QuantileSpec("l_extendedprice", 0.5, "med_raw"),
        QuantileSpec("l_extendedprice", 0.55, "hi_raw")))
      est.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          (col("est_raw").cast("decimal(18,4)") * 10000).cast("long")
            .as("est_med_e4"),
          (col("med_raw").cast("decimal(18,4)") * 10000).cast("long")
            .as("exact_med_e4"),
          (col("est_raw") >= col("lo_raw") && col("est_raw") <= col("hi_raw"))
            .as("within_rank_band"))
        .orderBy("l_returnflag")
    },

    // PSI distribution drift between two loads: even-key orders are the
    // baseline, odd-key orders arrive with a deterministic 25% price
    // lift on a quarter of rows — the value-drift check schema
    // contracts cannot see; per-bin terms and the exact-decimal total
    // all re-derived by the oracle
    "ops_drift_psi" -> q { c =>
      val o = c.t("orders")
      val base = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_totalprice").cast("double").as("v"))
      val cur = o.filter(col("o_orderkey") % 2 === 1)
        .select((col("o_totalprice").cast("double") *
          when(pmod(col("o_orderkey"), lit(4)) === 1, lit(1.25))
            .otherwise(lit(1.0))).as("v"))
      graft.operators.Drift.psi(base, cur, "v", bins = 10)
    },

    // per-COLUMN drift profile in one melted pass: the whole-load drift
    // report over three columns — o_totalprice gets the same
    // deterministic 25% lift as ops_drift_psi (drifts), o_custkey stays
    // stable, and a CONSTANT column exercises the degenerate
    // equality-binning branch cross-engine; every per-column psi
    // re-derived by the oracle through the shared bin/smooth/decimal-Σ
    // semantics
    "ops_drift_profile" -> q { c =>
      val o = c.t("orders")
      val cols = Seq("o_custkey", "o_flat", "o_totalprice")
      val base = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_flat", lit(7.0))
        .select(cols.map(col): _*)
      val cur = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_custkey"), lit(7.0).as("o_flat"),
          (col("o_totalprice").cast("double") *
            when(pmod(col("o_orderkey"), lit(4)) === 1, lit(1.25))
              .otherwise(lit(1.0))).as("o_totalprice"))
      graft.operators.Drift.psiProfile(base, cur, cols, bins = 10)
    },

    // Bloom membership sketch: set-bit table built over the OLD half's
    // canonical fingerprints, probed by the NEW half — a miss is a
    // definitive "never seen" (the corpus untouched), a hit falls back
    // to the exact lookup; the gate carries both the sketch verdict and
    // the exact membership so the one-sided-error contract is checked
    // row by row
    "ops_bloom_filter" -> q { c =>
      import graft.ext.TextOps
      val docs = c.t("documents")
      val fp = docs.select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
      val bits = Sketches.bloomBits(
        fp.filter(col("doc_id") < 250), "fp", m = 2048, k = 4)
      val probes = fp.filter(col("doc_id") >= 250)
      val verdicts = Sketches.bloomMightContain(bits, probes, "fp",
        m = 2048, k = 4)
      val oldFps = fp.filter(col("doc_id") < 250)
        .select(col("fp")).distinct().withColumn("__in", lit(1))
      probes.join(verdicts, Seq("fp"))
        .join(oldFps, Seq("fp"), "left")
        .select(col("doc_id"), col("might_contain"),
          col("__in").isNotNull.as("actual"))
        .orderBy("doc_id")
    },

    // one-pass table profile (the Deequ/describe analog): per-column
    // counts, nulls, lexicographic min/max, decimal-exact mean, and an
    // HLL distinct estimate from ONE melted scan + two aggregations
    "ops_profile_table" -> q { c =>
      // tw: the melt is compute-dense (5x string casts + hashes per
      // row) and the single-row-group testdata scan would otherwise
      // serialize it on one core (see Tables.loadWide)
      graft.operators.Profile.profile(c.tw("lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_quantity",
          "l_returnflag", "l_linestatus"), hllM = 256)
    },

    // DSIR (Xie et al. 2023): select the 100 non-English docs whose
    // hashed unigram+bigram distribution best matches the English
    // target slice — the domain-match selection step of a pretraining
    // mixture
    "text_dsir_select" -> q { c =>
      // single-corpus path: one tokenize+hash pass with the target flag
      // carried through the feature aggregation (identical math/output
      // to featurizing the two slices separately)
      Dsir.selectByPredicate(c.tw("documents", "doc_id", "lang", "text"),
        "doc_id", "text",
        isTarget = col("lang") === "en", m = 1024, k = 100)
    },

    // the PLUGGABLE feature space (r14): same DSIR selection under the
    // CHARACTER-TRIGRAM space — the (Spark column, DuckDB mirror) pair
    // travels with the space, so the oracle is the SAME builder with
    // the space's grams CTE swapped in (the classifier feature-pack
    // extensibility contract, applied to distributions). A divergent
    // gram multiset between the engine's extractor and its SQL mirror
    // hash-fails.
    "text_dsir_custom" -> q { c =>
      Dsir.selectByPredicate(c.tw("documents", "doc_id", "lang", "text"),
        "doc_id", "text",
        isTarget = col("lang") === "en", m = 1024, k = 100,
        space = Dsir.CharTrigrams)
    }
  )

  /** THE ungrouped DuckDB PSI re-derivation: the bin/smooth/decimal-Σ
    * CTE chain (b, c, st, bb, cb, grid, m, tt, tm, tot) over the two
    * caller-supplied `SELECT … AS v` sides — one implementation of the
    * cross-engine PSI semantics (shared with `plane_drift_quarantine`),
    * so the degenerate-baseline branch and the smoothing can never
    * drift apart between oracles. Mirrors [[graft.operators.Drift.psi]]
    * exactly: clamp-before-cast binning, equality binning when
    * mx = mn, Laplace (cnt+0.5)/(n+0.5·bins), DECIMAL(28,12) Σ. */
  /** `rangeSql` (optional): a separate `SELECT … AS v` source for the
    * bin RANGE (mn/mx) — the PROFILED drift gate pins its range at
    * seed time while counts keep folding in, so its oracle ranges over
    * load 1 alone while binning loads 1∪2 (clamped, like the engine). */
  private[queries] def psiOracleCtes(baseSql: String, curSql: String,
      bins: Int, rangeSql: Option[String] = None): String = {
    val top = bins - 1
    def binCte(name: String, from: String, cnt: String) =
      s"""$name AS (
         |  SELECT CASE WHEN mx > mn
         |    THEN CAST(least($top, greatest(0,
         |      floor((v - mn) / ((mx - mn) / $bins)))) AS INT)
         |    ELSE (CASE WHEN v = mn THEN 0 ELSE $top END) END AS bin,
         |    count(*) AS $cnt
         |  FROM $from, st GROUP BY 1)""".stripMargin
    s"""b AS ($baseSql),
       |c AS ($curSql),
       |st AS (SELECT min(v) AS mn, max(v) AS mx
       |       FROM ${rangeSql.map(r => s"($r) rr").getOrElse("b")}),
       |${binCte("bb", "b", "n_base")},
       |${binCte("cb", "c", "n_cur")},
       |grid AS (SELECT unnest(generate_series(0, $top)) AS bin),
       |m AS (
       |  SELECT g.bin, coalesce(n_base, 0) AS n_base,
       |    coalesce(n_cur, 0) AS n_cur
       |  FROM grid g LEFT JOIN bb ON g.bin = bb.bin
       |  LEFT JOIN cb ON g.bin = cb.bin),
       |tt AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM m),
       |tm AS (
       |  SELECT bin, n_base, n_cur, (p - q) * ln(p / q) AS term
       |  FROM (
       |    SELECT m.bin, n_base, n_cur,
       |      (n_base + 0.5) / (tb + 0.5 * $bins) AS p,
       |      (n_cur + 0.5) / (tc + 0.5 * $bins) AS q
       |    FROM m, tt)),
       |tot AS (
       |  SELECT round(sum(term::DECIMAL(28,12))::DOUBLE, 6) AS psi FROM tm)""".stripMargin
  }

  /** The even/odd-lifted orders fixture both drift oracles bin. */
  private[queries] val driftBaseSql: String =
    """SELECT o_totalprice::DOUBLE AS v FROM orders
      |  WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL""".stripMargin
  private[queries] val driftCurSql: String =
    """SELECT o_totalprice::DOUBLE *
      |    (CASE WHEN o_orderkey % 4 = 1 THEN 1.25 ELSE 1.0 END) AS v
      |  FROM orders
      |  WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL""".stripMargin

  val oracles: Map[String, String] = Map(
    "ops_drift_psi" ->
      s"""WITH ${psiOracleCtes(driftBaseSql, driftCurSql, 10)}
         |SELECT bin, n_base, n_cur, round(term, 6) AS term, psi
         |FROM tm, tot ORDER BY bin""".stripMargin,

    "ops_drift_profile" ->
      """WITH b AS (
        |  SELECT 'o_custkey' AS "column", o_custkey::DOUBLE AS v
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_custkey IS NOT NULL
        |  UNION ALL SELECT 'o_flat', 7.0
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL SELECT 'o_totalprice', o_totalprice::DOUBLE
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
        |c AS (
        |  SELECT 'o_custkey' AS "column", o_custkey::DOUBLE AS v
        |  FROM orders WHERE o_orderkey % 2 = 1 AND o_custkey IS NOT NULL
        |  UNION ALL SELECT 'o_flat', 7.0
        |  FROM orders WHERE o_orderkey % 2 = 1
        |  UNION ALL SELECT 'o_totalprice', o_totalprice::DOUBLE *
        |    (CASE WHEN o_orderkey % 4 = 1 THEN 1.25 ELSE 1.0 END)
        |  FROM orders WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL),
        |st AS (SELECT "column", min(v) AS mn, max(v) AS mx FROM b GROUP BY 1),
        |bb AS (
        |  SELECT b."column", CASE WHEN mx > mn
        |    THEN CAST(least(9, greatest(0,
        |      floor((v - mn) / ((mx - mn) / 10)))) AS INT)
        |    ELSE (CASE WHEN v = mn THEN 0 ELSE 9 END) END AS bin,
        |    count(*) AS n_base
        |  FROM b JOIN st USING ("column") GROUP BY 1, 2),
        |cb AS (
        |  SELECT c."column", CASE WHEN mx > mn
        |    THEN CAST(least(9, greatest(0,
        |      floor((v - mn) / ((mx - mn) / 10)))) AS INT)
        |    ELSE (CASE WHEN v = mn THEN 0 ELSE 9 END) END AS bin,
        |    count(*) AS n_cur
        |  FROM c JOIN st USING ("column") GROUP BY 1, 2),
        |grid AS (
        |  SELECT st."column", g.bin
        |  FROM st, (SELECT unnest(generate_series(0, 9)) AS bin) g),
        |m AS (
        |  SELECT grid."column", grid.bin,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM grid
        |  LEFT JOIN bb ON grid."column" = bb."column" AND grid.bin = bb.bin
        |  LEFT JOIN cb ON grid."column" = cb."column" AND grid.bin = cb.bin),
        |tt AS (
        |  SELECT "column", sum(n_base) AS tb, sum(n_cur) AS tc
        |  FROM m GROUP BY 1),
        |tm AS (
        |  SELECT "column", (p - q) * ln(p / q) AS term FROM (
        |    SELECT m."column",
        |      (n_base + 0.5) / (tb + 0.5 * 10) AS p,
        |      (n_cur + 0.5) / (tc + 0.5 * 10) AS q
        |    FROM m JOIN tt USING ("column")))
        |SELECT "column", round(sum(term::DECIMAL(28,12))::DOUBLE, 6) AS psi
        |FROM tm GROUP BY "column" ORDER BY "column"""".stripMargin,

    "ops_bloom_filter" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |bits AS (
        |  SELECT DISTINCT
        |    ('0x' || substr(md5(j || '#' || fp), 1, 8))::BIGINT % 2048 AS bit
        |  FROM f, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) g
        |  WHERE doc_id < 250),
        |pb AS (
        |  SELECT doc_id, fp,
        |    ('0x' || substr(md5(j || '#' || fp), 1, 8))::BIGINT % 2048 AS bit
        |  FROM f, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) g
        |  WHERE doc_id >= 250),
        |mc AS (
        |  SELECT doc_id, count(b.bit) = 4 AS might_contain
        |  FROM pb LEFT JOIN bits b ON pb.bit = b.bit
        |  GROUP BY doc_id),
        |o AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250)
        |SELECT p.doc_id, mc.might_contain, (o.fp IS NOT NULL) AS actual
        |FROM (SELECT doc_id, fp FROM f WHERE doc_id >= 250) p
        |JOIN mc USING (doc_id)
        |LEFT JOIN o USING (fp)
        |ORDER BY doc_id""".stripMargin,

    "ops_hll_rollup" ->
      """WITH h AS (
        |  SELECT event_type, user_id, md5(user_id::VARCHAR) AS hx
        |  FROM events),
        |regs AS (
        |  SELECT event_type,
        |    ('0x' || substr(hx, 1, 3))::BIGINT % 64 AS register,
        |    max(33 - length(ltrim(bin(('0x' || substr(hx, 4, 8))::BIGINT), '0'))) AS rank
        |  FROM h GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, count(*) AS present,
        |    sum(power(0.5, rank)) AS s_hit, 64 - count(*) AS zeros
        |  FROM regs GROUP BY 1),
        |est AS (
        |  SELECT event_type, present, zeros,
        |    0.709 * 64 * 64 / (s_hit + zeros) AS raw_e
        |  FROM agg)
        |SELECT e.event_type, e.present,
        |  round(CASE WHEN raw_e <= 160.0 AND zeros > 0
        |    THEN 64.0 * ln(64.0 / zeros) ELSE raw_e END, 2) AS estimate,
        |  x.exact_users
        |FROM est e JOIN (
        |  SELECT event_type, count(DISTINCT user_id) AS exact_users
        |  FROM events GROUP BY 1) x USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "ops_kmv_overlap" ->
      """WITH sk AS (
        |  SELECT event_type, h FROM (
        |    SELECT event_type, h,
        |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |    FROM (SELECT DISTINCT event_type,
        |            ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS h
        |          FROM events))
        |  WHERE rn <= 64),
        |pairs AS (
        |  SELECT a.event_type AS ga, b.event_type AS gb
        |  FROM (SELECT DISTINCT event_type FROM sk) a,
        |       (SELECT DISTINCT event_type FROM sk) b
        |  WHERE a.event_type < b.event_type),
        |u AS (
        |  SELECT p.ga, p.gb, s.h,
        |    max(CASE WHEN s.event_type = p.ga THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN s.event_type = p.gb THEN 1 ELSE 0 END) AS in_b
        |  FROM pairs p JOIN sk s ON s.event_type IN (p.ga, p.gb)
        |  GROUP BY 1, 2, 3),
        |ku AS (
        |  SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
        |  FROM u)
        |SELECT ga, gb, count(*) AS k_union,
        |  sum(in_a * in_b)::BIGINT AS n_shared,
        |  round(sum(in_a * in_b)::DOUBLE / count(*), 6) AS jaccard_est
        |FROM ku WHERE rn <= 64
        |GROUP BY 1, 2 ORDER BY ga, gb""".stripMargin,

    "ops_cms_freq" ->
      """WITH c AS (
        |  SELECT j,
        |    ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR), 1, 8))::BIGINT
        |      % 256 AS idx,
        |    count(*) AS cnt
        |  FROM (SELECT user_id, unnest([0, 1, 2, 3]) AS j FROM events)
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT user_id::VARCHAR AS key, count(*) AS exact_n
        |  FROM events GROUP BY 1
        |  ORDER BY exact_n DESC, key LIMIT 10),
        |probes AS (
        |  SELECT key, exact_n, j,
        |    ('0x' || substr(md5(j::VARCHAR || ':' || key), 1, 8))::BIGINT
        |      % 256 AS idx
        |  FROM (SELECT key, exact_n, unnest([0, 1, 2, 3]) AS j FROM top))
        |SELECT key, exact_n, min(cnt)::BIGINT AS cms_est
        |FROM probes JOIN c USING (j, idx)
        |GROUP BY 1, 2 ORDER BY exact_n DESC, key""".stripMargin,

    "ops_profile_table" ->
      """WITH m AS (
        |  SELECT 'l_orderkey' AS "column", l_orderkey::VARCHAR AS s,
        |    l_orderkey::DOUBLE AS x FROM lineitem
        |  UNION ALL SELECT 'l_linenumber', l_linenumber::VARCHAR,
        |    l_linenumber::DOUBLE FROM lineitem
        |  UNION ALL SELECT 'l_quantity', l_quantity::VARCHAR,
        |    l_quantity FROM lineitem
        |  UNION ALL SELECT 'l_returnflag', l_returnflag, NULL FROM lineitem
        |  UNION ALL SELECT 'l_linestatus', l_linestatus, NULL FROM lineitem),
        |base AS (
        |  SELECT "column", count(*) AS n_rows,
        |    count(*) - count(s) AS n_nulls,
        |    min(s) AS min_str, max(s) AS max_str,
        |    round(sum(x::DECIMAL(28,12))::DOUBLE / count(x), 6) AS mean
        |  FROM m GROUP BY 1),
        |regs AS (
        |  SELECT "column",
        |    ('0x' || substr(md5(s), 1, 3))::BIGINT % 256 AS register,
        |    max(33 - length(ltrim(bin(('0x' || substr(md5(s), 4, 8))::BIGINT), '0'))) AS rank
        |  FROM m WHERE s IS NOT NULL GROUP BY 1, 2),
        |agg AS (
        |  SELECT "column", count(*) AS present,
        |    sum(power(0.5, rank)) AS s_hit, 256 - count(*) AS zeros
        |  FROM regs GROUP BY 1),
        |est AS (
        |  SELECT "column",
        |    round(CASE WHEN raw_e <= 640.0 AND zeros > 0
        |      THEN 256.0 * ln(256.0 / zeros) ELSE raw_e END, 2) AS distinct_est
        |  FROM (SELECT *, (0.7213 / (1 + 1.079 / 256)) * 256 * 256
        |          / (s_hit + zeros) AS raw_e FROM agg))
        |SELECT b."column", n_rows, n_nulls, distinct_est, min_str, max_str, mean
        |FROM base b JOIN est USING ("column")
        |ORDER BY "column"""".stripMargin,

    "ops_sample_quantile" ->
      """WITH sk AS (
        |  SELECT l_returnflag, l_extendedprice FROM lineitem
        |  WHERE ('0x' || substr(md5(l_orderkey::VARCHAR || '-'
        |      || l_linenumber::VARCHAR), 1, 8))::BIGINT < 429496730),
        |est AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.5) AS est_raw
        |  FROM sk GROUP BY 1),
        |ex AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.45) AS lo_raw,
        |    quantile_cont(l_extendedprice, 0.5) AS med_raw,
        |    quantile_cont(l_extendedprice, 0.55) AS hi_raw
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |  CAST(CAST(est_raw AS DECIMAL(18,4)) * 10000 AS BIGINT) AS est_med_e4,
        |  CAST(CAST(med_raw AS DECIMAL(18,4)) * 10000 AS BIGINT) AS exact_med_e4,
        |  est_raw >= lo_raw AND est_raw <= hi_raw AS within_rank_band
        |FROM est JOIN ex USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "text_dsir_select" -> dsirOracleSql(graft.ext.Dsir.UnigramBigram),
    "text_dsir_custom" -> dsirOracleSql(graft.ext.Dsir.CharTrigrams)
  )

  /** DuckDB replay of [[graft.ext.Dsir.selectByPredicate]] under an
    * arbitrary [[graft.ext.Dsir.GramSpace]] (target = lang 'en',
    * m = 1024, k = 100): the space contributes its grams CTE, the
    * model math (Laplace-smoothed log-ratios, decimal-exact term sums,
    * total-count normalizer) is the fixed part — one builder, so the
    * default and custom spaces cannot drift apart. */
  private def dsirOracleSql(space: graft.ext.Dsir.GramSpace): String =
    s"""WITH grams AS (
       |  ${space.gramsCteSql}),
       |feats AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS b,
       |    count(*) AS cnt
       |  FROM grams GROUP BY 1, 2, 3),
       |ct AS (SELECT b, sum(cnt) AS ct FROM feats WHERE lang = 'en' GROUP BY 1),
       |cq AS (SELECT b, sum(cnt) AS cq FROM feats WHERE lang != 'en' GROUP BY 1),
       |tot AS (SELECT
       |  (SELECT sum(cnt) FROM feats WHERE lang = 'en') AS t_tot,
       |  (SELECT sum(cnt) FROM feats WHERE lang != 'en') AS q_tot),
       |terms AS (
       |  SELECT f.doc_id, f.cnt,
       |    (f.cnt * (ln(coalesce(ct.ct, 0) + 1) - ln(cq.cq + 1)))::DECIMAL(28,12) AS term
       |  FROM feats f JOIN cq USING (b) LEFT JOIN ct USING (b)
       |  WHERE f.lang != 'en')
       |SELECT doc_id, n_grams, weight FROM (
       |  SELECT doc_id, sum(cnt)::BIGINT AS n_grams,
       |    round(sum(term)::DOUBLE
       |      + sum(cnt) * (ln(q_tot + 1024) - ln(t_tot + 1024)), 6) AS weight
       |  FROM terms, tot GROUP BY doc_id, q_tot, t_tot)
       |ORDER BY weight DESC, doc_id LIMIT 100""".stripMargin
}
