package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}

/** Beyond-reference relational operators (as-of join, range join) —
  * the alignment algebra a training-data/event pipeline needs that
  * neither core Spark nor the reference ships as an operator. Gated
  * against DuckDB's native ASOF JOIN / inequality join, so the driver
  * hash-compares the custom formulations against an independent engine.
  *
  * `events.ts` is TIMESTAMP(NANOS) parquet: Spark reads epoch-nanos
  * longs (nanosAsLong); both sides quantize to shared-precision
  * epoch-micros before any comparison (see [[tsUs]]).
  */
object OpsQueries {

  private val FiveMinUs = 300000000L

  /** events.ts as epoch-MICROS: DuckDB truncates TIMESTAMP(NANOS) to its
    * microsecond TIMESTAMP on read, so micros is the precision both
    * engines share exactly (`ts div 1000` ≡ `epoch_us(ts)`). */
  private def tsUs(c: String) = expr(s"`$c` div 1000")

  val defs: Map[String, Q] = Map(
    // fuzzy (edit-distance) self-join on customer names: q-gram
    // count-filter candidates (Gravano'01, provably no lost pairs),
    // exact levenshtein verify on candidates only — never all-pairs.
    // The oracle computes ground truth directly (the input face is
    // small), so the filter's full recall is checked, not assumed
    "ops_fuzzy_join" -> q { c =>
      val names = c.t("customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey").as("id"), col("c_name").as("s"))
      graft.operators.FuzzyJoin.selfJoin(names, "id", "s", k = 1)
        .orderBy("id_a", "id_b")
    },

    // ENTITY RESOLUTION composition: fuzzy name match (k=1) blocked on
    // nation → one pair graph → connected components → consolidated
    // canonical records (size, best balance, canonical name) — the
    // master-data pipeline built purely from gated operators; the
    // oracle replays brute-force matching + the recursive closure
    "ops_entity_resolution" -> q { c =>
      val cust = c.t("customer").filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("id"), col("c_name").as("s"),
          col("c_nationkey").as("nat"), col("c_acctbal").as("acct"))
      // GENUINE blocking: nation rides the candidate join keys, so
      // cross-nation pairs never reach the count filter or the verify
      val pairs = graft.operators.FuzzyJoin.selfJoin(cust, "id", "s",
        k = 1, blockCol = Some("nat"))
        .select("id_a", "id_b")
      graft.operators.ConnectedComponents.componentsAuto(pairs,
          "id_a", "id_b", idCol = "id")
        .join(cust, "id")
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"), max("acct").as("best_acct"),
          min("s").as("canonical_name"))
        .orderBy("component")
    },

    // importance sampling ∝ document length (quality-weighted corpus
    // downsample): engine-exact membership — decimal-exact mean, pure
    // double threshold arithmetic, integer md5 bucket compare
    "ops_weighted_sample" -> q { c =>
      graft.operators.HashSplit.weightedSample(
        c.tw("documents").withColumn("w", length(col("text")).cast("double")),
        "doc_id", "w", target = 0.3)
        .select("doc_id").orderBy("doc_id")
    },

    // for each purchase, the user's latest click at-or-before it.
    // Right side pre-aggregated per (user, ts) so the asof pick is
    // engine-independent under ts collisions.
    "ops_asof_join" -> q { c =>
      val ev = c.t("events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), tsUs("ts").as("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(tsUs("ts").as("r_ts"), col("user_id")).agg(
          max("event_id").as("r_id"),
          max_by(col("value"), col("event_id")).as("r_value"))
      AsofJoin.backward(purchases, clicks, Seq("user_id"), "ts", "r_ts")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("matched_r_id").as("r_id"), col("matched_r_value").as("r_value"),
          col("matched_r_ts").as("r_ts"))
        .orderBy("event_id")
    },

    // purchases landing inside the 5-minute window after each error —
    // a pure interval containment (no equi-key), via the binned
    // equi-join path, never a BroadcastNestedLoopJoin
    "ops_range_join" -> q { c =>
      val ev = c.t("events")
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), tsUs("ts").as("s"),
          (tsUs("ts") + FiveMinUs).as("e"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), tsUs("ts").as("pts"))
      RangeJoin.pointsInIntervals(purchases, incidents, "pts", "s", "e",
        binWidth = FiveMinUs)
        .select("incident_id", "purchase_id", "pts")
        .orderBy("incident_id", "purchase_id")
    },

    // interval×interval OVERLAP join (no equi-key): error windows vs
    // signup windows; binned equi-join with first-shared-bin dedup —
    // never a BroadcastNestedLoopJoin, never a distinct over the output
    "ops_interval_overlap" -> q { c =>
      val ev = c.t("events")
      def win(t: String, idAs: String, sAs: String, eAs: String, len: Long) =
        ev.filter(col("event_type") === t)
          .select(col("event_id").as(idAs), tsUs("ts").as(sAs),
            (tsUs("ts") + len).as(eAs))
      val errors = win("error", "error_id", "es", "ee", 2 * FiveMinUs)
      val signups = win("signup", "signup_id", "ss", "se", 3 * FiveMinUs)
      RangeJoin.intervalsOverlap(errors, signups, "es", "ee", "ss", "se",
        binWidth = FiveMinUs)
        .select("error_id", "signup_id", "es", "ss")
        .orderBy("error_id", "signup_id")
    },

    // concat-and-chunk sequence packing over the documents corpus: the
    // global token prefix-sum runs as a two-level distributed prefix
    // sum (per-bucket windows + a tiny bucket-total window), never a
    // single-partition window over the data
    "ops_sequence_pack" -> q { c =>
      val docs = c.t("documents").select(col("doc_id"),
        graft.ext.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.SequencePack.chunkAssignments(docs, "doc_id", "n_tokens",
        budget = 512, bucketSize = 64)
        .select("doc_id", "n_tokens", "tok_offset", "first_chunk", "last_chunk")
        .orderBy("doc_id")
    },

    // deterministic epoch shuffle for training order: seeded-md5 global
    // permutation via the two-level rank (256 hash buckets ranked in
    // parallel + ONE 256-row offset window — never a corpus-wide
    // single-partition window). Two epochs prove independent
    // permutations; the lang-staged column proves curriculum order
    // (stage-major, shuffled within stage). Pure function of
    // (seed, epoch, id): task retries and plan recomputation can never
    // shift a rank, unlike rand()-keyed shuffles
    "ops_epoch_shuffle" -> q { c =>
      import graft.operators.TrainingOrder
      val docs = c.t("documents").select("doc_id", "lang")
      val e1 = TrainingOrder.epochShuffle(docs, "doc_id",
          seed = 42L, epoch = 1)
        .select(col("doc_id"), col("shuffle_rank").as("rank_e1"))
      val e2 = TrainingOrder.epochShuffle(docs, "doc_id",
          seed = 42L, epoch = 2)
        .select(col("doc_id"), col("shuffle_rank").as("rank_e2"))
      val cur = TrainingOrder.epochShuffle(docs, "doc_id",
          seed = 42L, epoch = 1, stages = Seq("lang"))
        .select(col("doc_id"), col("shuffle_rank").as("rank_curriculum"))
      e1.join(e2, "doc_id").join(cur, "doc_id").orderBy("doc_id")
    },

    // gap-based sessionization (30-min inactivity) — batch analog of
    // session_window, one shuffle on the key, tie-safe RANGE frame
    "ops_sessionize" -> q { c =>
      val ev = c.t("events")
        .select(col("user_id"), col("event_id"), tsUs("ts").as("ts"))
      graft.operators.Sessionize.assign(ev, Seq("user_id"), "ts",
        gap = 1800000000L)
        .orderBy("event_id")
    },

    // time-series resample: hourly buckets per event type, DENSIFIED
    // (empty hours emitted as 0) + a trailing 3-bucket moving average
    // over the regular grid
    "ops_resample_fill" -> q { c =>
      val ev = c.t("events")
      val dense = graft.operators.Resample.denseCounts(
        ev, "event_type", "ts", width = 3600000000000L)
      graft.operators.Resample.withMovingAvg(dense, "event_type", lookback = 2)
        .orderBy("event_type", "bucket")
    },

    // stratified deterministic sampling — the training-mix dial: keep
    // all rare-language docs, downsample the dominant language; the
    // rate lookup compiles to a literal CASE, membership stays a pure
    // content-hash projection (no rand(), no shuffle)
    "ops_stratified_sample" -> q { c =>
      val docs = c.t("documents")
      graft.operators.HashSplit.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.25, "zh" -> 1.0, "es" -> 0.5), defaultRate = 0.75)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },

    // source-mix equalization: every lang downsampled to ~the smallest
    // lang's size; rates derived from the data, membership still a pure
    // content-hash function (reproducible across runs and partitionings)
    "ops_mix_equalize" -> q { c =>
      graft.operators.HashSplit.equalizeMix(c.t("documents"), "doc_id", "lang")
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },

    // temperature-smoothed source mixing (XLM-R α-sampling as a
    // downsample): kept counts follow n^α; α=0.5 here, realized as
    // rate = sqrt(min_n / n) per lang through the same md5 membership
    "ops_mix_temperature" -> q { c =>
      graft.operators.HashSplit.temperatureMix(c.t("documents"), "doc_id",
          "lang", alpha = 0.5)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },

    // per-domain cap (RefinedWeb/C4 host-level limit): at most 20 docs
    // per source, highest n_chars first, id tie-break
    "ops_domain_cap" -> q { c =>
      graft.operators.HashSplit.domainCap(c.t("documents"), "doc_id",
          "source", cap = 20, rankBy = "n_chars")
        .groupBy("source").agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("source")
    },

    // HLL approximate distinct vs exact: the estimate is deterministic
    // (hash-based, order-independent merge), the gate asserts the
    // published error bound holds (rsd 0.02 → well inside 5%)
    "ops_approx_distinct" -> q { c =>
      c.t("events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.05).as("within_5pct"))
        .orderBy("event_type")
    },

    // deterministic train/val/test assignment + nested downsample —
    // pure content-hash projections (no rand(), no shuffle)
    "ops_hash_split" -> q { c =>
      val docs = c.t("documents")
      val split = graft.operators.HashSplit.assign(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val sampled = graft.operators.HashSplit.sample(docs, "doc_id", 0.25)
        .select(col("doc_id"), lit(true).as("in_quarter"))
      split.join(sampled, Seq("doc_id"), "left")
        .select(col("doc_id"), col("split"),
          coalesce(col("in_quarter"), lit(false)).as("in_quarter"))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "ops_fuzzy_join" ->
      """WITH n AS (
        |  SELECT c_custkey AS id, c_name AS s FROM customer
        |  WHERE c_custkey <= 200)
        |SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.s, b.s) AS dist
        |FROM n a JOIN n b ON a.id < b.id
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "ops_entity_resolution" ->
      """WITH RECURSIVE n AS (
        |  SELECT c_custkey AS id, c_name AS s, c_nationkey AS nat,
        |    c_acctbal AS acct
        |  FROM customer WHERE c_custkey <= 300),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b FROM n a JOIN n b
        |  ON a.id < b.id AND a.nat = b.nat AND levenshtein(a.s, b.s) <= 1),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.b AS id, r.r FROM reach r JOIN edges e ON e.a = r.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT component, count(*)::BIGINT AS n_members,
        |  max(acct) AS best_acct, min(s) AS canonical_name
        |FROM comp JOIN n USING (id)
        |GROUP BY component ORDER BY component""".stripMargin,

    "ops_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, length(text)::DOUBLE AS wt FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |m AS (
        |  SELECT (sum(wt::DECIMAL(28,12))::DOUBLE) / count(*) AS mw FROM w)
        |SELECT doc_id FROM w, m
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      < least(1.0, 0.3 * wt / mw) * 4294967296.0
        |ORDER BY doc_id""".stripMargin,

    "ops_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS r_ts, max(event_id) AS r_id,
        |    arg_max(value, event_id) AS r_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id, p.ts, c.r_id, c.r_value, c.r_ts
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.r_ts
        |ORDER BY p.event_id""".stripMargin,

    "ops_range_join" ->
      """WITH i AS (
        |  SELECT event_id AS incident_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 300000000 AS e
        |  FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT event_id AS purchase_id, epoch_us(ts) AS pts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT incident_id, purchase_id, pts
        |FROM p JOIN i ON pts BETWEEN s AND e
        |ORDER BY incident_id, purchase_id""".stripMargin,

    "ops_interval_overlap" ->
      """WITH e AS (
        |  SELECT event_id AS error_id, epoch_us(ts) AS es,
        |    epoch_us(ts) + 600000000 AS ee
        |  FROM events WHERE event_type = 'error'),
        |s AS (
        |  SELECT event_id AS signup_id, epoch_us(ts) AS ss,
        |    epoch_us(ts) + 900000000 AS se
        |  FROM events WHERE event_type = 'signup')
        |SELECT error_id, signup_id, es, ss
        |FROM e JOIN s ON es <= se AND ss <= ee
        |ORDER BY error_id, signup_id""".stripMargin,

    "ops_sequence_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    (CASE WHEN length(trim(text)) = 0 THEN 0
        |          ELSE len(string_split_regex(trim(text), '\s+')) END)::BIGINT
        |      AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    -- ::BIGINT: DuckDB window sums are HUGEINT, which the
        |    -- driver's hasher distinguishes from Spark's BIGINT even
        |    -- when every value is identical (round-2 hash fail)
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      AS tok_offset
        |  FROM d)
        |SELECT doc_id, n_tokens, tok_offset,
        |  (tok_offset // 512)::BIGINT AS first_chunk,
        |  ((tok_offset + greatest(n_tokens, 1) - 1) // 512)::BIGINT AS last_chunk
        |FROM o ORDER BY doc_id""".stripMargin,

    "ops_epoch_shuffle" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |e1 AS (
        |  SELECT doc_id, (row_number() OVER (
        |    ORDER BY md5('42:1:' || doc_id::VARCHAR), doc_id) - 1)::BIGINT
        |      AS rank_e1
        |  FROM d),
        |e2 AS (
        |  SELECT doc_id, (row_number() OVER (
        |    ORDER BY md5('42:2:' || doc_id::VARCHAR), doc_id) - 1)::BIGINT
        |      AS rank_e2
        |  FROM d),
        |cur AS (
        |  SELECT doc_id, (row_number() OVER (
        |    ORDER BY lang, md5('42:1:' || doc_id::VARCHAR), doc_id) - 1)::BIGINT
        |      AS rank_curriculum
        |  FROM d)
        |SELECT doc_id, rank_e1, rank_e2, rank_curriculum
        |FROM e1 JOIN e2 USING (doc_id) JOIN cur USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "ops_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS b
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT user_id, event_id, ts,
        |  -- ::BIGINT: window sum is HUGEINT in DuckDB (see ops_sequence_pack)
        |  (sum(b) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)::BIGINT
        |    AS session_seq
        |FROM m ORDER BY event_id""".stripMargin,

    "ops_resample_fill" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS bucket
        |  FROM events),
        |c AS (SELECT event_type, bucket, count(*) AS n FROM e GROUP BY 1, 2),
        |b AS (SELECT event_type, min(bucket) b0, max(bucket) b1
        |      FROM e GROUP BY 1),
        |grid AS (
        |  SELECT event_type, unnest(generate_series(b0, b1)) AS bucket FROM b),
        |f AS (
        |  SELECT g.event_type, g.bucket, coalesce(n, 0) AS n
        |  FROM grid g LEFT JOIN c ON g.event_type = c.event_type
        |    AND g.bucket = c.bucket)
        |SELECT event_type, bucket, n,
        |  CAST(CAST(avg(n) OVER (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(18,6))
        |    * 1000000 AS BIGINT) AS ma_e6
        |FROM f ORDER BY event_type, bucket""".stripMargin,

    // per-stratum thresholds are round(rate * 2^32)
    "ops_stratified_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS bkt
        |  FROM documents)
        |SELECT lang, count(*) AS n_kept FROM b
        |WHERE bkt < CASE lang
        |  WHEN 'en' THEN 1073741824
        |  WHEN 'zh' THEN 4294967296
        |  WHEN 'es' THEN 2147483648
        |  ELSE 3221225472 END
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    "ops_mix_equalize" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT min(n) AS min_n FROM n),
        |b AS (
        |  SELECT d.lang,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS bkt,
        |    n.n, m.min_n
        |  FROM documents d JOIN n ON d.lang IS NOT DISTINCT FROM n.lang, m)
        |SELECT lang, count(*) AS n_kept FROM b
        |WHERE bkt < round(min_n::DOUBLE / n * 4294967296)
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    // rate = sqrt(min_n/n): both engines' pow/sqrt are IEEE doubles over
    // identical count ratios, so the threshold rounds identically
    "ops_mix_temperature" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT min(n) AS min_n FROM n),
        |b AS (
        |  SELECT d.lang,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS bkt,
        |    n.n, m.min_n
        |  FROM documents d JOIN n ON d.lang IS NOT DISTINCT FROM n.lang, m)
        |SELECT lang, count(*) AS n_kept FROM b
        |WHERE bkt < round(pow(min_n::DOUBLE / n, 0.5) * 4294967296)
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    "ops_domain_cap" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |SELECT source, count(*) AS n_kept, sum(n_chars)::BIGINT AS sum_chars
        |FROM r WHERE rn <= 20
        |GROUP BY 1 ORDER BY source""".stripMargin,

    // the oracle asserts the same exact counts and that the HLL bound
    // held on the Spark side (within_5pct must come back all-true)
    "ops_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  true AS within_5pct
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // thresholds are round(cumWeight * 2^32) — 0.8/0.9/0.25 of 2^32
    "ops_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS bkt
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN bkt < 3435973837 THEN 'train'
        |       WHEN bkt < 3865470566 THEN 'val' ELSE 'test' END AS split,
        |  bkt < 1073741824 AS in_quarter
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
