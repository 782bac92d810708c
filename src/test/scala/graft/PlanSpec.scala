package graft

/** Physical-plan regression guards: the properties that keep the engine
  * fast at scale — filter pushdown into the parquet scan, column
  * pruning, dimension broadcasts, whole-stage codegen — asserted on the
  * executed plans of headline queries, so a regression fails the suite
  * instead of silently slowing the bench. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()

  test("multi-join broadcasts the dimension sides") {
    val p = plan("rel_join_multi")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast, not shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("filters are pushed into the parquet scan") {
    val p = plan("rel_select_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)") ||
      p.contains("EqualTo(l_returnflag,R)"), s"expected pushed filters in:\n$p")
  }

  test("projection prunes unread columns at the scan") {
    val p = plan("rel_select_project")
    // lineitem has 16 columns; the scan must not read untouched ones
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"))
    assert(p.contains("ReadSchema"))
  }

  private def codegenPlan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))

  test("aggregation pipeline runs inside whole-stage codegen") {
    assert(codegenPlan("rel_agg_groupby").contains("WholeStageCodegen"))
  }

  test("codegen vector expressions do not break the codegen stage") {
    assert(codegenPlan("dedup_embedding_cosine").contains("WholeStageCodegen"))
  }

  test("asof and range join queries never fall back to nested loops") {
    Seq("ops_asof_join", "ops_range_join", "ops_interval_overlap").foreach { name =>
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name degraded:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name degraded:\n$p")
    }
  }

  test("sequence packing broadcasts the bucket offsets, not the data") {
    val p = plan("ops_sequence_pack")
    assert(p.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$p")
  }

  test("hash split is a pure projection: no shuffle beyond the sort") {
    // everything up to the final presentation sort is exchange-free
    val p = plan("ops_hash_split")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("wide-load re-spread is a pushdown BARRIER: downstream filters " +
      "evaluate above the exchange, at session width") {
    import org.apache.spark.sql.functions._
    // CONTRACT CHANGE (r14): pushdown used to walk through the
    // repartition, landing heavy text-kernel predicates back in the
    // SCAN stage — whose parallelism is row-group-bound (a small
    // driver-written parquet holds 1-2 row groups, unsplittable at any
    // maxPartitionBytes; soak-measured as 2-task 10 s stages dominating
    // the corpus-assembly wall while every post-shuffle stage ran
    // 32-way). loadWide's whole purpose is spreading compute-dense
    // work, so the re-spread now ends in an optimizer barrier
    // (LogicalRDD): the scan stays cheap, filters run post-exchange.
    // The price — losing scan pruning — is bounded by construction:
    // the barrier only fires on under-split (small) inputs; big tables
    // keep the plain columnar scan and full pushdown.
    val df = Tables.loadWide(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select("doc_id", "lang")
    val p = df.queryExecution.executedPlan.toString()
    // the repartition shuffle lives INSIDE the RDD lineage, so the SQL
    // plan is Filter over Scan ExistingRDD — the filter provably
    // evaluates above the spread (nothing below the barrier to push to)
    val fi = p.indexOf("Filter")
    val ei = p.indexOf("ExistingRDD")
    assert(fi >= 0 && ei >= 0 && fi < ei,
      s"the filter must evaluate ABOVE the re-spread barrier:\n$p")
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"),
      s"no filter may reach a parquet scan below the barrier:\n$p")
    assert(df.rdd.getNumPartitions >=
        spark.sparkContext.defaultParallelism,
      "downstream work must run at session width")
  }

  test("wide-load column list prunes BELOW the barrier: unnamed heavy " +
      "columns never reach the re-spread shuffle") {
    // the barrier blocks column pruning too — a caller projecting two
    // narrow columns above it would otherwise scan and shuffle the full
    // text bytes; the cols parameter applies the select scan-side
    val df = Tables.loadWide(spark, dir, "documents",
      cols = Seq("doc_id", "lang"))
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("text"),
      s"the unnamed text column must be pruned at the scan:\n$p")
    assert(df.columns.toSeq == Seq("doc_id", "lang"))
    assert(df.rdd.getNumPartitions >=
      spark.sparkContext.defaultParallelism,
      "the pruned load must still re-spread to session width")
  }

  test("bm25 keeps df/stats on broadcasts and the postings on hash joins") {
    val p = plan("text_bm25")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"df/stats must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
  }

  test("lm perplexity broadcasts corpus stats and never sorts globally") {
    val p = plan("text_lm_perplexity")
    // corpus constants + tercile thresholds are 1-row broadcasts
    assert(p.contains("BroadcastExchange"), s"stats must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
    // banding must not fall back to a single-partition global window
    // (ntile/row_number without PARTITION BY) — the scale-killer shape;
    // the thresholds come from a percentile AGGREGATE, so the plan
    // contains no Window exec at all
    assert(!p.contains("Window"), s"no global window allowed:\n$p")
  }

  test("trigram language id stays inside whole-stage codegen") {
    assert(codegenPlan("text_langid_trigram").contains("WholeStageCodegen"))
  }

  test("lateral top-k decorrelates to a window group limit, not a re-execution") {
    val p = plan("rel_lateral")
    assert(p.contains("WindowGroupLimit"), s"expected rank pushdown:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("exists/not-exists compile to semi and anti hash joins") {
    val p = plan("rel_exists")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), s"plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("incremental window reaches the scan as a pushed predicate") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
    val windowed = graft.incremental.Incremental(df,
      graft.incremental.Incremental.Config(cursorColumn = "o_orderkey",
        initialValue = Some("1000"),
        onMissing = graft.incremental.Incremental.Exclude),
      graft.incremental.Incremental.State.empty)
    val p = windowed.queryExecution.executedPlan.toString()
    assert(p.contains("GreaterThanOrEqual(o_orderkey,1000)"),
      s"cursor window must push down:\n$p")
  }

  test("boundary anti-join keeps the cursor window pushed down") {
    import spark.implicits._
    val df = spark.read.parquet(s"$dir/orders.parquet")
    val fps = Seq("h1", "h2").toDF("fp")
    val windowed = graft.incremental.Incremental(df,
      graft.incremental.Incremental.Config(cursorColumn = "o_orderkey",
        primaryKey = Seq("o_orderkey"),
        onMissing = graft.incremental.Incremental.Exclude),
      graft.incremental.Incremental.State(Some("1000"), Nil), Some(fps))
    val p = windowed.queryExecution.executedPlan.toString()
    // the window predicate sits BELOW the fingerprint anti-join, so it
    // still reaches the parquet scan; the join itself is a hash join
    assert(p.contains("GreaterThanOrEqual(o_orderkey,1000)"),
      s"cursor window must push down below the anti-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("domain cap prunes past the cap inside the window sort") {
    // WindowGroupLimit stops a million-page domain from materializing
    // fully ranked — the property that makes the cap viable at 100 TB
    val p = graft.operators.HashSplit.domainCap(
        spark.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "source", cap = 20, rankBy = "n_chars")
      .queryExecution.executedPlan.toString()
    assert(p.contains("WindowGroupLimit"), s"expected rank pushdown:\n$p")
  }

  test("temperature mix joins its tiny count aggregates by broadcast") {
    val p = graft.operators.HashSplit.temperatureMix(
        spark.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "lang", alpha = 0.5)
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"per-stratum counts must broadcast, not shuffle the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-wide shuffle join:\n$p")
  }

  test("exact percentile runs as a spillable sort, not a value-map aggregate") {
    val p = plan("rel_percentile")
    assert(!p.contains("ObjectHashAggregate"),
      s"no per-group value-map aggregation buffers allowed:\n$p")
    assert(p.contains("Window"), s"expected the sort-based quantile path:\n$p")
  }

  test("per-field validation annotates without a shuffle or a UDF") {
    import spark.implicits._
    import org.apache.spark.sql.types.IntegerType
    val df = spark.read.parquet(s"$dir/orders.parquet")
    val rules = Seq(
      graft.schema.Validation.FieldRule("o_orderpriority", dataType = Some(IntegerType)),
      graft.schema.Validation.FieldRule("o_orderstatus", required = true))
    val p = graft.schema.Validation.annotate(df, rules)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"validation must stay a projection:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      "validation must compile to native expressions")
  }

  test("kmv sketches push the bottom-k into a window group limit") {
    val p = plan("ops_kmv_overlap")
    assert(p.contains("WindowGroupLimit"),
      s"bottom-k must prune map-side before the shuffle:\n$p")
    // the only nested-loop allowed is the tiny group-pair enumeration
    // (|groups|^2 inequality join of two dimension lists)
    assert(!p.contains("CartesianProduct"))
  }

  test("cms estimate joins the counter table by broadcast") {
    val p = plan("ops_cms_freq")
    assert(p.contains("BroadcastHashJoin"),
      s"sketch-sized counter join must broadcast:\n$p")
  }

  test("dsir scoring joins the log-ratio model by broadcast, no doc x vocab product") {
    val p = plan("text_dsir_select")
    assert(p.contains("BroadcastHashJoin"),
      s"the <=m-row ratio table must broadcast:\n$p")
    // 1-row corpus totals ride BroadcastNestedLoopJoin crosses (fine);
    // the feature-to-model join must never shuffle-sort
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("pca covariance runs as one object-agg pass, never a pair self-join") {
    val p = plan("sim_pca_covariance")
    assert(p.contains("graft_decimal_gram_agg"),
      s"expected the one-pass decimal gram aggregate:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no n*d^2 pair self-join allowed:\n$p")
  }

  test("pca projection stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, dir, "embeddings")
    val model = graft.ext.Pca.fit(emb, "embedding", dim = 64, r = 4)
    val proj = emb.select(col("vec_id"),
      graft.ext.Pca.projection(model, col("embedding")).as("pc"))
    assert(proj.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      .contains("WholeStageCodegen"))
    val p = proj.queryExecution.executedPlan.toString()
    assert(p.contains("graft_matvec_mul"))
  }

  test("unicode clean and url audit stay inside whole-stage codegen") {
    Seq("text_unicode_clean", "text_url_domains").foreach { name =>
      val cg = codegenPlan(name)
      assert(cg.contains("WholeStageCodegen"), s"$name fell out of codegen")
      val p = plan(name)
      // pure projection: the ONLY exchange is the presentation sort's
      // range partitioning — no aggregate, no join
      assert("Exchange".r.findAllIn(p).length == 1 &&
        p.contains("rangepartitioning"),
        s"$name must stay a pure projection up to the sort:\n$p")
    }
  }

  test("chunk windows is projection + explode: no shuffle before the sort") {
    val p = plan("text_chunk_windows")
    // the only exchange allowed is the presentation orderBy's range part
    assert(p.contains("Generate explode"), s"expected the chunk explode:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"),
      s"chunking must not aggregate or join:\n$p")
  }

  test("shard shuffle sorts per shard, never in one partition") {
    val p = plan("ops_shard_shuffle")
    assert(p.contains("Window"), s"expected the per-shard rank window:\n$p")
    // the window partitions by shard => hashpartitioning exchange, not a
    // single-partition global sort
    assert(p.contains("hashpartitioning(shard"),
      s"window must partition by shard:\n$p")
  }

  test("quantization is one stats aggregate plus a map-only kernel pass") {
    val p = plan("sim_quantize_int8")
    assert(p.contains("graft_quantize_int8"), s"expected the kernel:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row stats frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-sized join allowed:\n$p")
  }

  test("bloom probes broadcast the bit table") {
    val p = plan("ops_bloom_filter")
    assert(p.contains("BroadcastHashJoin"),
      s"the sketch-sized bit table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("incremental dedup joins band keys by hash, no corpus rescan join") {
    val p = plan("dedup_incremental")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"band join degraded:\n$p")
  }

  test("hamming near-dup banding stays a band-key equi-join at every dim") {
    // single-word (64), multi-word (128), and the incremental screen
    // against the persisted band table: candidates must ride the
    // (widx, blk, blk_val) hash join — an all-pairs degradation here is
    // exactly the 100 TB failure the banding exists to prevent
    for (q <- Seq("dedup_embedding_hamming", "dedup_hamming_wide",
        "dedup_hamming_incremental")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q banding degraded:\n$p")
      assert(p.contains("graft_pack_signbits"),
        s"$q must pack sign codes with the codegen kernel:\n$p")
    }
  }

  test("perceptual pair generators stay pigeonhole equi-joins") {
    for (q <- Seq("mm_phash_pairs", "mm_video_neardup",
        "mm_audio_fingerprint", "mm_phash_incremental")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q pair generation degraded to all-pairs:\n$p")
    }
  }

  test("fuzzy join candidates ride gram/length equi-joins, never all-pairs") {
    val p = plan("ops_fuzzy_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degraded:\n$p")
  }

  test("pq encode rides broadcast-literal argmins: no join in the code path") {
    val p = plan("sim_pq_codes")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"pq encode degraded:\n$p")
    assert(p.contains("graft_sqdist"), s"expected the codegen kernel:\n$p")
  }

  test("binary rerank broadcasts the queries; pack/hamming stay codegen") {
    val p = plan("sim_binary_rerank")
    // the corpus is scanned once against BROADCAST queries (the
    // bruteForceTopK shape) — never shuffled into a corpus-sized join
    assert(p.contains("BroadcastExchange"), s"queries must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-sized join allowed:\n$p")
    assert(p.contains("graft_pack_signbits") && p.contains("graft_hamming"),
      s"expected the codegen kernels:\n$p")
    assert(codegenPlan("sim_binary_rerank").contains("WholeStageCodegen"))
  }

  test("quality classifier scoring is a map-only literal dot product") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, dir, "documents")
    val model = graft.ext.QualityClassifier.RidgeModel(
      Seq("len_sat", "punct_ratio", "stop_ratio", "char_sat"),
      Array(0.1, 0.2, 0.3, 0.4, 0.5), lambda = 1e-3)
    val scored = emb.select(col("doc_id"),
      graft.ext.QualityClassifier.score(model, col("text")).as("score"))
    val p = scored.queryExecution.executedPlan.toString()
    // fitted weights ride as literals: no join, no aggregate, no shuffle
    assert(!p.contains("Exchange") && !p.contains("Join") &&
      !p.contains("HashAggregate"),
      s"scoring must stay a pure projection:\n$p")
  }
}
