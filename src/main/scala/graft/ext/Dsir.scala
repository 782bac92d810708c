package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram
  * distribution looks like a target corpus. The method behind
  * "select web data that resembles Wikipedia/books" pretraining
  * mixtures; complements the quality/perplexity filters (which score
  * fluency) by scoring DOMAIN MATCH against an explicit target.
  *
  * Mechanics (paper §3, hashed n-gram variant):
  *  1. featurize every document as counts over m hash buckets of its
  *     unigrams + bigrams;
  *  2. fit two bag-of-buckets models: p (target corpus) and q (raw
  *     corpus), Laplace-smoothed;
  *  3. per raw document, the importance log-weight is
  *     Σ_b cnt_b · (ln p_b − ln q_b);
  *  4. keep the top-k raw documents by weight (the paper resamples
  *     with Gumbel noise; the deterministic top-k is the reproducible
  *     variant, same spirit as [[graft.operators.HashSplit]] avoiding
  *     `rand()`).
  *
  * Scale shape (100 TB): one tokenize+hash pass per corpus into
  * (id, bucket, cnt) features; the two model tables are ≤ m rows —
  * broadcast-joined onto the raw features, so scoring is a map-side
  * join + one hash-aggregate per document. No vocabulary shuffle wider
  * than m, no doc×vocab product, no driver state. Per-bucket weight
  * terms are cast DECIMAL(28,12) before the per-doc sum, making the
  * aggregation order-independent and the ranking engine-stable
  * (same discipline as [[TextIR.lmPerplexityBands]]).
  */
object Dsir {

  /** Hashed unigram+bigram bucket counts per document:
    * (id, b, cnt), b in [0, m). Blank documents contribute nothing.
    * Bigram rows hash "w1 w2" — the space never appears inside a
    * whitespace-split token, so unigram and bigram keyspaces cannot
    * collide pre-hash. */
  def features(docs: DataFrame, id: String, text: String,
      m: Int): DataFrame = {
    val toks = docs
      .select(col(id), TextOps.tokens(col(text)).as("_toks"))
      .where(length(element_at(col("_toks"), 1)) > 0)
    val grams = toks
      .withColumn("_prev", slice(col("_toks"), lit(1), size(col("_toks")) - 1))
      .withColumn("_curr", slice(col("_toks"), lit(2), size(col("_toks")) - 1))
      .withColumn("_bi",
        zip_with(col("_prev"), col("_curr"), (a, b) => concat(a, lit(" "), b)))
      .select(col(id), explode(concat(col("_toks"), col("_bi"))).as("g"))
    grams.select(col(id),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % m).as("b"))
      .groupBy(col(id), col("b")).agg(count(lit(1)).as("cnt"))
  }

  /** Importance log-weights for every raw document: (id, n_grams,
    * weight) — weight is the decimal-exact term sum cast to double and
    * rounded to 6 decimals (one final add + round, engine-stable).
    * `target` and `raw` are featurized separately; the per-bucket
    * log-ratio table (≤ m rows) and the two corpus totals (1 row) are
    * broadcast. */
  def importanceWeights(raw: DataFrame, target: DataFrame, id: String,
      text: String, m: Int = 1024): DataFrame = {
    // the raw features fan out three ways (q model, q total, scoring
    // join) and the target features two (p model, p total): pinned so
    // the tokenize+hash pass runs once per corpus (lifecycle shared
    // with Dedup's pin scopes)
    val fRaw = Dedup.pin(features(raw, id, text, m))
    val fTgt = Dedup.pin(features(target, id, text, m))
    val ct = fTgt.groupBy("b").agg(sum("cnt").as("ct"))
    val cq = fRaw.groupBy("b").agg(sum("cnt").as("cq"))
    // every bucket of a raw doc is present in cq by construction; ct
    // joins left (absent target bucket → smoothed count 1)
    val ratios = cq.join(ct, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .select(col("b"),
        (log(col("ct") + 1) - log(col("cq") + 1)).as("lr"))
    val totals = fTgt.agg(sum("cnt").as("t_tot"))
      .crossJoin(fRaw.agg(sum("cnt").as("q_tot")))
      .select((log(col("q_tot") + m) - log(col("t_tot") + m)).as("norm"))
    fRaw.join(broadcast(ratios), Seq("b"))
      .select(col(id), col("cnt"),
        (col("cnt") * col("lr")).cast("decimal(28,12)").as("term"))
      .groupBy(col(id))
      .agg(sum("cnt").as("n_grams"), sum("term").as("s"))
      .crossJoin(broadcast(totals))
      .select(col(id), col("n_grams"),
        round(col("s").cast("double") + col("n_grams") * col("norm"), 6)
          .as("weight"))
  }

  /** Top-`k` raw documents by importance weight (weight desc, id asc —
    * a total order, so the cut is deterministic). */
  def select(raw: DataFrame, target: DataFrame, id: String, text: String,
      m: Int = 1024, k: Int = 100): DataFrame =
    importanceWeights(raw, target, id, text, m)
      .orderBy(col("weight").desc, col(id))
      .limit(k)

  /** Single-corpus variant: when target and raw live in ONE table split
    * by a predicate, featurize the corpus ONCE (one tokenize+hash pass
    * instead of two scans) and derive both models from conditional
    * sums over the flagged features. Same math, same output as
    * [[select]] on the two slices. */
  def selectByPredicate(docs: DataFrame, id: String, text: String,
      isTarget: org.apache.spark.sql.Column, m: Int = 1024,
      k: Int = 100): DataFrame = {
    // the flag rides the tokenize→explode→groupBy pass as an extra
    // (functionally id-dependent) grouping column — no join-back
    val toks = docs.withColumn("__tgt", isTarget)
      .select(col(id), col("__tgt"), TextOps.tokens(col(text)).as("_toks"))
      .where(length(element_at(col("_toks"), 1)) > 0)
    val grams = toks
      .withColumn("_prev", slice(col("_toks"), lit(1), size(col("_toks")) - 1))
      .withColumn("_curr", slice(col("_toks"), lit(2), size(col("_toks")) - 1))
      .withColumn("_bi",
        zip_with(col("_prev"), col("_curr"), (a, b) => concat(a, lit(" "), b)))
      .select(col(id), col("__tgt"),
        explode(concat(col("_toks"), col("_bi"))).as("g"))
    val feats = Dedup.pin(grams
      .select(col(id), col("__tgt"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % m).as("b"))
      .groupBy(col(id), col("__tgt"), col("b")).agg(count(lit(1)).as("cnt")))
    val stats = feats.groupBy("b").agg(
      sum(when(col("__tgt"), col("cnt")).otherwise(0L)).as("ct"),
      sum(when(!col("__tgt"), col("cnt")).otherwise(0L)).as("cq"))
    val ratios = stats.filter(col("cq") > 0)
      .select(col("b"), (log(col("ct") + 1) - log(col("cq") + 1)).as("lr"))
    val totals = stats
      .agg(sum("ct").as("t_tot"), sum("cq").as("q_tot"))
      .select((log(col("q_tot") + m) - log(col("t_tot") + m)).as("norm"))
    feats.filter(!col("__tgt"))
      .join(broadcast(ratios), Seq("b"))
      .select(col(id), col("cnt"),
        (col("cnt") * col("lr")).cast("decimal(28,12)").as("term"))
      .groupBy(col(id))
      .agg(sum("cnt").as("n_grams"), sum("term").as("s"))
      .crossJoin(broadcast(totals))
      .select(col(id), col("n_grams"),
        round(col("s").cast("double") + col("n_grams") * col("norm"), 6)
          .as("weight"))
      .orderBy(col("weight").desc, col(id))
      .limit(k)
  }
}
