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

  /** A PLUGGABLE feature space for DSIR — the
    * [[QualityClassifier.Feature]] (Spark column, DuckDB mirror)
    * pattern lifted to distributions: `grams` maps a text column to
    * the array of gram strings whose hashed-bucket counts become the
    * document's features (the bucketing/model math downstream is
    * fixed), and `gramsCteSql` is the DuckDB replay — a complete
    * `SELECT doc_id, lang, … AS g FROM documents` fragment producing
    * the same gram multiset — so the bit-replayable oracle survives a
    * space swap exactly like the classifier's oracle survives a
    * feature-pack swap. A blank/too-short document must yield an
    * EMPTY array (it then contributes nothing to either model). */
  final case class GramSpace(name: String,
      grams: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      gramsCteSql: String)

  /** The paper's hashed unigram+bigram space (Xie'23 §3): word tokens
    * plus "w1 w2" bigrams — the space char never appears inside a
    * whitespace-split token, so the two keyspaces cannot collide
    * pre-hash. Blank documents yield no grams (the old `features`
    * blank-doc guard, now inside the space). */
  val UnigramBigram: GramSpace = GramSpace("unigram-bigram",
    t => {
      val toks = TextOps.tokens(t)
      val prev = slice(toks, lit(1), size(toks) - 1)
      val curr = slice(toks, lit(2), size(toks) - 1)
      val bi = zip_with(prev, curr, (a, b) => concat(a, lit(" "), b))
      when(length(element_at(toks, 1)) > 0, concat(toks, bi))
        .otherwise(array().cast("array<string>"))
    },
    """SELECT doc_id, lang, unnest(ts) AS g
      |  FROM (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS ts
      |        FROM documents WHERE length(trim(text)) > 0) toks_u
      |  UNION ALL
      |  SELECT doc_id, lang, ts[i] || ' ' || ts[i + 1] AS g
      |  FROM (SELECT doc_id, lang, ts, unnest(range(1, len(ts))) AS i
      |        FROM (SELECT doc_id, lang,
      |                string_split_regex(trim(text), '\s+') AS ts
      |              FROM documents WHERE length(trim(text)) > 0) toks_b)"""
      .stripMargin)

  /** Character trigram space — the tokenizer-free alternative (robust
    * to scriptio continua and inconsistent whitespace, the classic
    * langid feature space): every 3-char window of the trimmed text.
    * Documents shorter than 3 chars contribute nothing. */
  val CharTrigrams: GramSpace = GramSpace("char-trigram",
    t => {
      val s = trim(t)
      when(length(s) >= 3,
        transform(sequence(lit(1), length(s) - 2), i => s.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))
    },
    """SELECT doc_id, lang, substr(t, CAST(i AS INT), 3) AS g
      |  FROM (SELECT doc_id, lang, t, unnest(range(1, length(t) - 1)) AS i
      |        FROM (SELECT doc_id, lang, trim(text) AS t FROM documents)
      |        WHERE length(t) >= 3) tri""".stripMargin)

  /** Hashed bucket counts per document under `space`:
    * (id, b, cnt), b in [0, m). Documents whose gram array is empty
    * contribute nothing. */
  def features(docs: DataFrame, id: String, text: String,
      m: Int, space: GramSpace = UnigramBigram): DataFrame = {
    val grams = docs.select(col(id),
      explode(space.grams(col(text))).as("g"))
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
      text: String, m: Int = 1024,
      space: GramSpace = UnigramBigram): DataFrame = {
    // the raw features fan out three ways (q model, q total, scoring
    // join) and the target features two (p model, p total): pinned so
    // the tokenize+hash pass runs once per corpus (lifecycle shared
    // with Dedup's pin scopes)
    val fRaw = Dedup.pin(features(raw, id, text, m, space))
    val fTgt = Dedup.pin(features(target, id, text, m, space))
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
      m: Int = 1024, k: Int = 100,
      space: GramSpace = UnigramBigram): DataFrame =
    importanceWeights(raw, target, id, text, m, space)
      .orderBy(col("weight").desc, col(id))
      .limit(k)

  /** Single-corpus variant: when target and raw live in ONE table split
    * by a predicate, featurize the corpus ONCE (one tokenize+hash pass
    * instead of two scans) and derive both models from conditional
    * sums over the flagged features. Same math, same output as
    * [[select]] on the two slices. */
  def selectByPredicate(docs: DataFrame, id: String, text: String,
      isTarget: org.apache.spark.sql.Column, m: Int = 1024,
      k: Int = 100, space: GramSpace = UnigramBigram): DataFrame = {
    // the flag rides the featurize→explode→groupBy pass as an extra
    // (functionally id-dependent) grouping column — no join-back
    val grams = docs.withColumn("__tgt", isTarget)
      .select(col(id), col("__tgt"),
        explode(space.grams(col(text))).as("g"))
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
