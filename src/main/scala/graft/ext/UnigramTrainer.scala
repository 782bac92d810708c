package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus UNIGRAM tokenizer TRAINING (the SentencePiece-style
  * vocabulary-learning loop of Kudo 2018, "Subword Regularization") —
  * the second tokenizer family beside [[BpeTrainer]]: instead of
  * growing a vocabulary bottom-up by merges, seed a LARGE candidate
  * piece inventory from corpus substrings and PRUNE it down to the
  * target size by usefulness under the current segmentation.
  *
  * Deterministic, engine-portable variant (the [[BpeTrainer]]
  * leftmost-replace discipline applied here): classic unigram-LM runs
  * soft EM with Viterbi under log-probabilities — float arithmetic
  * whose `ln` differs across engines in the last ulp, which would make
  * an external SQL re-derivation hash-unstable. This trainer replaces
  * the soft E-step with the GREEDY LEFTMOST-LONGEST segmentation (the
  * WordPiece inference rule, also SentencePiece's non-sampling fast
  * path) and the likelihood-loss prune with an integer USAGE prune
  * (total weighted piece uses under the current segmentation, ties on
  * piece bytes ASC — a total order). Every quantity in the loop is an
  * integer or a string; DuckDB re-derives the ENTIRE training run
  * hash-exactly ([[oracleSql]]), loop bounds riding as literals.
  *
  * Shape, 100 TB first (the [[BpeTrainer]] scaffold):
  *  - training works on the DISTINCT WORD table (vocabulary-sized)
  *    with word-type counts as weights — never on documents;
  *  - the seed is one substring explode + hash aggregate over that
  *    table (positions × lengths ≤ maxPieceLen — bounded fan-out);
  *  - each prune round is one segmentation sweep (ONE candidate join
  *    against the piece table + a per-word greedy fold — see
  *    [[segmentDistributed]]) + one usage aggregate + one top-K — no
  *    corpus rescan anywhere;
  *  - the final vocabulary always contains every corpus character
  *    (singles are never pruned), so segmentation is TOTAL and each
  *    greedy step consumes ≥ 1 character — the loop bound is the
  *    longest word, not a fixpoint search.
  *
  * Output artifacts mirror BPE's: a piece table (piece, usage,
  * tok_id — dense rank in UTF-8 byte order) and the segmented
  * vocabulary (w, cnt, rep) in exactly [[BpeTrainer]]'s `rep` layout
  * (" p1 p2 "), so [[BpeTrainer.encodeWith]] applies verbatim and
  * [[UnigramStore]] persists the pair like [[BpeStore]]. */
object UnigramTrainer {

  /** vocabSize / seedSize count MULTI-CHARACTER pieces — the final
    * vocabulary additionally carries every corpus character (the
    * coverage floor that keeps segmentation total). `iters` is the
    * number of PRUNE rounds: seedSize shrinks geometrically to
    * vocabSize over them ([[kSchedule]]); segmentation runs iters + 1
    * times (once more under the final vocabulary). */
  final case class Config(vocabSize: Int, seedSize: Int,
      maxPieceLen: Int, iters: Int) {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need seedSize >= vocabSize >= 1, got seed=$seedSize vocab=$vocabSize")
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen in [2, 16], got $maxPieceLen")
    require(iters >= 1 && iters <= 8, s"iters in [1, 8], got $iters")
  }

  /** Above this many distinct word types the training loop runs
    * distributed (the word table is too wide to collect); below it the
    * loop runs in DRIVER memory over the collected vocabulary — the
    * [[BpeTrainer.DriverVocabBudget]] size-adaptive split. Both paths
    * are semantics-identical (spec-pinned). */
  val LocalWordsBudget = 2000000L

  /** Geometric multi-piece retention schedule seed → vocab over
    * `iters` rounds, as INTEGER literals (computed once here, embedded
    * in the oracle — no float crosses an engine boundary). */
  def kSchedule(cfg: Config): Seq[Int] =
    (1 to cfg.iters).map { i =>
      math.max(cfg.vocabSize, math.round(cfg.seedSize * math.pow(
        cfg.vocabSize.toDouble / cfg.seedSize,
        i.toDouble / cfg.iters)).toInt)
    }

  /** Learn the piece table (piece, usage, tok_id) from the corpus:
    * usage = total weighted uses in the FINAL segmentation (a retained
    * character shadowed by longer pieces reports 0), tok_id = dense
    * rank of the piece in UTF-8 byte order. */
  def train(docs: DataFrame, text: String, cfg: Config): DataFrame =
    run(docs, text, cfg)._1

  /** (piece table, segmented vocabulary (w, cnt, rep)) — the artifact
    * pair [[UnigramStore]] persists. */
  def trainWithVocab(docs: DataFrame, text: String,
      cfg: Config): (DataFrame, DataFrame) = run(docs, text, cfg)

  /** Tokenizer APPLY: per-document (n_words, n_pieces) under the
    * corpus-trained vocabulary — the unigram twin of
    * [[BpeTrainer.segmentCounts]] (vocabulary-sized join, never
    * corpus²). */
  def segmentCounts(docs: DataFrame, id: String, text: String,
      cfg: Config): DataFrame = {
    val vocab = run(docs, text, cfg)._2
      .select(col("w"), size(split(trim(col("rep")), " ")).as("n_sym"))
    docs.select(col(id), explode(TextOps.tokens(col(text))).as("w"))
      .where(length(col("w")) > 0)
      .join(vocab, "w")
      .groupBy(id)
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym").cast("long")).as("n_pieces"))
      .orderBy(id)
  }

  /** Tokenizer ENCODE: per-document token-id sequences — the
    * segmented vocabulary is [[BpeTrainer]]'s `rep` layout, so the
    * encode join IS [[BpeTrainer.encodeWith]]. */
  def encode(docs: DataFrame, id: String, text: String,
      cfg: Config): DataFrame =
    BpeTrainer.encodeWith(docs, id, text, run(docs, text, cfg)._2)

  /** [[train]] with the driver-local loop forced (spec hook — the
    * public path selects by [[LocalWordsBudget]]). */
  private[ext] def trainLocal(docs: DataFrame, text: String,
      cfg: Config): (DataFrame, DataFrame) =
    run(docs, text, cfg, force = Some(true))

  private[ext] def trainDistributed(docs: DataFrame, text: String,
      cfg: Config): (DataFrame, DataFrame) =
    run(docs, text, cfg, force = Some(false))

  // ---------------------------------------------------------------- core

  private def run(docs: DataFrame, text: String, cfg: Config,
      force: Option[Boolean] = None): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val words = Dedup.pin(
      docs.select(explode(TextOps.tokens(col(text))).as("w"))
        .where(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cnt")))
    val local = force.getOrElse(words.count() <= LocalWordsBudget)
    if (local) runLocal(spark, words, cfg)
    else runDistributed(spark, words, cfg)
  }

  /** Greedy leftmost-longest segmentation of every word under `vocab`
    * (a piece-string frame) — the distributed E-step, WITHOUT a step
    * loop: (1) ONE candidate join computes the longest vocab match at
    * EVERY position of every word (positions × lengths ≤ maxPieceLen
    * exploded, equi-joined on the substring, per-(w, pos) arg-max via
    * `max_by` — a hash aggregate, no sort; deterministic because the
    * substring at (w, pos, l) is one string and vocab is distinct, so
    * there is at most one candidate per length); (2) the sequential
    * greedy chain — inherently per-word — runs as a single
    * `aggregate()` fold over the word's position→match map, advancing
    * `pos` by the matched length each round (singles are never pruned,
    * so every position matches and progress is ≥ 1 char/round;
    * iterating `length(w)` times over-runs harmlessly). A per-STEP
    * dataframe loop here referenced the running state twice per step
    * (directly + through the candidate side) — an EXPONENTIAL plan
    * (2^steps leaves; measured: 537 stages and execution-memory
    * starvation on a 45-word fixture). */
  private def segmentDistributed(words: DataFrame, vocab: DataFrame,
      cfg: Config): DataFrame = {
    val vb = broadcast(vocab.select(col("piece").as("__p")))
    val lm = words
      .select(col("w"), explode(expr("sequence(1, length(w))")).as("pos"))
      .select(col("w"), col("pos"),
        explode(expr(s"sequence(1, ${cfg.maxPieceLen})")).as("l"))
      .withColumn("__p", expr("substring(w, pos, l)"))
      // substrings truncated by the word end duplicate the shorter
      // candidate generated at their true length — drop them
      .filter(length(col("__p")) === col("l"))
      .join(vb, Seq("__p"))
      .groupBy("w", "pos").agg(max_by(col("__p"), col("l")).as("p"))
    val m = lm.groupBy("w").agg(
      map_from_entries(collect_list(struct(col("pos"), col("p")))).as("m"))
    words.join(m, Seq("w"))
      .withColumn("rep", expr(
        """aggregate(sequence(1, length(w)),
          |  named_struct('pos', 1, 'rep', ' '),
          |  (s, i) -> if(s.pos <= length(w),
          |    named_struct(
          |      'pos', s.pos + length(element_at(m, s.pos)),
          |      'rep', concat(s.rep, element_at(m, s.pos), ' ')),
          |    s),
          |  s -> s.rep)""".stripMargin))
      .select("w", "cnt", "rep")
  }

  /** Weighted piece-usage under a segmentation. */
  private def usageOf(seg: DataFrame): DataFrame =
    seg.select(col("cnt"), explode(split(trim(col("rep")), " ")).as("piece"))
      .where(length(col("piece")) > 0)
      .groupBy("piece").agg(sum("cnt").as("usage"))

  private def runDistributed(spark: SparkSession, words: DataFrame,
      cfg: Config): (DataFrame, DataFrame) = {
    // every corpus character — the never-pruned coverage floor
    val chars = Dedup.pin(words
      .select(explode(split(col("w"), "")).as("piece"))
      .where(length(col("piece")) > 0).distinct())
    // seed: every in-word substring of length 2..maxPieceLen, weighted
    // by word-type count per OCCURRENCE, top seedSize by
    // (weight DESC, piece ASC)
    val lens = cfg.maxPieceLen
    val sub = words.select(col("cnt"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(w)), s ->
             |  transform(sequence(2, $lens), l ->
             |    case when s + l - 1 <= length(w)
             |         then substring(w, s, l) end)))""".stripMargin))
          .as("piece"))
      .where(col("piece").isNotNull)
      .groupBy("piece").agg(sum("cnt").as("wcnt"))
      .orderBy(col("wcnt").desc, col("piece"))
      .limit(cfg.seedSize)
    var vocab = Dedup.pin(
      chars.unionByName(sub.select("piece")).distinct())
    kSchedule(cfg).foreach { k =>
      val seg = segmentDistributed(words, vocab, cfg)
      val kept = usageOf(seg)
        .where(length(col("piece")) > 1)
        .orderBy(col("usage").desc, col("piece"))
        .limit(k)
      vocab = Dedup.pin(
        chars.unionByName(kept.select("piece")).distinct())
    }
    val segFinal = Dedup.pin(segmentDistributed(words, vocab, cfg))
    val pieces = vocab
      .join(usageOf(segFinal), Seq("piece"), "left")
      .na.fill(0L, Seq("usage"))
      .withColumn("tok_id",
        row_number().over(Window.orderBy("piece")).cast("long"))
    (pieces, segFinal)
  }

  /** The driver-memory loop over the COLLECTED word table —
    * byte-identical semantics to [[runDistributed]] (same seed count,
    * same (usage DESC, bytes ASC) prune, same greedy leftmost-longest
    * segmentation; UTF-16 `String` ordering is replaced by explicit
    * UTF-8 byte comparison, the [[BpeTrainer.runLocal]] discipline). */
  private def runLocal(spark: SparkSession, words: DataFrame,
      cfg: Config): (DataFrame, DataFrame) = {
    import scala.collection.mutable
    val rows = words.select("w", "cnt").collect()
    val n = rows.length
    val ws = Array.tabulate(n)(i => rows(i).getString(0))
    val cnts = Array.tabulate(n)(i => rows(i).getLong(1))
    def cmpUtf8(x: String, y: String): Int = java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val chars = mutable.HashSet.empty[String]
    ws.foreach(w => w.foreach(c => chars += c.toString))
    // NOTE code-point caveat: split(w, "") on the Spark side and
    // per-char iteration here both split at UTF-16 code units; the
    // fixture corpus is BMP-only and the oracle's substr() agrees on
    // BMP. (BPE's regex "(.)" has the same boundary.)
    val seedCnt = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val w = ws(i); val c = cnts(i)
      var s = 0
      while (s < w.length) {
        var l = 2
        while (l <= cfg.maxPieceLen && s + l <= w.length) {
          val p = w.substring(s, s + l)
          seedCnt.update(p, seedCnt.getOrElse(p, 0L) + c)
          l += 1
        }
        s += 1
      }
      i += 1
    }
    def topK(m: Iterable[(String, Long)], k: Int): Seq[String] =
      m.toSeq.sortWith { case ((p1, c1), (p2, c2)) =>
        if (c1 != c2) c1 > c2 else cmpUtf8(p1, p2) < 0
      }.take(k).map(_._1)
    var vocab: Set[String] =
      chars.toSet ++ topK(seedCnt, cfg.seedSize)
    def segmentWord(w: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        var l = math.min(cfg.maxPieceLen, w.length - pos)
        while (l > 1 && !vocab.contains(w.substring(pos, pos + l))) l -= 1
        out += w.substring(pos, pos + l)
        pos += l
      }
      out.toArray
    }
    def usage(): mutable.HashMap[String, Long] = {
      val u = mutable.HashMap.empty[String, Long]
      var j = 0
      while (j < n) {
        segmentWord(ws(j)).foreach(p =>
          u.update(p, u.getOrElse(p, 0L) + cnts(j)))
        j += 1
      }
      u
    }
    kSchedule(cfg).foreach { k =>
      vocab = chars.toSet ++ topK(usage().filter(_._1.length > 1), k)
    }
    val finalUse = usage()
    val pieceSchema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("usage", LongType, nullable = false),
      StructField("tok_id", LongType, nullable = false)))
    val ordered = vocab.toSeq.sortWith((a, b) => cmpUtf8(a, b) < 0)
    val pieces = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ordered.zipWithIndex.map { case (p, j) =>
          Row(p, finalUse.getOrElse(p, 0L), (j + 1).toLong)
        }, 1),
      pieceSchema)
    val repSchema = StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("rep", StringType, nullable = false)))
    val slices = math.max(1, n / 500000)
    val reps = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Array.tabulate(n)(j =>
          Row(ws(j), cnts(j),
            segmentWord(ws(j)).mkString(" ", " ", " "))).toSeq, slices),
      repSchema)
    (pieces, reps)
  }

  // ------------------------------------------------------------- oracles

  /** The shared CTE chain of all three oracles: w0 (distinct words) →
    * chars → v0 (seed) → [segment → usage → prune]×iters → final
    * segment gF + usage uF, every loop bound an embedded literal
    * (maxSteps = the corpus's longest word, measured by the caller —
    * the gates deposit these oracles through the run-time
    * [[graft.queries.OracleStash]] for exactly this reason).
    * MULTIPLY-REFERENCED stages are MATERIALIZED (the
    * [[BpeTrainer.stagesSql]] DuckDB-inlining lesson). */
  private def chainSql(cfg: Config, maxSteps: Int): String = {
    def segStages(tag: String, vocabCte: String): String =
      (1 to maxSteps).map { t =>
        val prev = if (t == 1) s"${tag}0" else s"$tag${t - 1}"
        s"""c$tag$t AS (
           |  SELECT DISTINCT st.w, substr(st.w, st.pos, x.l) AS p
           |  FROM $prev st,
           |       LATERAL (SELECT unnest(generate_series(1, ${cfg.maxPieceLen})) AS l) x
           |  JOIN $vocabCte v ON v.piece = substr(st.w, st.pos, x.l)
           |  WHERE st.pos <= length(st.w)
           |    AND length(substr(st.w, st.pos, x.l)) = x.l),
           |b$tag$t AS (
           |  SELECT w, p FROM c$tag$t
           |  QUALIFY row_number() OVER (PARTITION BY w ORDER BY length(p) DESC) = 1),
           |$tag$t AS MATERIALIZED (
           |  SELECT st.w, st.cnt,
           |    CASE WHEN b.p IS NULL THEN st.pos
           |         ELSE st.pos + length(b.p) END AS pos,
           |    CASE WHEN b.p IS NULL THEN st.rep
           |         ELSE st.rep || b.p || ' ' END AS rep
           |  FROM $prev st LEFT JOIN b$tag$t b USING (w))""".stripMargin
      }.mkString(",\n")
    def segInit(tag: String): String =
      s"""${tag}0 AS (SELECT w, cnt, 1 AS pos, ' ' AS rep FROM w0)"""
    def usageSql(tag: String, of: String): String =
      s"""u$tag AS MATERIALIZED (
         |  SELECT s.p AS piece, sum(g.cnt)::BIGINT AS usage
         |  FROM $of g, LATERAL (
         |    SELECT unnest(string_split(trim(g.rep), ' ')) AS p) s
         |  WHERE length(s.p) > 0
         |  GROUP BY 1)""".stripMargin
    val ks = kSchedule(cfg)
    val rounds = (1 to cfg.iters).map { i =>
      val tag = s"g${i - 1}_"
      s"""${segInit(tag)},
         |${segStages(tag, s"v${i - 1}")},
         |${usageSql(s"$i", s"$tag$maxSteps")},
         |v$i AS MATERIALIZED (
         |  SELECT piece FROM chars
         |  UNION
         |  SELECT piece FROM (
         |    SELECT piece FROM u$i WHERE length(piece) > 1
         |    ORDER BY usage DESC, piece LIMIT ${ks(i - 1)}))""".stripMargin
    }.mkString(",\n")
    val fTag = "gF_"
    s"""w0 AS MATERIALIZED (
       |  SELECT w, count(*)::BIGINT AS cnt
       |  FROM (
       |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |    FROM documents) t
       |  WHERE length(w) > 0
       |  GROUP BY w),
       |chars AS MATERIALIZED (
       |  SELECT DISTINCT substr(w, s.s, 1) AS piece
       |  FROM w0, LATERAL (SELECT unnest(generate_series(1, length(w))) AS s) s),
       |sub AS (
       |  SELECT substr(w, s.s, l.l) AS piece, sum(cnt)::BIGINT AS wcnt
       |  FROM w0,
       |       LATERAL (SELECT unnest(generate_series(1, length(w))) AS s) s,
       |       LATERAL (SELECT unnest(generate_series(2, ${cfg.maxPieceLen})) AS l) l
       |  WHERE s.s + l.l - 1 <= length(w)
       |  GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT piece FROM chars
       |  UNION
       |  SELECT piece FROM (
       |    SELECT piece FROM sub ORDER BY wcnt DESC, piece LIMIT ${cfg.seedSize})),
       |$rounds,
       |${segInit(fTag)},
       |${segStages(fTag, s"v${cfg.iters}")},
       |${usageSql("F", s"$fTag$maxSteps")},
       |segF AS MATERIALIZED (SELECT w, cnt, rep FROM $fTag$maxSteps)""".stripMargin
  }

  /** DuckDB re-derivation of [[train]]. */
  def oracleSql(cfg: Config, maxSteps: Int): String =
    s"""WITH ${chainSql(cfg, maxSteps)}
       |SELECT v.piece, coalesce(uF.usage, 0)::BIGINT AS usage,
       |  row_number() OVER (ORDER BY v.piece)::BIGINT AS tok_id
       |FROM v${cfg.iters} v LEFT JOIN uF USING (piece)
       |ORDER BY tok_id""".stripMargin

  /** DuckDB re-derivation of [[segmentCounts]]. */
  def segmentOracleSql(cfg: Config, maxSteps: Int): String =
    s"""WITH ${chainSql(cfg, maxSteps)},
       |seg AS (
       |  SELECT w, len(string_split(trim(rep), ' ')) AS n_sym FROM segF),
       |dw AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
       |  FROM documents)
       |SELECT doc_id, count(*)::BIGINT AS n_words,
       |  sum(n_sym)::BIGINT AS n_pieces
       |FROM dw JOIN seg USING (w)
       |WHERE length(w) > 0
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** DuckDB re-derivation of [[encode]] — [[BpeTrainer.encodeOracleSql]]'s
    * tail over the unigram segmentation. */
  def encodeOracleSql(cfg: Config, maxSteps: Int): String =
    s"""WITH ${chainSql(cfg, maxSteps)},
       |seg AS (SELECT w, string_split(trim(rep), ' ') AS syms FROM segF),
       |vocab AS (
       |  SELECT sym, row_number() OVER (ORDER BY sym) AS tok_id
       |  FROM (SELECT DISTINCT unnest(syms) AS sym FROM seg)),
       |ws AS (
       |  SELECT w, s.spos, s.sym
       |  FROM seg, LATERAL (
       |    SELECT unnest(syms) AS sym,
       |      unnest(generate_series(1, len(syms))) AS spos) s),
       |dw AS (
       |  SELECT doc_id, t.w, t.pos
       |  FROM documents, LATERAL (
       |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w,
       |      unnest(generate_series(1,
       |        len(string_split_regex(trim(text), '\\s+')))) AS pos) t
       |  WHERE length(t.w) > 0)
       |SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |  array_to_string(list(tok_id ORDER BY pos, spos), ',') AS token_ids
       |FROM dw JOIN ws USING (w) JOIN vocab USING (sym)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** The corpus's longest word — the oracle's segmentation unroll
    * bound, measured where the gates need it. */
  def maxStepsOf(docs: DataFrame, text: String): Int =
    docs.select(explode(TextOps.tokens(col(text))).as("w"))
      .where(length(col("w")) > 0)
      .agg(max(length(col("w")))).head().getInt(0)
}
