package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.TextIR

/** IR / corpus-inspection operators (BM25 retrieval, TF-IDF salient
  * terms, n-gram mining) gated against DuckDB computing the same
  * statistics from first-principles SQL. Tokenization is the shared
  * whitespace convention (`string_split_regex(trim(text), '\s+')` ≡
  * `split(trim(text), "\\s+")`), scores are rounded to 6 decimals on
  * both sides (the engine-stable rendering of log-based doubles), and
  * every ranking tie breaks on a total order (score, then id/term).
  */
object TextIRQueries {

  private val BmQuery = Seq("spark", "hash", "window")

  val defs: Map[String, Q] = Map(
    // Okapi BM25 over the corpus for a fixed term query — the inverted-
    // index plan: postings filtered to the query terms BEFORE any
    // shuffle; df and corpus stats ride broadcasts
    "text_bm25" -> q { c =>
      TextIR.bm25(c.tw("documents"), "doc_id", "text", BmQuery)
        .orderBy("doc_id")
    },

    // top-3 salient terms per document by TF-IDF over the full vocab
    "text_tfidf" -> q { c =>
      TextIR.tfIdfTopTerms(c.tw("documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rnk")
    },

    // CCNet-style perplexity filter: bigram-LM cross-entropy per doc,
    // banded head/middle/tail at the terciles (Wenzek et al. 2019 §4.3
    // — the quality signal behind the LLaMA/RedPajama data pipelines);
    // the LM trains on the corpus in the same plan, thresholds ride a
    // 1-row broadcast
    "text_lm_perplexity" -> q { c =>
      TextIR.lmPerplexityBands(c.tw("documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // corpus-wide top-50 bigrams (boilerplate mining): explode → hash
    // aggregate with map-side combine → TakeOrdered top-k
    "text_ngram_topk" -> q { c =>
      TextIR.topNgrams(c.tw("documents"), "text", n = 2, k = 50)
    },

    // character-trigram language ID: the derived profiles are DATA, so
    // DuckDB re-scores every document from the same (lang, trigram,
    // weight) table and the argmax must agree exactly
    "text_langid_trigram" -> q { c =>
      import graft.ext.TextOps.TrigramLid
      c.tw("documents").select(col("doc_id"),
        TrigramLid.langId(col("text")).as("lang_pred"),
        TrigramLid.score(col("text"), "en").as("score_en"),
        TrigramLid.score(col("text"), "ru").as("score_ru"))
        .orderBy("doc_id")
    }
  )

  /** The trigram profiles + the Scala argmax tie order, as SQL data. */
  private def trigramValuesSql: String = {
    import graft.ext.TextOps.TrigramLid
    val rows = TrigramLid.Profiles.flatMap { case (lang, prof) =>
      prof.map { case (t, w) => s"('$lang', '${t.replace("'", "''")}', $w)" }
    }
    rows.mkString(", ")
  }

  private def prioValuesSql: String = {
    import graft.ext.TextOps.TrigramLid
    TrigramLid.Profiles.map(_._1).zipWithIndex
      .map { case (l, i) => s"('$l', ${i + 1})" }.mkString(", ")
  }

  private val postingsSql =
    """SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
      |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |    FROM documents) t
      |  WHERE term <> '' GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_bm25" ->
      s"""WITH lens AS (
         |  SELECT doc_id,
         |    (CASE WHEN length(trim(text)) = 0 THEN 0
         |          ELSE len(string_split_regex(trim(text), '\\s+')) END)::DOUBLE AS dl
         |  FROM documents),
         |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM lens),
         |postings AS (
         |  SELECT * FROM ($postingsSql)
         |  WHERE term IN (${BmQuery.map(t => s"'$t'").mkString(", ")})),
         |dfs AS (
         |  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
         |  FROM postings GROUP BY 1)
         |SELECT p.doc_id,
         |  round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |    * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25
         |FROM postings p JOIN dfs USING (term) JOIN lens USING (doc_id), stats
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_lm_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
        |  FROM documents WHERE length(trim(text)) > 0),
        |uni AS (
        |  SELECT tok AS w, count(*)::BIGINT AS cu
        |  FROM (SELECT unnest(ts) AS tok FROM toks) t GROUP BY 1),
        |stats AS (
        |  SELECT sum(cu)::DOUBLE AS n_tok, count(*)::DOUBLE AS v FROM uni),
        |pairs AS (
        |  SELECT doc_id, ts[i] AS p, ts[i+1] AS w
        |  FROM toks,
        |       LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
        |bi AS (SELECT p, w, count(*)::BIGINT AS cb FROM pairs GROUP BY 1, 2),
        |s1 AS (
        |  SELECT doc_id,
        |    CAST(-ln((cu + 1)::DOUBLE / (n_tok + v)) AS DECIMAL(28,12)) AS lp
        |  FROM (SELECT doc_id, ts[1] AS w FROM toks) f JOIN uni USING (w), stats),
        |s2 AS (
        |  SELECT pr.doc_id,
        |    CAST(-ln((cb + 1)::DOUBLE / (cu + v)) AS DECIMAL(28,12)) AS lp
        |  FROM pairs pr
        |  JOIN bi USING (p, w)
        |  JOIN uni u ON u.w = pr.p, stats),
        |sc AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_scored,
        |    round(sum(lp)::DOUBLE / count(*), 6) AS ce
        |  FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) u GROUP BY 1),
        |th AS (
        |  SELECT quantile_cont(ce, 1.0/3) AS t1, quantile_cont(ce, 2.0/3) AS t2
        |  FROM sc)
        |SELECT doc_id, n_scored, ce,
        |  CASE WHEN ce <= t1 THEN 'head'
        |       WHEN ce <= t2 THEN 'middle'
        |       ELSE 'tail' END AS band
        |FROM sc, th ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      s"""WITH postings AS ($postingsSql),
         |nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
         |dfs AS (
         |  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
         |  FROM postings GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, term, round(tf * ln(n_docs / df), 6) AS tfidf
         |  FROM postings JOIN dfs USING (term), nd),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
         |  FROM scored)
         |SELECT doc_id, term, tfidf, rnk FROM r
         |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "text_langid_trigram" ->
      s"""WITH w(lang, tri, wt) AS (VALUES $trigramValuesSql),
         |prio(lang, p) AS (VALUES $prioValuesSql),
         |canon AS (
         |  SELECT doc_id,
         |    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
         |  FROM documents),
         |tris AS (
         |  SELECT doc_id, substr(s, i, 3) AS tri
         |  FROM canon, LATERAL (SELECT unnest(generate_series(1,
         |    greatest(len(s) - 2, 0))) AS i) g),
         |scores AS (
         |  SELECT t.doc_id, w.lang, sum(w.wt)::BIGINT AS score
         |  FROM tris t JOIN w ON t.tri = w.tri GROUP BY 1, 2),
         |best AS (
         |  SELECT s.doc_id, s.lang, s.score, row_number() OVER (
         |    PARTITION BY s.doc_id ORDER BY s.score DESC, p.p) AS rn
         |  FROM scores s JOIN prio p ON s.lang = p.lang)
         |SELECT d.doc_id,
         |  CASE WHEN b.score IS NULL OR b.score = 0 THEN 'und'
         |       ELSE b.lang END AS lang_pred,
         |  coalesce(en.score, 0) AS score_en,
         |  coalesce(ru.score, 0) AS score_ru
         |FROM documents d
         |LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
         |LEFT JOIN scores en ON d.doc_id = en.doc_id AND en.lang = 'en'
         |LEFT JOIN scores ru ON d.doc_id = ru.doc_id AND ru.lang = 'ru'
         |ORDER BY d.doc_id""".stripMargin,

    "text_ngram_topk" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |grams AS (
        |  SELECT unnest(list_transform(range(1, len(ts)),
        |    i -> ts[i] || ' ' || ts[i + 1])) AS ngram
        |  FROM toks WHERE len(ts) >= 2)
        |SELECT ngram, count(*)::BIGINT AS cnt FROM grams
        |GROUP BY 1 ORDER BY cnt DESC, ngram LIMIT 50""".stripMargin
  )
}
