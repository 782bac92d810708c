package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.TextClean
import graft.operators.HashSplit

/** Corpus canonicalization & structural-prep operators: unicode NFC
  * cleanup, token-window chunking, URL/domain filtering, deterministic
  * shard shuffle. The synthetic corpus is clean ASCII, so the unicode
  * and URL queries decorate each document DETERMINISTICALLY on both
  * sides from `doc_id` (the text_pii convention) — the oracle then
  * checks the transform semantics byte-for-byte, not the fixtures.
  */
object CleanQueries {

  private val CtrlSql = """[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"""
  private val UrlBlocklist = Seq("tracker.bad", "spam.bad")

  val defs: Map[String, Q] = Map(
    // NFC + control-strip + whitespace-collapse canonicalization with
    // the mojibake/control signals; decorations cover decomposed→
    // precomposed composition, a precomposed no-op, combining marks on
    // both letters of a digraph, C0 controls and U+FFFD
    "text_unicode_clean" -> q { c =>
      val dec = when(pmod(col("doc_id"), lit(3)) === 0,
          lit(" café bell\u0007ring"))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          lit(" café tab\u000Bsplit"))
        .otherwise(lit(" Ångström data� end"))
      val docs = c.t("documents").select(col("doc_id"),
        concat(col("text"), dec).as("ptext"))
      TextClean.cleanReport(docs, "doc_id", "ptext").orderBy("doc_id")
    },

    // sliding 32-token windows at stride 24 (8-token overlap) — the
    // chunking half of context-window prep; every chunk carries the
    // md5 fingerprint chunk-level dedup keys on
    "text_chunk_windows" -> q { c =>
      TextClean.chunkWindows(c.t("documents"), "doc_id", "text",
        width = 32, stride = 24).orderBy("doc_id", "chunk_idx")
    },

    // URL → registered-domain audit with a blocklist: every 5th doc
    // carries a blocklisted tracker URL, every 4th a second benign
    // mirror; both kernels (domain extraction, set probe) are codegen
    "text_url_domains" -> q { c =>
      val ptext = concat(col("text"),
        lit(" see https://sub"), pmod(col("doc_id"), lit(7)),
        lit(".example"), pmod(col("doc_id"), lit(3)),
        lit(".com/p/"), col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" http://ads.tracker.bad/x?id="), col("doc_id")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(4)) === 0,
          lit(" https://mirror.example0.com")).otherwise(lit("")))
      val docs = c.t("documents").select(col("doc_id"), ptext.as("ptext"))
      TextClean.urlDomainAudit(docs, "doc_id", "ptext", UrlBlocklist)
        .orderBy("doc_id")
    },

    // deterministic md5 shard shuffle: 8 training shards, salt "ep0";
    // within-shard order is the hash order (pseudo-random, stable)
    "ops_shard_shuffle" -> q { c =>
      HashSplit.shardShuffle(c.t("documents").select("doc_id"),
        "doc_id", nShards = 8, salt = "ep0").orderBy("shard", "pos")
    },

    // HTML -> text extraction: each doc wrapped in deterministic markup
    // (title/style/script blocks, attributes, the five XML entities,
    // nbsp, a raw '<' inside script); block-content drop, tag strip and
    // entity decode all checked byte-for-byte
    "text_html_extract" -> q { c =>
      val html = concat(
        lit("<html><head><title>D"), col("doc_id"),
        lit("</title><style>p {color: red}</style></head><body><h1>Doc "),
        col("doc_id"),
        lit("</h1><p class=\"body\">"), col("text"),
        lit(" &amp; more &lt;tags&gt; &quot;quoted&quot; A&nbsp;B</p>" +
          "<script>var x = 1 < 2;</script></body></html>"))
      c.t("documents").select(col("doc_id"), html.as("h"))
        .select(col("doc_id"),
          TextClean.tagCount(col("h")).as("n_tags"),
          TextClean.htmlToText(col("h")).as("clean"))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "text_unicode_clean" ->
      s"""WITH p AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0
         |           THEN ' cafe' || chr(769) || ' bell' || chr(7) || 'ring'
         |         WHEN doc_id % 3 = 1
         |           THEN ' caf' || chr(233) || ' tab' || chr(11) || 'split'
         |         ELSE ' A' || chr(778) || 'ngstro' || chr(776) ||
         |              'm data' || chr(65533) || ' end'
         |    END AS ptext
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, ptext,
         |    trim(regexp_replace(regexp_replace(nfc_normalize(ptext),
         |      '$CtrlSql', ' ', 'g'), '\\s+', ' ', 'g')) AS clean,
         |    CAST(len(regexp_extract_all(ptext, '$CtrlSql')) AS INT) AS n_ctrl,
         |    CAST(length(ptext) - length(replace(ptext, chr(65533), ''))
         |         AS INT) AS n_fffd
         |  FROM p)
         |SELECT doc_id, clean, n_ctrl, n_fffd, clean <> ptext AS changed
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_chunk_windows" -> TextClean.chunkOracleSql(width = 32, stride = 24),

    "text_url_domains" ->
      """WITH p AS (
        |  SELECT doc_id, text || ' see https://sub' || (doc_id % 7) ||
        |    '.example' || (doc_id % 3) || '.com/p/' || doc_id ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN ' http://ads.tracker.bad/x?id=' || doc_id ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0
        |         THEN ' https://mirror.example0.com' ELSE '' END AS ptext
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    list_transform(
        |      regexp_extract_all(ptext, 'https?://[^ \t\n\r\f\x0B]+'),
        |      u -> array_to_string(
        |        (string_split(regexp_extract(u, '^https?://([^/]+)', 1),
        |          '.'))[-2:], '.')) AS ds
        |  FROM p),
        |b AS (
        |  SELECT doc_id, ds,
        |    len(list_filter(ds,
        |      d -> d = 'tracker.bad' OR d = 'spam.bad')) AS nb
        |  FROM u)
        |SELECT doc_id, CAST(len(ds) AS INT) AS n_urls,
        |  CAST(nb AS INT) AS n_blocked,
        |  array_to_string(list_sort(list_distinct(ds)), ',') AS domains,
        |  nb = 0 AS keep
        |FROM b ORDER BY doc_id""".stripMargin,

    "text_html_extract" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><head><title>D' || doc_id ||
         |    '</title><style>p {color: red}</style></head><body><h1>Doc ' ||
         |    doc_id || '</h1><p class="body">' || text ||
         |    ' &amp; more &lt;tags&gt; &quot;quoted&quot; A&nbsp;B</p>' ||
         |    '<script>var x = 1 < 2;</script></body></html>' AS html
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT) AS n_tags,
         |  trim(regexp_replace(regexp_replace(nfc_normalize(
         |    replace(replace(replace(replace(replace(replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(html,
         |            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |        '<[^>]*>', ' ', 'g'),
         |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&')),
         |    '$CtrlSql', ' ', 'g'), '\\s+', ' ', 'g')) AS clean
         |FROM h ORDER BY doc_id""".stripMargin,

    "ops_shard_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, md5(doc_id::VARCHAR || '#ep0') AS hh
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, hh,
        |    ('0x' || substr(hh, 1, 8))::BIGINT % 8 AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin
  )
}
