package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus text canonicalization and structural prep — the "fix the
  * bytes before anything hashes them" stage every web-scale pipeline
  * runs first (CCNet/ftfy discipline), plus token-window chunking and
  * URL/domain extraction.
  *
  * Reference analogs: dlt normalizes IDENTIFIERS but ships text values
  * through untouched; these operators cover the corpus-side text plane
  * a training pipeline needs on top. All are pure projections (no
  * shuffle, no state) except [[chunkWindows]]'s explode — map-side
  * only, scales embarrassingly.
  *
  * Engine-portability contract (what makes the DuckDB oracles exact):
  *  - NFC via UAX #15 on both engines (JDK Normalizer / utf8proc);
  *  - control stripping uses an EXPLICIT hex class, never `\p{Cntrl}`
  *    (ASCII-only in Java, Unicode in RE2) — and the class includes
  *    \x0B (vertical tab) because Java's `\s` matches it while RE2's
  *    does not: once controls are gone, `\s+` collapse agrees.
  */
object TextClean {

  /** C0 controls except \t \n \r (whitespace, collapsed later) plus
    * DEL. \x0B/\x0C included here — see the portability note above. */
  val ControlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Unicode NFC canonical composition (codegen expression; identity
    * fast path for already-normalized text). */
  def nfc(text: Column): Column = TextFunctions.nfcNormalize(text)

  /** Count of control characters that [[clean]] will strip. */
  def controlCount(text: Column): Column =
    regexp_count(text, lit(ControlClass)).cast("int")

  /** Count of U+FFFD replacement characters — the mojibake signal: a
    * high count means an upstream decode already destroyed bytes. */
  def replacementCount(text: Column): Column =
    (length(text) - length(replace(text, lit("�"), lit("")))).cast("int")

  /** Canonical text: NFC-compose, replace control characters with
    * spaces (they act as separators, never as glue), collapse
    * whitespace runs, trim. Idempotent. */
  def clean(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(text), ControlClass, " "), "\\s+", " "))

  /** Per-document canonicalization report: the cleaned text plus the
    * signals a quality filter keys on. */
  def cleanReport(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
      clean(col(text)).as("clean"),
      controlCount(col(text)).as("n_ctrl"),
      replacementCount(col(text)).as("n_fffd"),
      (clean(col(text)) =!= col(text)).as("changed"))

  /** Sliding token-window chunking — the splitting half of context-
    * window prep (the packing half is SequencePack): every document
    * becomes ceil((n−width)/stride)+1 chunks of `width` whitespace
    * tokens starting every `stride` tokens (trailing chunk may be
    * short; a short document yields exactly one chunk). Pure
    * projection + explode: tokens are materialized once per row, each
    * chunk is an O(width) slice — no shuffle, no window function.
    * Output: (id, chunk_idx, n_tokens, fp) with fp = md5 of the
    * space-joined chunk, the id chunk-level dedup keys on. */
  def chunkWindows(docs: DataFrame, id: String, text: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      "need 0 < stride <= width")
    val nChunks = when(col("__n") <= width, lit(1))
      .otherwise(ceil((col("__n") - lit(width)).cast("double") / stride)
        .cast("int") + lit(1))
    docs.select(col(id), TextOps.tokens(col(text)).as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .select(col(id), col("chunk_idx"),
        slice(col("__ts"), col("chunk_idx") * stride + 1, lit(width)).as("__ck"))
      .select(col(id), col("chunk_idx"),
        size(col("__ck")).as("n_tokens"),
        md5(array_join(col("__ck"), " ")).as("fp"))
  }

  /** The matching DuckDB re-derivation of [[chunkWindows]] over
    * `documents(doc_id, text)`. */
  def chunkOracleSql(width: Int, stride: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, ts,
       |    CASE WHEN len(ts) <= $width THEN 1
       |         ELSE CAST(ceil((len(ts) - $width)::DOUBLE / $stride) AS INT) + 1
       |    END AS n_chunks
       |  FROM toks)
       |SELECT doc_id, i AS chunk_idx, len(ck) AS n_tokens,
       |  md5(array_to_string(ck, ' ')) AS fp
       |FROM base,
       |  LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i) g,
       |  LATERAL (SELECT ts[i * $stride + 1 : i * $stride + $width] AS ck) c
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** HTML → text extraction (the first stage of every web-corpus
    * pipeline; the trafilatura-lite core): drop script/style blocks
    * WITH their content, strip remaining tags, decode the five XML
    * entities plus nbsp, then [[clean]]. Engine-portable by
    * construction: block patterns are spelled per tag (RE2 has no
    * backreferences, so `</\1>` is off the table), `(?is)` + lazy
    * `.*?` are common to RE2 and java.util.regex, and entity decoding
    * is a literal replace chain with `&amp;` LAST (decoding it first
    * would double-decode `&amp;lt;`). */
  def htmlToText(html: Column): Column = {
    val noBlocks = Seq("script", "style").foldLeft(html)((c, t) =>
      regexp_replace(c, s"(?is)<$t[^>]*>.*?</$t>", " "))
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    clean(decoded)
  }

  /** Count of markup tags the extraction strips — the "how HTML was
    * this document" signal. */
  def tagCount(html: Column): Column =
    regexp_count(html, lit("<[^>]*>")).cast("int")

  /** URL / domain audit per document — the RefinedWeb-style URL
    * filtering primitive: extract every URL's registered domain
    * (native one-pass kernel, no regex at runtime), count blocklist
    * hits (codegen set probe). The whole audit is ONE map-side
    * projection of two codegen kernels plus builtin array functions —
    * domain-level aggregation composes downstream (`groupBy(domain)`)
    * when the caller wants corpus counts.
    * Output: (id, n_urls, n_blocked, domains csv-sorted, keep). */
  def urlDomainAudit(docs: DataFrame, id: String, text: String,
      blocklist: Seq[String]): DataFrame = {
    val domains = TextFunctions.urlDomains(col(text))
    val nBlocked = TextFunctions.countInSet(domains, blocklist)
    docs.select(col(id),
      size(domains).as("n_urls"),
      nBlocked.as("n_blocked"),
      array_join(array_sort(array_distinct(domains)), ",").as("domains"),
      (nBlocked === 0).as("keep"))
  }
}
