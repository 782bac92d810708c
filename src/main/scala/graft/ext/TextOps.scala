package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for large-scale training-data pipelines.
  *
  * Everything here is a pure `Column` expression over a text column —
  * no UDFs, so the whole pack stays inside whole-stage codegen and
  * scales linearly with partitions (each document is independent; no
  * shuffle is ever required by these kernels themselves).
  *
  * Reference inspiration: dlt has no text plane of its own (its scalar
  * work is delegated to destination SQL, SURVEY.md §2.10); these kernels
  * are the training-data extensions called for by the build plan §7.8.
  */
object TextOps {

  /** Whitespace tokens of a document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish token count: alpha runs, digit runs and single punctuation
    * marks each count as one token (a cheap, deterministic approximation
    * of a byte-pair-encoding pre-tokenizer). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / length(text))

  /** Number of tokens that are in `words` (duplicates counted).
    * A native codegen kernel ([[graft.functions.CountInSet]]) — the HOF
    * form `size(filter(tokens, t => array_contains(set, t)))` is a
    * CodegenFallback that re-evaluates the tokenizer interpreted per row
    * and poisons the surrounding codegen stage. */
  def wordHits(text: Column, words: Seq[String]): Column =
    graft.functions.TextFunctions.countInSet(tokens(text), words)

  /** English stopword list used by the default quality heuristic. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are")

  /** Stopword-token ratio (0 for empty text). */
  def stopwordRatio(text: Column, stops: Seq[String] = EnglishStopwords): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(wordHits(text, stops).cast("double") / tokenCount(text))

  /** Mean token length in characters (0 for empty text). */
  def meanTokenLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text))

  /** Composite document-quality score in [0,1]:
    * 40% length signal (saturates at 50 tokens), 30% low-punctuation,
    * 30% stopword presence (saturates at ratio 0.2). Deterministic
    * double arithmetic, mirrored 1:1 by the DuckDB oracle. */
  def qualityScore(text: Column): Column = round(
    lit(0.4) * least(lit(1.0), tokenCount(text).cast("double") / 50.0) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.3) * least(lit(1.0), stopwordRatio(text) * 5.0),
    6)

  /** Per-language function-word profiles for the language-ID heuristic —
    * the "stopword method" of dictionary LID: function words are the
    * highest-frequency, most language-specific tokens, so hit counts
    * separate languages sharply on running text. Profiles are the top
    * function words of each language (public frequency lists). Overlap
    * across Romance languages ("de", "la", "en"…) is fine: argmax over
    * counts resolves it, first-listed wins exact ties. A trigram model
    * would add robustness on very short strings; on document-length
    * inputs the function-word scorer is the standard cheap choice, and
    * it stays a pure codegen expression with an exact SQL mirror. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
      "was", "on", "are", "as", "with", "they", "at", "be", "this", "have",
      "from", "or", "had", "by", "not"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las",
      "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
      "más", "pero", "sus", "le", "ya"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "von", "mit", "den",
      "ein", "eine", "zu", "auf", "für", "im", "dem", "sich", "des", "als",
      "auch", "es", "an", "werden", "aus", "er"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "du", "est", "pour",
      "dans", "qui", "que", "sur", "pas", "plus", "par", "au", "avec", "ne",
      "se", "ce", "il", "sont", "mais"),
    "it" -> Seq("il", "di", "che", "e", "in", "un", "per", "è", "non", "una",
      "sono", "con", "si", "da", "come", "dei", "nel", "alla", "anche", "più",
      "della", "nella", "gli", "ha", "lo"),
    "pt" -> Seq("o", "de", "que", "e", "do", "da", "em", "um", "para", "é",
      "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as",
      "dos", "como", "mas", "foi", "ao"),
    "nl" -> Seq("de", "het", "een", "en", "van", "ik", "te", "dat", "die", "in",
      "is", "hij", "niet", "met", "zijn", "ze", "op", "aan", "er", "maar",
      "om", "ook", "als", "dan", "bij"),
    "ru" -> Seq("и", "в", "не", "на", "я", "что", "он", "с", "как", "это",
      "а", "то", "все", "она", "так", "его", "но", "да", "ты", "к",
      "у", "же", "вы", "за", "бы"))

  /** Per-language evidence score = marker-word hit count. */
  def langScore(text: Column, lang: String): Column =
    wordHits(text, LangProfiles.toMap.apply(lang))

  /** Language-ID: argmax of the per-language scores, first-listed wins
    * ties, "und" (undetermined) when no marker hits at all. */
  def langId(text: Column): Column = {
    val scored = LangProfiles.map { case (l, _) => l -> langScore(text, l) }
    val best = scored.tail.foldLeft(when(lit(true), scored.head._2)) {
      case (acc, (_, s)) => greatest(acc, s)
    }
    scored.foldRight(lit("und")) { case ((l, s), els) =>
      when(s > 0 && s === best, lit(l)).otherwise(els)
    }
  }

  /** Character-TRIGRAM language ID (Cavnar & Trenkle's n-gram method,
    * "N-Gram-Based Text Categorization", 1994): each language gets a
    * profile of its most frequent character trigrams (derived at init
    * from an embedded seed corpus, spaces included so word boundaries
    * count as evidence), a document is scored per language by summed
    * trigram weights in ONE codegen string pass
    * ([[graft.functions.TrigramWeightSum]]), language = argmax.
    * More robust than the function-word scorer ([[langId]]) on short
    * strings and inflected text; both are exact-SQL-mirrorable (the
    * profile is data, not code). */
  object TrigramLid {
    /** Embedded seed corpora (self-authored running text per language;
      * no apostrophes so profiles embed cleanly in SQL literals). */
    val SeedCorpora: Seq[(String, String)] = Seq(
      "en" -> ("the weather was cold and the children were walking to the " +
        "school with their books because they wanted to learn something " +
        "new that day and it was not far from the house where they lived " +
        "with their family and friends who would often visit them there"),
      "es" -> ("el tiempo era frío y los niños caminaban a la escuela con " +
        "sus libros porque querían aprender algo nuevo ese día y no " +
        "estaba lejos de la casa donde vivían con su familia y sus amigos " +
        "que los visitaban muchas veces durante el año"),
      "de" -> ("das wetter war kalt und die kinder gingen mit ihren " +
        "büchern zur schule weil sie an diesem tag etwas neues lernen " +
        "wollten und es war nicht weit von dem haus in dem sie mit ihrer " +
        "familie wohnten und wo ihre freunde sie oft besuchten"),
      "fr" -> ("le temps était froid et les enfants marchaient vers la " +
        "ville avec leurs livres parce que ils voulaient apprendre " +
        "quelque chose de nouveau ce jour et la maison où ils vivaient " +
        "avec leur famille était proche et leurs amis venaient souvent"),
      "it" -> ("il tempo era freddo e i bambini andavano alla scuola con " +
        "i loro libri perché volevano imparare qualcosa di nuovo quel " +
        "giorno e non era lontano dalla casa dove vivevano con la loro " +
        "famiglia e dove i loro amici venivano spesso a trovarli"),
      "pt" -> ("o tempo estava frio e as crianças caminhavam para a " +
        "escola com os seus livros porque queriam aprender algo novo " +
        "naquele dia e não era longe da casa onde viviam com a sua " +
        "família e onde os seus amigos os visitavam muitas vezes"),
      "nl" -> ("het weer was koud en de kinderen liepen naar de school " +
        "met hun boeken omdat ze die dag iets nieuws wilden leren en het " +
        "was niet ver van het huis waar ze met hun familie woonden en " +
        "waar hun vrienden hen vaak kwamen bezoeken"),
      "ru" -> ("погода была холодная и дети шли в школу со своими " +
        "книгами потому что они хотели узнать что то новое в этот день " +
        "и это было не далеко от дома где они жили со своей семьей и " +
        "где их друзья часто бывали в гостях"))

    /** Top-`k` trigram profile of a seed text: rank weights `k - rank`
      * (frequency desc, trigram asc tiebreak — fully deterministic). */
    def profile(seed: String, k: Int = 64): Seq[(String, Int)] = {
      val canon = seed.toLowerCase.replaceAll("\\s+", " ").trim
      val counts = canon.sliding(3).filter(_.length == 3).toSeq
        .groupBy(identity).view.mapValues(_.size).toSeq
      counts.sortBy { case (t, n) => (-n, t) }.take(k)
        .zipWithIndex.map { case ((t, _), i) => (t, k - i) }
    }

    /** lang → trigram profile, derived once. */
    val Profiles: Seq[(String, Seq[(String, Int)])] =
      SeedCorpora.map { case (l, seed) => l -> profile(seed) }

    /** Per-language trigram evidence score (one codegen string pass). */
    def score(text: Column, lang: String): Column =
      graft.functions.TextFunctions.trigramWeightSum(
        canonicalText(text), Profiles.toMap.apply(lang))

    /** Argmax language, first-listed wins exact ties, "und" when no
      * profile trigram matches at all. */
    def langId(text: Column): Column = {
      val scored = Profiles.map { case (l, _) => l -> score(text, l) }
      val best = scored.tail.foldLeft(scored.head._2) {
        case (acc, (_, s)) => greatest(acc, s)
      }
      scored.foldRight(lit("und")) { case ((l, s), els) =>
        when(s > 0 && s === best, lit(l)).otherwise(els)
      }
    }
  }

  /** Duplicate-line ratio: 1 − distinct/total lines — the classic
    * boilerplate signal (repeated nav/footer lines in scraped text).
    * 0 for empty or single-line documents. */
  def duplicateLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    when(size(lines) <= 1, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
  }

  /** Per-document repetition signals as a distributed plan (explode →
    * count — one shuffle on (id, token), scales with the corpus):
    * `top_token_share` = occurrences of the most frequent token over
    * all tokens (templated/spammy text scores high), plus
    * `dup_line_ratio`. The degenerate-document detector that
    * complements [[qualityScore]]'s length/punct/stopword signals. */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame,
      id: String, text: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(id).as("_id"),
        explode(tokens(col(text))).as("tok"))
      .groupBy("_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("_id").agg(max(col("n")).as("top_n"), sum(col("n")).as("total"))
      .select(col("_id"),
        round(col("top_n").cast("double") / col("total"), 6).as("top_token_share"))
    docs.select(col(id).as("_id"),
        round(duplicateLineRatio(col(text)), 6).as("dup_line_ratio"))
      .join(toks, Seq("_id"), "left")
      .select(col("_id").as(id),
        col("dup_line_ratio"),
        coalesce(col("top_token_share"), lit(0.0)).as("top_token_share"))
  }

  /** Gopher-style quality rules (Rae et al. 2021, "Scaling Language
    * Models" §A1.1 — the public heuristic set behind MassiveWeb):
    * documents pass when word count, mean word length, symbol ratio,
    * alphabetic-word ratio and stop-word evidence all sit in the
    * published bands. Exposed as individual signals + the composite
    * flag, each a pure codegen expression with an exact SQL mirror. */
  object Gopher {
    val MinWords = 50
    val MaxWords = 100000
    val MinMeanWordLen = 3.0
    val MaxMeanWordLen = 10.0
    val MaxSymbolRatio = 0.1
    val MinAlphaWordRatio = 0.8
    val MinStopwordHits = 2
    /** Gopher's fixed stop-word list (§A1.1), distinct-presence based. */
    val StopWords: Seq[String] =
      Seq("the", "be", "to", "of", "and", "that", "have", "with")

    /** symbol-to-word ratio: '#' or '...' occurrences per word. */
    def symbolRatio(text: Column): Column =
      when(tokenCount(text) === 0, lit(0.0)).otherwise(
        regexp_count(text, lit("#|\\.\\.\\.")).cast("double") / tokenCount(text))

    /** Share of words containing at least one alphabetic character. */
    def alphaWordRatio(text: Column): Column =
      when(tokenCount(text) === 0, lit(0.0)).otherwise(
        graft.functions.TextFunctions.countMatching(tokens(text), "[A-Za-z]")
          .cast("double") / tokenCount(text))

    /** Number of DISTINCT Gopher stop words present in the text. */
    def stopwordHits(text: Column): Column =
      graft.functions.TextFunctions.countInSet(tokens(text), StopWords,
        distinct = true)

    /** The composite pass/fail flag over all published bands. */
    def passes(text: Column): Column = {
      val n = tokenCount(text)
      n >= MinWords && n <= MaxWords &&
        meanTokenLen(text) >= MinMeanWordLen &&
        meanTokenLen(text) <= MaxMeanWordLen &&
        symbolRatio(text) <= MaxSymbolRatio &&
        alphaWordRatio(text) >= MinAlphaWordRatio &&
        stopwordHits(text) >= MinStopwordHits
    }
  }

  /** PII redaction: emails, IPv4 addresses and phone-shaped digit runs
    * replaced by stable tags (the scrub pass every public web-corpus
    * pipeline runs before training). Patterns stay inside the regex
    * subset Java and RE2 evaluate identically (no lookaround, no
    * backreferences), so the operation is engine-portable and the
    * DuckDB oracle matches byte-for-byte. Order matters: emails first
    * (their local parts contain digits), then IPs (dots would satisfy
    * the phone pattern's separators), then phones. */
  object Pii {
    val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val PhoneRe = "\\+\\d[\\d ()-]{6,}\\d"

    def countEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
    def countIps(text: Column): Column = regexp_count(text, lit(Ipv4Re))
    def countPhones(text: Column): Column = regexp_count(text, lit(PhoneRe))

    /** All three patterns redacted, in the fixed order above. */
    def redact(text: Column): Column =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        PhoneRe, "[PHONE]")
  }

  /** Canonical whitespace-collapsed, lowercased form of a document. */
  def canonicalText(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Content fingerprint: md5 of the canonical text. Stable across
    * retries/partitionings — safe as a dedup/merge key (cf. dlt's
    * content-hash row ids, SURVEY.md §1.4). */
  def fingerprint(text: Column): Column = md5(canonicalText(text))

  /** Distinct word n-gram shingles from a token array column — a native
    * codegen kernel ([[graft.functions.WordShingles]]): one JVM loop per
    * row instead of an interpreted `transform` lambda per shingle
    * position. See [[Dedup.shingleIndex]]. */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    graft.functions.TextFunctions.wordShingles(ts, n)

  /** Distinct word n-gram shingles of a document (n consecutive
    * whitespace tokens joined by a single space). The base unit for
    * Jaccard/MinHash dedup. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(canonicalText(text)), n)
}
