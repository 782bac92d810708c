package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT-substring contamination screen — the long-overlap complement
  * of [[Dedup.contaminationScores]]: the n-gram screen scores docs by
  * SHARED SHINGLE fraction (bounded at n tokens of context), so a
  * 40-character verbatim quote from an eval benchmark scores the same
  * as 40 characters of coincidental shingle overlap. This operator
  * reports, per training document, the length of the LONGEST exact
  * character substring it shares with ANY eval document — the
  * "verbatim span" quantity decontamination pipelines gate on
  * (reference: dlt has no analog; the published pipelines are the
  * benchmark-decontamination sections of the GPT-3/PaLM reports).
  *
  * Shape, 100 TB first: eval sets are SMALL BY NATURE (a benchmark is
  * thousands of documents, not billions — the same bounded-side
  * contract as [[IncrementalDedup]]'s seed index). The eval corpus is
  * collected once, compiled into a GENERALIZED SUFFIX AUTOMATON on the
  * driver (O(Σ|eval| · alphabet) states, linear construction), and
  * BROADCAST; each training document then streams through the
  * automaton in O(|doc|) — one map-only pass over the training corpus,
  * no shuffle, no corpus². The automaton walk is genuine per-row
  * imperative logic (state machine with suffix-link fallbacks), so it
  * rides a broadcast-closure UDF — the documented escape hatch when an
  * `Expression` would re-implement a pointer machine.
  *
  * `cap` bounds the REPORTED length (min(actual, cap), default 64):
  * the external SQL re-derivation sorts cap-truncated suffixes of both
  * corpora and takes per-doc max LCP against the nearest eval
  * neighbors (the suffix-array adjacency argument: for sorted strings
  * a ≤ b ≤ c, lcp(a,c) = min(lcp(a,b), lcp(b,c)), so the max against
  * ANY eval suffix is achieved at an adjacent one) — identical
  * integers at any cap, and a pipeline gating "overlap ≥ 50 chars"
  * never needs the uncapped value. */
object SuffixContamination {

  /** Per-training-doc longest shared substring length (capped):
    * (id, overlap_len). Documents with no shared character at all
    * report 0. `eval` is collected to the driver — the bounded-side
    * contract above; refuse nothing here because a too-big eval set
    * fails loudly at collect. */
  def maxOverlap(train: DataFrame, eval: DataFrame, id: String,
      text: String, cap: Int = 64): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val evalTexts = eval.select(col(text)).collect()
      .map(r => Option(r.getString(0)).getOrElse(""))
    val sam = SuffixAutomaton.build(evalTexts)
    val spark = train.sparkSession
    val bc = spark.sparkContext.broadcast(sam)
    val capB = cap
    val overlap = udf((s: String) =>
      if (s == null) 0 else math.min(bc.value.longestMatch(s), capB))
    train.select(col(id), overlap(col(text)).as("overlap_len"))
      .orderBy(id)
  }

  /** The DuckDB re-derivation over the driver `documents` fixture
    * (docs < `evalSplit` are the eval side, the rest train — the
    * text_contamination convention), STATIC — no run-time literals:
    * cap-truncated suffixes of both sides sort together; each train
    * suffix takes its LCP against the nearest eval suffix above and
    * below (equal strings sort eval-first so a full match is always
    * adjacent); per-doc max is the answer. */
  def oracleSql(evalSplit: Int, cap: Int = 64): String =
    s"""WITH sufe AS MATERIALIZED (
       |  SELECT substr(text, p.p, $cap) AS s
       |  FROM documents, LATERAL (
       |    SELECT unnest(generate_series(1, length(text))) AS p) p
       |  WHERE doc_id < $evalSplit),
       |suft AS MATERIALIZED (
       |  SELECT doc_id, substr(text, p.p, $cap) AS s
       |  FROM documents, LATERAL (
       |    SELECT unnest(generate_series(1, length(text))) AS p) p
       |  WHERE doc_id >= $evalSplit),
       |u AS (
       |  SELECT doc_id, s, FALSE AS is_eval FROM suft
       |  UNION ALL
       |  SELECT NULL AS doc_id, s, TRUE AS is_eval FROM sufe),
       |nb AS MATERIALIZED (
       |  SELECT doc_id, s, is_eval,
       |    last_value(CASE WHEN is_eval THEN s END IGNORE NULLS)
       |      OVER (ORDER BY s, is_eval DESC
       |            ROWS UNBOUNDED PRECEDING) AS prev_e,
       |    first_value(CASE WHEN is_eval THEN s END IGNORE NULLS)
       |      OVER (ORDER BY s, is_eval DESC
       |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_e
       |  FROM u),
       |scored AS (
       |  SELECT doc_id,
       |    greatest(
       |      coalesce((SELECT max(l.l)
       |        FROM (SELECT unnest(generate_series(1, $cap)) AS l) l
       |        WHERE substr(s, 1, l.l) = substr(prev_e, 1, l.l)
       |          AND length(s) >= l.l AND length(prev_e) >= l.l), 0),
       |      coalesce((SELECT max(l.l)
       |        FROM (SELECT unnest(generate_series(1, $cap)) AS l) l
       |        WHERE substr(s, 1, l.l) = substr(next_e, 1, l.l)
       |          AND length(s) >= l.l AND length(next_e) >= l.l), 0)
       |    ) AS lcp
       |  FROM nb WHERE NOT is_eval),
       |agg AS (
       |  SELECT doc_id, max(lcp) AS ov FROM scored GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(agg.ov, 0)::BIGINT AS overlap_len
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= $evalSplit) d
       |LEFT JOIN agg USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  // ^ LEFT JOIN from the full train-doc list: a NULL/empty train text
  // yields no suffix rows, but the engine's maxOverlap still reports
  // (doc_id, 0) for it — the previous GROUP-BY-only shape dropped such
  // docs and would hash-mismatch on an in-contract fixture (no
  // current fixture has one; identical output on all of them).
}

/** Generalized suffix automaton (Blumer et al. 1985 construction as
  * popularized for competitive string matching): linear-time online
  * build over the eval corpus joined with a separator OUTSIDE the text
  * alphabet (NUL), so no matchable substring spans two eval
  * documents (any spanning substring contains the separator and query
  * texts never do). [[longestMatch]] is the standard walk: extend on a
  * transition, shrink through suffix links on a mismatch — O(|query|)
  * amortized. Transitions live in per-state open-addressed char maps
  * (HashMap[Char, Int]); states are struct-of-arrays for broadcast
  * compactness. */
final class SuffixAutomaton private (
    val link: Array[Int], val len: Array[Int],
    val trans: Array[scala.collection.mutable.HashMap[Char, Int]])
    extends Serializable {

  /** Longest substring of `s` that is a substring of the indexed
    * corpus. */
  def longestMatch(s: String): Int = {
    var cur = 0; var curLen = 0; var best = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      while (cur != 0 && !trans(cur).contains(c)) {
        cur = link(cur); curLen = len(cur)
      }
      trans(cur).get(c) match {
        case Some(nxt) => cur = nxt; curLen += 1
        case None => cur = 0; curLen = 0
      }
      if (curLen > best) best = curLen
      i += 1
    }
    best
  }
}

object SuffixAutomaton {
  private final val Sep = '\u0000'

  def build(texts: Seq[String]): SuffixAutomaton = {
    import scala.collection.mutable
    val total = texts.map(_.length + 1).sum + 1
    val cap = math.max(4, 2 * total)
    val link = new Array[Int](cap)
    val len = new Array[Int](cap)
    val trans = Array.fill(cap)(mutable.HashMap.empty[Char, Int])
    var size = 1
    link(0) = -1; len(0) = 0
    var last = 0
    def extend(c: Char): Unit = {
      // online SAM extension; the separator resets nothing — it is a
      // real symbol, and the no-spanning guarantee comes from queries
      // never containing it
      trans(last).get(c) match {
        case Some(q) if len(q) == len(last) + 1 =>
          // the transition is already solid (repeated corpus content —
          // common across near-duplicate eval docs): just advance
          last = q
        case Some(q) =>
          // clone q into a solid state (standard split)
          val clone = size; size += 1
          len(clone) = len(last) + 1
          link(clone) = link(q)
          trans(clone) ++= trans(q)
          var p = last
          while (p != -1 && trans(p).get(c).contains(q)) {
            trans(p)(c) = clone; p = link(p)
          }
          link(q) = clone
          last = clone
        case None =>
          val cur = size; size += 1
          len(cur) = len(last) + 1
          link(cur) = -2 // provisional
          var p = last
          while (p != -1 && !trans(p).contains(c)) {
            trans(p)(c) = cur; p = link(p)
          }
          if (p == -1) link(cur) = 0
          else {
            val q = trans(p)(c)
            if (len(p) + 1 == len(q)) link(cur) = q
            else {
              val clone = size; size += 1
              len(clone) = len(p) + 1
              link(clone) = link(q)
              trans(clone) ++= trans(q)
              while (p != -1 && trans(p).get(c).contains(q)) {
                trans(p)(c) = clone; p = link(p)
              }
              link(q) = clone; link(cur) = clone
            }
          }
          last = cur
      }
    }
    texts.foreach { t =>
      t.foreach(extend)
      extend(Sep)
    }
    new SuffixAutomaton(
      java.util.Arrays.copyOf(link, size),
      java.util.Arrays.copyOf(len, size),
      java.util.Arrays.copyOfRange(trans.asInstanceOf[Array[AnyRef]], 0, size)
        .asInstanceOf[Array[mutable.HashMap[Char, Int]]])
  }
}
