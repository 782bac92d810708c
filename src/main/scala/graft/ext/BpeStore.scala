package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.write.TableStore

/** Tokenizer-as-artifact lifecycle: train the BPE merge table once,
  * PERSIST it (merge table + segmented vocabulary) through the
  * lakehouse sink, and encode any later corpus from the stored
  * artifact — training never re-runs per consumer, which is the whole
  * point of a tokenizer at 100 TB (the reference's analog is dlt's
  * schema/state artifacts persisting across pipeline runs; the same
  * persistence discipline as [[graft.write.VectorSink]] and
  * [[IncrementalDedup]]).
  *
  * Tables written: `<name>__merges` (round, merge_a, merge_b, merged,
  * score) — the portable artifact any external tokenizer can load —
  * and `<name>__vocab` (w, cnt, rep), the segmented-word table the
  * apply/encode joins consume directly. Both commit atomically.
  *
  * OOV contract: [[encodeFrom]] joins through the stored vocabulary,
  * so words unseen at training time drop out of the encoding (the
  * closed-vocab convention the oracle mirrors); a real deployment
  * extends the vocab table with a byte-fallback before encoding new
  * corpora. */
object BpeStore {

  /** Train on `docs` and persist the artifact under `name` — a
    * RE-SAVE REPLACES the previous artifact (retraining must never
    * interleave two merge tables). Each table's commit is atomic; the
    * vocab lands first and the merge table last, so a crash between
    * the two leaves the previous merges alongside a newer vocab —
    * re-run `save` to converge (single-writer maintenance op, like
    * index builds). */
  def save(store: TableStore, name: String, docs: DataFrame,
      text: String, rounds: Int): Unit = Dedup.withPins {
    val (merges, reps) = BpeTrainer.trainWithVocab(docs, text, rounds)
    val pinned = Dedup.pin(reps)
    // the fallback id table is keyed to the OLD vocab's id space: a
    // retrain re-ranks symbol ids, so stale fallback rows would both
    // duplicate chars now in the vocab and numerically collide with
    // new stored ids — the whole artifact is replaced, fallback
    // included. Dropped FIRST: a crash mid-save then leaves old vocab
    // + no fallback (regenerated on next encode), never new vocab +
    // stale fallback.
    store.drop(s"${name}__fallback")
    store.overwrite(s"${name}__vocab", pinned.select("w", "cnt", "rep"))
    store.overwrite(s"${name}__merges", merges)
  }

  /** The stored merge table in learning order. */
  def merges(store: TableStore, name: String): DataFrame =
    store.read(s"${name}__merges").orderBy("round")

  /** Encode `docs` with the STORED vocabulary — no training pass. */
  def encodeFrom(store: TableStore, name: String, docs: DataFrame,
      id: String, text: String): DataFrame =
    BpeTrainer.encodeWith(docs, id, text, store.read(s"${name}__vocab"))

  /** [[encodeFrom]] with CHARACTER FALLBACK — encoding becomes TOTAL:
    * a word outside the stored vocabulary segments to its characters
    * (the zero-merge segmentation), and characters outside the stored
    * symbol set get NEW ids appended AFTER the artifact's — stored
    * symbols keep their exact [[encodeFrom]] ids, so fallback encoding
    * of an in-vocab corpus is bit-identical to the strict path (the
    * artifact-stability contract; the byte-fallback convention of
    * SentencePiece-style tokenizers).
    *
    * Fallback ids are PERSISTED (`<name>__fallback`, appended as new
    * characters first appear), so the same character encodes to the
    * same id in every batch — token streams from different batches
    * stay mutually consistent. Like the other index-maintenance ops,
    * concurrent first-sightings of the same character are a
    * single-writer contract (serialize encode-with-fallback calls per
    * artifact).
    *
    * PIN LIFECYCLE: the vocab/rep/symbol caches pinned here are scoped
    * to this call ([[Dedup.withPins]]) — they serve the eager steps
    * (offset count, new-symbol detection, fallback append) and release
    * on return, so batch-after-batch callers don't grow the cache
    * unboundedly. The RETURNED frame's inputs are all re-readable from
    * the store, so it recomputes correctly after the pins release. */
  def encodeFromWithFallback(store: TableStore, name: String,
      docs: DataFrame, id: String, text: String): DataFrame = Dedup.withPins {
    import org.apache.spark.sql.expressions.Window
    val vocab = Dedup.pin(store.read(s"${name}__vocab"))
    val words = docs
      .select(explode(TextOps.tokens(col(text))).as("w"))
      .where(length(col("w")) > 0).distinct()
    val oov = words.join(vocab.select("w"), Seq("w"), "left_anti")
      .select(col("w"), lit(0L).as("cnt"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("rep"))
    val reps = Dedup.pin(vocab.select("w", "cnt", "rep").unionByName(oov))
    // two-tier ids: stored symbols rank first (identical to strict
    // encode); fallback characters continue after the highest id ever
    // assigned, with previously seen fallback chars keeping their ids
    val storedSyms = Dedup.pin(vocab
      .select(explode(split(trim(col("rep")), " ")).as("sym")).distinct()
      .withColumn("tok_id",
        row_number().over(Window.orderBy("sym")).cast("long")))
    val offset = storedSyms.agg(count(lit(1))).head().getLong(0)
    val existing = store.readOption(s"${name}__fallback")
    val nextAfter = existing.fold(offset)(e =>
      e.agg(coalesce(max("tok_id"), lit(offset))).head().getLong(0))
    val known = existing.fold(storedSyms.select("sym"))(e =>
      storedSyms.select("sym").unionByName(e.select("sym")))
    val newSyms = oov
      .select(explode(split(trim(col("rep")), " ")).as("sym")).distinct()
      .join(known, Seq("sym"), "left_anti")
      .withColumn("tok_id",
        (row_number().over(Window.orderBy("sym")) + nextAfter).cast("long"))
    if (!newSyms.isEmpty) store.append(s"${name}__fallback", newSyms)
    // guard: a fallback row whose char is ALSO a stored symbol (only
    // possible if a stale fallback table survived outside save()'s
    // replace) would double-count every occurrence — stored ids win
    val fallback = store.readOption(s"${name}__fallback")
      .fold(storedSyms.limit(0))(e =>
        e.join(storedSyms.select("sym"), Seq("sym"), "left_anti"))
    BpeTrainer.encodeWithIds(docs, id, text, reps,
      Some(storedSyms.unionByName(fallback)))
  }
}
