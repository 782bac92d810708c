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

  /** Train on `docs` and persist the artifact under `name`. */
  def save(store: TableStore, name: String, docs: DataFrame,
      text: String, rounds: Int): Unit = Dedup.withPins {
    val (merges, reps) = BpeTrainer.trainWithVocab(docs, text, rounds)
    val pinned = Dedup.pin(reps)
    store.append(s"${name}__merges", merges)
    store.append(s"${name}__vocab", pinned.select("w", "cnt", "rep"))
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
    * SentencePiece-style tokenizers). */
  def encodeFromWithFallback(store: TableStore, name: String,
      docs: DataFrame, id: String, text: String): DataFrame = {
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
    // encode), fallback characters append after the stored max
    val storedSyms = Dedup.pin(vocab
      .select(explode(split(trim(col("rep")), " ")).as("sym")).distinct()
      .withColumn("tok_id",
        row_number().over(Window.orderBy("sym")).cast("long")))
    val offset = storedSyms.agg(count(lit(1))).head().getLong(0)
    val fallbackSyms = oov
      .select(explode(split(trim(col("rep")), " ")).as("sym")).distinct()
      .join(storedSyms.select("sym"), Seq("sym"), "left_anti")
      .withColumn("tok_id",
        (row_number().over(Window.orderBy("sym")) + offset).cast("long"))
    BpeTrainer.encodeWithIds(docs, id, text, reps,
      Some(storedSyms.unionByName(fallbackSyms)))
  }
}
