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
}
