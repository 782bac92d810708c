package graft.ext

import org.apache.spark.sql.DataFrame

import graft.write.TableStore

/** Unigram tokenizer as a PERSISTED artifact — the [[BpeStore]]
  * lifecycle on the [[UnigramTrainer]] family: train once, commit the
  * piece table + segmented vocabulary through the lakehouse sink,
  * encode any later corpus from the stored artifact.
  *
  * Tables written: `<name>__pieces` (piece, usage, tok_id) — the
  * portable vocabulary an external tokenizer can load — and
  * `<name>__vocab` (w, cnt, rep), the segmented-word table the
  * apply/encode joins consume directly ([[BpeTrainer]]'s `rep`
  * layout, so the whole BPE apply surface — including
  * [[BpeStore.encodeFromWithFallback]]'s conventions — transfers).
  *
  * Same OOV contract as [[BpeStore.encodeFrom]]: the encode joins
  * through the stored vocabulary, so words unseen at training time
  * drop out (closed-vocab, oracle-mirrored). */
object UnigramStore {

  /** Train on `docs` and persist under `name` — a re-save REPLACES the
    * previous artifact (vocab first, pieces last; a crash between the
    * two leaves the previous pieces beside a newer vocab — re-run
    * `save` to converge, the [[BpeStore.save]] single-writer
    * discipline). */
  def save(store: TableStore, name: String, docs: DataFrame,
      text: String, cfg: UnigramTrainer.Config): Unit = Dedup.withPins {
    val (pieces, reps) = UnigramTrainer.trainWithVocab(docs, text, cfg)
    store.overwrite(s"${name}__vocab", Dedup.pin(reps).select("w", "cnt", "rep"))
    store.overwrite(s"${name}__pieces", pieces)
  }

  /** The stored piece table in tok_id order. */
  def pieces(store: TableStore, name: String): DataFrame =
    store.read(s"${name}__pieces").orderBy("tok_id")

  /** Encode `docs` with the STORED vocabulary — no training pass. */
  def encodeFrom(store: TableStore, name: String, docs: DataFrame,
      id: String, text: String): DataFrame =
    BpeTrainer.encodeWith(docs, id, text, store.read(s"${name}__vocab"))
}
