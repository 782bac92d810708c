package graft.incremental

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

/** Pipeline-state persistence for incremental cursors (reference
  * `_dlt_pipeline_state`, dlt/pipeline/state_sync.py:95-139). One JSON
  * file per pipeline, one entry per resource+cursor — the Structured
  * Streaming checkpoint analog for batch loads. Writes are atomic
  * (temp file + rename). */
final class StateStore(dir: String) {

  private def path(pipeline: String) = Paths.get(dir, s"$pipeline.state.json")

  def load(pipeline: String, key: String): Incremental.State = {
    val p = path(pipeline)
    if (!Files.exists(p)) return Incremental.State.empty
    val body = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    // one line per key: <urlenc key>\t<urlenc last>\t<h1,h2,...>
    body.linesIterator.map(_.split("\t", -1)).collectFirst {
      case Array(k, last, hashes) if dec(k) == key =>
        Incremental.State(
          if (last.isEmpty) None else Some(dec(last)),
          if (hashes.isEmpty) Nil else hashes.split(",").map(dec).toSeq)
    }.getOrElse(Incremental.State.empty)
  }

  def save(pipeline: String, key: String, state: Incremental.State): Unit = synchronized {
    val p = path(pipeline)
    Files.createDirectories(p.getParent)
    val existing: Seq[String] =
      if (Files.exists(p))
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .linesIterator.filterNot(l => dec(l.split("\t", -1)(0)) == key).toSeq
      else Nil
    val line = Seq(enc(key), state.lastValue.map(enc).getOrElse(""),
      state.boundaryHashes.map(enc).mkString(",")).mkString("\t")
    val tmp = Paths.get(p.toString + ".tmp")
    Files.write(tmp, (existing :+ line).mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop state entries whose key starts with `keyPrefix` (refresh
    * modes drop per-resource cursor state; reference pipeline/drop.py). */
  def clear(pipeline: String, keyPrefix: String = ""): Unit = synchronized {
    val p = path(pipeline)
    if (Files.exists(p)) {
      val kept = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator
        .filterNot(l => dec(l.split("\t", -1)(0)).startsWith(keyPrefix)).toSeq
      val tmp = Paths.get(p.toString + ".tmp")
      Files.write(tmp, kept.mkString("\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Raw serialized state of a pipeline ("" when absent) — what gets
    * synced into `_dlt_pipeline_state` on the destination. */
  def dump(pipeline: String): String = synchronized {
    val p = path(pipeline)
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8) else ""
  }

  def exists(pipeline: String): Boolean = Files.exists(path(pipeline))

  /** Hydrate the local file from a raw destination-synced snapshot
    * (the restore half of reference state_sync.py:95-139). */
  def restore(pipeline: String, raw: String): Unit = synchronized {
    val p = path(pipeline)
    Files.createDirectories(p.getParent)
    val tmp = Paths.get(p.toString + ".tmp")
    Files.write(tmp, raw.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
}
