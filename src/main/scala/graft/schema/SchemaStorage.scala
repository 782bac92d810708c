package graft.schema

import java.nio.file.{Files, Paths}

/** Schema store with IMPORT/EXPORT folder sync (reference
  * dlt/common/storages/schema_storage.py:53-88): the working store at
  * `dir` holds the pipeline's live registries; an optional
  * `importPath` is a user-editable folder whose schemas OVERRIDE the
  * stored ones whenever they change, and an optional `exportPath`
  * receives the external (processing-hint-stripped) form after every
  * save — the CLI workflow where a schema is reviewed/edited as a file
  * while the pipeline keeps its own versioned copy.
  *
  * Sync rules (mirroring `_maybe_import_schema`,
  * schema_storage.py:126-178):
  *  - load, no stored schema, import file present → adopt the imported
  *    schema, remember its hash (`imported_version_hash`), persist to
  *    the store (and export).
  *  - load, stored schema present, import hash ≠ the hash recorded at
  *    the last sync → the import folder moved: overwrite the stored
  *    content with it (lineage-linked), re-record, persist.
  *  - import file absent → the store alone decides.
  *  - save → re-link against the current import schema (so a save does
  *    not masquerade as an import change), write the store form, and
  *    export the stripped external form.
  */
final class SchemaStorage(val dir: String,
    importPath: Option[String] = None,
    exportPath: Option[String] = None) {

  /** Load `name`, applying the import-folder override rules. */
  def load(name: String): Option[SchemaRegistry] = {
    val stored = SchemaRegistry.load(dir, name)
    val imported = importPath.flatMap(SchemaRegistry.load(_, name))
    (stored, imported) match {
      case (None, Some(imp)) =>
        // first sight of the import schema: adopt it wholesale
        imp.importedHash = Some(imp.versionHash)
        persist(imp)
        Some(imp)
      case (Some(st), Some(imp))
          if !st.importedVersionHash.contains(imp.versionHash) =>
        // the import folder changed since the last sync: it wins
        st.replaceContentWith(imp)
        st.importedHash = Some(imp.versionHash)
        persist(st)
        Some(st)
      case _ => stored
    }
  }

  /** Save a registry: link to the current import schema (if any), then
    * store + export. */
  def save(reg: SchemaRegistry): Unit = {
    importPath.flatMap(SchemaRegistry.load(_, reg.name))
      .foreach(imp => reg.importedHash = Some(imp.versionHash))
    persist(reg)
  }

  /** Seed the import folder with this registry's EXTERNAL form if no
    * import schema exists yet (reference
    * `save_import_schema_if_not_exists`, schema_storage.py:80-93);
    * returns true when seeded. */
  def saveImportIfNotExists(reg: SchemaRegistry): Boolean =
    importPath.exists { ip =>
      val p = Paths.get(ip, s"${reg.name}.schema.json")
      if (Files.exists(p)) false
      else {
        reg.exportTo(ip)
        // the stripped external file is what future loads will hash
        reg.importedHash = Some(reg.strippedVersionHash)
        true
      }
    }

  private def persist(reg: SchemaRegistry): Unit = {
    reg.save(dir)
    exportPath.foreach(reg.exportTo)
  }
}
