package graft.schema

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Import/export folder sync (reference schema_storage.py:53-178):
  * import overrides on change, export strips processing hints, saves
  * re-link so they don't read as import changes. */
class SchemaStorageSpec extends AnyFunSuite {

  private def dirs() = (
    Files.createTempDirectory("graft-ss-store").toString,
    Files.createTempDirectory("graft-ss-imp").toString,
    Files.createTempDirectory("graft-ss-exp").toString)

  private def reg(name: String, col: String, dt: DataType,
      hints: Seq[(String, String)] = Nil): SchemaRegistry = {
    val r = new SchemaRegistry(name)
    r.register("t", StructType(Seq(StructField(col, dt))),
      TableHints(processingHints = hints))
    r
  }

  test("export strips processing hints; the store keeps them") {
    val (store, imp, exp) = dirs()
    val ss = new SchemaStorage(store, Some(imp), Some(exp))
    val r = reg("s1", "a", LongType,
      hints = Seq("x-normalizer.max-nesting" -> "5"))
    ss.save(r)
    val storedBack = SchemaRegistry.load(store, "s1").get
    assert(storedBack.get("t").get._2.processingHints ===
      Seq("x-normalizer.max-nesting" -> "5"))
    val exported = SchemaRegistry.load(exp, "s1").get
    assert(exported.get("t").get._2.processingHints === Nil,
      "the external form must not carry pipeline-internal hints")
  }

  test("a changed import schema overwrites the stored one, lineage-linked") {
    val (store, imp, exp) = dirs()
    val ss = new SchemaStorage(store, Some(imp), Some(exp))
    ss.save(reg("s2", "a", LongType))
    val beforeHash = SchemaRegistry.load(store, "s2").get.versionHash
    // user drops an edited schema into the import folder
    reg("s2", "a", StringType).exportTo(imp)
    val synced = ss.load("s2").get
    assert(synced.get("t").get._1("a").dataType === StringType,
      "the import folder wins on change")
    assert(synced.lineage.contains(beforeHash),
      "the replaced version must stay in previous_hashes")
    assert(synced.importedVersionHash.isDefined)
    // a second load with an UNCHANGED import folder must not re-overwrite
    val again = ss.load("s2").get
    assert(again.versionHash === synced.versionHash)
    assert(again.lineage === synced.lineage)
  }

  test("loading with no stored schema adopts the import schema") {
    val (store, imp, exp) = dirs()
    val ss = new SchemaStorage(store, Some(imp), Some(exp))
    assert(ss.load("s3").isEmpty)
    reg("s3", "b", DoubleType).exportTo(imp)
    val adopted = ss.load("s3").get
    assert(adopted.get("t").get._1("b").dataType === DoubleType)
    // and it was persisted to the store + export folder
    assert(SchemaRegistry.load(store, "s3").isDefined)
    assert(SchemaRegistry.load(exp, "s3").isDefined)
  }

  test("save re-links against the import schema so it is not re-overwritten") {
    val (store, imp, _) = dirs()
    val ss = new SchemaStorage(store, Some(imp), None)
    reg("s4", "a", LongType).exportTo(imp)
    val r = ss.load("s4").get
    // pipeline evolves the schema past the imported shape and saves
    r.evolve("t", StructType(Seq(StructField("extra", LongType))))
    ss.save(r)
    val back = ss.load("s4").get
    assert(back.get("t").get._1.fieldNames.toSeq === Seq("a", "extra"),
      "an unchanged import folder must not roll back a saved evolution")
  }

  test("saveImportIfNotExists seeds the folder exactly once") {
    val (store, imp, _) = dirs()
    val ss = new SchemaStorage(store, Some(imp), None)
    val r = reg("s5", "a", LongType, hints = Seq("x-k" -> "v"))
    assert(ss.saveImportIfNotExists(r))
    assert(!ss.saveImportIfNotExists(r), "second seed must be a no-op")
    val seeded = SchemaRegistry.load(imp, "s5").get
    assert(seeded.get("t").get._2.processingHints === Nil,
      "the seeded import file is the stripped external form")
    assert(r.importedVersionHash === Some(seeded.versionHash))
  }

  test("hint keys/values containing delimiters round-trip the store") {
    val (store, _, _) = dirs()
    val ss = new SchemaStorage(store)
    ss.save(reg("s7", "a", LongType,
      hints = Seq("x-a" -> "1;2", "x-b=c" -> "v=w", "x-pct" -> "100%")))
    val back = ss.load("s7").get.get("t").get._2.processingHints
    assert(back === Seq("x-a" -> "1;2", "x-b=c" -> "v=w", "x-pct" -> "100%"))
  }

  test("an exported file's embedded hash matches its own stripped content") {
    val (store, _, exp) = dirs()
    val r = reg("s8", "a", LongType, hints = Seq("x-k" -> "v"))
    r.exportTo(exp)
    val loaded = SchemaRegistry.load(exp, "s8").get
    // the re-loaded (stripped) registry recomputes the same hash the
    // file carries — i.e. the export hashed WHAT IT WROTE
    assert(loaded.versionHash === r.strippedVersionHash)
    assert(loaded.versionHash !== r.versionHash,
      "hints must change the full hash, or stripping is untested")
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(exp, "s8.schema.json")), "UTF-8")
    assert(s.contains("\"version_hash\":\"" + r.strippedVersionHash + "\""))
  }

  test("hint-less tables hash identically to the pre-v3 form; v2 files migrate") {
    val (store, _, _) = dirs()
    val r = reg("s9", "a", LongType)
    // pre-v3 canonical: table|schemaJson|TableHints(None,append,List(),List(),List())
    val schema = r.get("t").get._1
    val canonical = s"t|${schema.json}|TableHints(None,append,List(),List(),List())"
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes("UTF-8"))
    val legacy = java.util.Base64.getEncoder.encodeToString(d).take(27)
    assert(r.versionHash === legacy,
      "adding the processingHints field must not move hint-less hashes")
    // a v2 file (no processing_hints / imported_version_hash) loads
    r.save(store)
    val p = java.nio.file.Paths.get(store, "s9.schema.json")
    val edited = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replace("\"engine_version\":3", "\"engine_version\":2")
      .replace("\"processing_hints\":\"\",", "")
    java.nio.file.Files.write(p, edited.getBytes("UTF-8"))
    val back = SchemaRegistry.load(store, "s9").get
    assert(back.versionHash === legacy)
  }

  test("no import path configured: plain store round-trip") {
    val (store, _, _) = dirs()
    val ss = new SchemaStorage(store)
    assert(ss.load("s6").isEmpty)
    ss.save(reg("s6", "a", LongType))
    assert(ss.load("s6").get.get("t").get._1("a").dataType === LongType)
  }
}
