package graft.write

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PruningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("prune").toString

  test("segments carry min/max stats captured during the write") {
    val store = new TableStore(tmp(), spark)
    store.append("t", Seq((1L, "a"), (5L, "b")).toDF("id", "v"), statsFor = Seq("id"))
    val Seq(seg) = store.segments("t")
    assert(seg.stats("id") === ColStats("1", "5", numeric = true))
  }

  test("merge rewrites only segments overlapping the staged key range") {
    val store = new TableStore(tmp(), spark)
    val d = new Dispositions(store, spark)
    // three disjoint segments: [1,10], [100,110], [1000,1010]
    Seq(1L to 10L, 100L to 110L, 1000L to 1010L).foreach { r =>
      store.append("t", r.map(i => (i, s"v$i")).toDF("id", "v"), statsFor = Seq("id"))
    }
    val before = store.segments("t").map(_.name)
    assert(before.size === 3)

    // staging hits only the middle range
    val staging = Seq((105L, "NEW"), (200L, "INS")).toDF("id", "v")
    d.merge("t", staging, MergeConfig(primaryKey = Seq("id")), "2")

    val after = store.segments("t").map(_.name)
    // first and third segments survive untouched; middle was rewritten
    assert(after.contains(before(0)) && after.contains(before(2)))
    assert(!after.contains(before(1)))
    assert(after.size === 3) // 2 kept + 1 merge result

    val out = store.read("t")
    assert(out.count() === 10 + 11 + 11 + 1) // +1 inserted key 200
    assert(out.filter(col("id") === 105).select("v").as[String].head() === "NEW")
    assert(out.filter(col("id") === 200).count() === 1)
    assert(out.filter(col("id") === 1000).count() === 1)
  }

  test("composite keys prune jointly on every stat'd column") {
    val store = new TableStore(tmp(), spark)
    val d = new Dispositions(store, spark)
    // segments share the range of k1 but are disjoint on k2
    store.append("t", Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k1", "k2", "v"),
      statsFor = Seq("k1", "k2"))
    store.append("t", Seq((1L, 500L, "c"), (2L, 600L, "d")).toDF("k1", "k2", "v"),
      statsFor = Seq("k1", "k2"))
    val before = store.segments("t").map(_.name)
    // staging overlaps k1 of both segments but k2 of only the first
    d.merge("t", Seq((1L, 10L, "NEW")).toDF("k1", "k2", "v"),
      MergeConfig(primaryKey = Seq("k1", "k2")), "2")
    val after = store.segments("t").map(_.name)
    assert(after.contains(before(1))) // second segment pruned via k2
    assert(!after.contains(before(0)))
    val out = store.read("t").orderBy("k1", "k2")
      .select("v").as[String].collect().toSeq
    assert(out === Seq("NEW", "c", "b", "d"))
  }

  test("delete-insert with pk AND merge_key deletes on EITHER key group") {
    val store = new TableStore(tmp(), spark)
    val d = new Dispositions(store, spark)
    // dest: (pk, mk, v)
    store.append("t", Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("pk", "mk", "v"), statsFor = Seq("pk", "mk"))
    // staging matches row 1 by pk only (mk differs) and row 2 by mk only
    val staging = Seq((1L, 99L, "NEW1"), (7L, 20L, "NEW2")).toDF("pk", "mk", "v")
    d.merge("t", staging,
      MergeConfig(primaryKey = Seq("pk"), mergeKey = Seq("mk")), "2")
    val out = store.read("t").orderBy("pk").select("pk", "v")
      .as[(Long, String)].collect().toSeq
    // rows 1 and 2 deleted (pk-match OR mk-match), row 3 kept, 2 inserted
    assert(out === Seq((1L, "NEW1"), (3L, "c"), (7L, "NEW2")))
  }

  test("merge falls back to full rewrite when stats are missing") {
    val store = new TableStore(tmp(), spark)
    val d = new Dispositions(store, spark)
    store.append("t", Seq((1L, "a")).toDF("id", "v")) // no stats
    d.merge("t", Seq((1L, "b")).toDF("id", "v"), MergeConfig(primaryKey = Seq("id")), "2")
    val out = store.read("t").select("id", "v").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "b")))
    // and the merge commit backfills stats → next merge can prune
    assert(store.segments("t").forall(_.stats.contains("id")))
  }

  test("merge output is range-laid-out: files cover disjoint key ranges") {
    val store = new TableStore(tmp(), spark)
    val d = new Dispositions(store, spark)
    val rows = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8) // scrambled input
    d.merge("t", rows, MergeConfig(primaryKey = Seq("id")), "1")
    // within every file the key is sorted (tight row-group min/max)
    val byFile = store.read("t")
      .select(input_file_name().as("f"), col("id"))
      .as[(String, Long)].collect().groupBy(_._1).values
    byFile.foreach { rows =>
      val ids = rows.map(_._2).toSeq
      assert(ids === ids.sorted)
    }
    // and across files the ranges are disjoint intervals
    val perFile = byFile.map(r => (r.map(_._2).min, r.map(_._2).max))
      .toSeq.sortBy(_._1)
    perFile.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ => ()
    }
  }

  test("compact folds many small segments into one, preserving stats") {
    val store = new TableStore(tmp(), spark)
    (1 to 5).foreach(i =>
      store.append("t", Seq((i.toLong, s"v$i")).toDF("id", "v"), statsFor = Seq("id")))
    assert(store.segments("t").size === 5)
    assert(!store.compact("t", maxSegments = 16)) // under threshold: no-op
    assert(store.compact("t", maxSegments = 3))
    val Seq(seg) = store.segments("t")
    assert(seg.stats("id") === ColStats("1", "5", numeric = true))
    assert(store.read("t").count() === 5)
  }

  test("readPruned skips non-matching segments but filters identically") {
    val store = new TableStore(tmp(), spark)
    Seq(1L to 10L, 100L to 110L, 1000L to 1010L).foreach { r =>
      store.append("t", r.map(i => (i, s"v$i")).toDF("id", "v"), statsFor = Seq("id"))
    }
    // point lookup: only the matching segment is scanned
    val hit = store.readPruned("t", "id", Some("105"), Some("105"))
    assert(hit.inputFiles.length < store.read("t").inputFiles.length)
    assert(hit.filter(col("id") === 105L).count() === 1)
    // range crossing two segments
    val range = store.readPruned("t", "id", Some("5"), Some("105"))
    assert(range.filter(col("id").between(5L, 105L)).count() === 6 + 6)
    // no possible match: empty frame, schema kept
    val miss = store.readPruned("t", "id", Some("5000"), None)
    assert(miss.count() === 0 && miss.columns.toSeq === Seq("id", "v"))
    // relation facade goes through the pruned path with identical results
    val p = new graft.pipeline.Pipeline("pr", tmp(), spark)
    val ds = new graft.dataset.GraftDataset(store, p.registry, spark)
    val viaRelation = ds.table("t").where("id", "gte", 1000L).df()
    assert(viaRelation.count() === 11)
    // one of three segments scanned (a segment may hold several part files)
    assert(viaRelation.inputFiles.length === store.read("t").inputFiles.length / 3)
  }

  test("chain merge tombstones child deletes instead of rewriting") {
    import graft.normalize.Ids
    val store = new TableStore(tmp(), spark)
    val cfg = MergeConfig(primaryKey = Seq("k"))
    def chain(rows: Seq[(String, String)], items: Seq[(String, Long)]) =
      TableChain("r",
        rows.toDF("k", "v").withColumn(Ids.DltId, col("k")),
        Map("r__items" -> items.toDF(Ids.DltRootId, "item")))
    // load 1: roots a,b with children
    MergeChain.deleteInsert(store,
      chain(Seq(("a", "v1"), ("b", "v1")), Seq(("a", 1L), ("a", 2L), ("b", 3L))), cfg, "1")
    val seg1 = store.segments("r__items").map(_.name)
    // load 2 replaces root a: its children die via TOMBSTONE, the
    // original child segment survives by name (no rewrite)
    MergeChain.deleteInsert(store,
      chain(Seq(("a", "v2")), Seq(("a", 9L))), cfg, "2")
    val after = store.segments("r__items").map(_.name)
    assert(seg1.forall(after.contains), "child segments must not rewrite")
    assert(store.tombstones("r__items").nonEmpty)
    val items = store.read("r__items").orderBy("item")
      .select("item").as[Long].collect().toSeq
    assert(items === Seq(3L, 9L)) // a's old children dead, b's alive, new in
    // a third load replacing b keeps generation correctness for a's new row
    MergeChain.deleteInsert(store,
      chain(Seq(("b", "v2")), Seq(("b", 7L))), cfg, "3")
    assert(store.read("r__items").orderBy("item")
      .select("item").as[Long].collect().toSeq === Seq(7L, 9L))
    // compaction folds tombstones away with identical content
    assert(store.compact("r__items", maxSegments = 0))
    assert(store.tombstones("r__items").isEmpty)
    assert(store.read("r__items").orderBy("item")
      .select("item").as[Long].collect().toSeq === Seq(7L, 9L))
  }

  test("scd2 loads leave closed-history segments untouched") {
    val store = new TableStore(tmp(), spark)
    val d = new Dispositions(store, spark)
    val cfg = Scd2Config(trackedColumns = Seq("id", "v"), boundaryTs = "2024-01-01 00:00:00")
    d.scd2("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), cfg, "1")
    // load 2 changes id=1 → one retired row lands in a NEW closed segment
    d.scd2("t", Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      cfg.copy(boundaryTs = "2024-02-01 00:00:00"), "2")
    val closedAfter2 = store.segments("t")
      .filter(_.stats.get("__scd2_state").exists(_.min == "closed")).map(_.name)
    assert(closedAfter2.size === 1)
    // load 3 changes id=2 → the prior closed segment SURVIVES by name
    d.scd2("t", Seq((1L, "a2"), (2L, "b2"), (3L, "c")).toDF("id", "v"),
      cfg.copy(boundaryTs = "2024-03-01 00:00:00"), "3")
    val segsAfter3 = store.segments("t")
    val closedAfter3 = segsAfter3
      .filter(_.stats.get("__scd2_state").exists(_.min == "closed")).map(_.name)
    assert(closedAfter2.forall(closedAfter3.contains)) // history untouched
    assert(closedAfter3.size === 2)
    // full content is still correct: 3 active + 2 retired versions
    val out = store.read("t")
    assert(out.count() === 5)
    assert(out.filter(col("_dlt_valid_to").isNull).count() === 3)
    assert(out.filter(col("id") === 1L).count() === 2)
  }

  test("point reads skip segments whose probe id is dead under a tombstone") {
    val store = new TableStore(tmp(), spark)
    // two stat'd segments: ids [1,10] and [100,110]
    store.append("t", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      statsFor = Seq("id"))
    store.append("t", (100L to 110L).map(i => (i, s"v$i")).toDF("id", "v"),
      statsFor = Seq("id"))
    // kill id=5 merge-on-read; the replacement row lands in a new segment
    store.appendWithTombstone("t", Seq((5L, "NEW")).toDF("id", "v"), "id",
      Seq(5L).toDF("id"), statsFor = Seq("id"))
    // dead-id probe: the [1,10] segment is skipped (its id=5 rows are all
    // tombstoned), only the replacement segment is scanned
    val hit = store.readPruned("t", "id", Some("5"), Some("5"))
    val allFiles = store.readSegments("t", store.segments("t")).inputFiles.length
    assert(hit.inputFiles.length < allFiles)
    assert(hit.filter(col("id") === 5L).select("v").as[String].collect().toSeq
      === Seq("NEW"))
    // live-id probe in a covered segment: nothing skipped beyond stats,
    // row survives the tombstone anti-join
    val live = store.readPruned("t", "id", Some("7"), Some("7"))
    assert(live.filter(col("id") === 7L).count() === 1)
    // range probes never consult tombstones (anti-join still applies)
    val range = store.readPruned("t", "id", Some("1"), Some("10"))
    assert(range.filter(col("id").between(1L, 10L)).count() === 10)
    assert(range.filter(col("id") === 5L).select("v").as[String].collect()
      .toSeq === Seq("NEW"))
  }

  test("relation pruning canonicalizes the probe through the column type") {
    val store = new TableStore(tmp(), spark)
    // timestamp segment: stats are Catalyst cast-to-string forms
    // ("2024-01-02 23:59:59"); an ISO probe with a 'T' separator must be
    // canonicalized before the string compare or the segment is wrongly
    // pruned (lexicographically "2024-01-02T.." > "2024-01-02 2..")
    store.append("t",
      Seq("2024-01-02 09:00:00", "2024-01-02 23:59:59")
        .toDF("s").select(to_timestamp(col("s")).as("ts")),
      statsFor = Seq("ts"))
    val p = new graft.pipeline.Pipeline("cp", tmp(), spark)
    val ds = new graft.dataset.GraftDataset(store, p.registry, spark)
    val got = ds.table("t").where("ts", "gte", "2024-01-02T10:00:00").df()
    assert(got.count() === 1) // the 23:59:59 row — NOT silently empty
  }

  test("vacuum deletes orphaned segments, keeps every retained snapshot readable") {
    val store = new TableStore(tmp(), spark)
    store.append("t", Seq((1L, "a")).toDF("id", "v"), statsFor = Seq("id"))
    store.append("t", Seq((2L, "b")).toDF("id", "v"), statsFor = Seq("id"))
    // overwrite orphans both earlier segments (they leave the manifest)
    store.overwrite("t", Seq((3L, "c"), (4L, "d")).toDF("id", "v"), statsFor = Seq("id"))
    store.append("t", Seq((5L, "e")).toDF("id", "v"), statsFor = Seq("id"))
    val dataDirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(store.root, "t", "data")).count()
    assert(dataDirs === 4)
    // retain the last 2 manifests: the overwrite segment is still
    // referenced, the two pre-overwrite segments are orphans
    val deleted = store.vacuum("t", retainManifests = 2)
    assert(deleted === 2)
    assert(store.read("t").count() === 3) // live snapshot intact
    // tombstoned tables keep their id files while referenced
    store.appendWithTombstone("t", Seq((3L, "c2")).toDF("id", "v"), "id",
      Seq(3L).toDF("id"), statsFor = Seq("id"))
    assert(store.vacuum("t", retainManifests = 1) >= 0)
    assert(store.read("t").orderBy("id").select("v").as[String].collect().toSeq
      === Seq("c2", "d", "e"))
  }

  test("string keys prune lexicographically") {
    val store = new TableStore(tmp(), spark)
    val d = new Dispositions(store, spark)
    store.append("t", Seq(("aaa", 1), ("amm", 2)).toDF("k", "v"), statsFor = Seq("k"))
    store.append("t", Seq(("zzz", 3)).toDF("k", "v"), statsFor = Seq("k"))
    val before = store.segments("t").map(_.name)
    d.merge("t", Seq(("abc", 9)).toDF("k", "v"), MergeConfig(primaryKey = Seq("k")), "2")
    val after = store.segments("t").map(_.name)
    assert(after.contains(before(1))) // z-segment untouched
    assert(store.read("t").count() === 4)
  }

  test("dataset asOf pins a snapshot and composes like any relation") {
    import graft.dataset.GraftDataset
    import graft.schema.SchemaRegistry
    val store = new TableStore(
      java.nio.file.Files.createTempDirectory("graft-asof").toString, spark)
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val snap1 = store.snapshots("t").last
    store.append("t", Seq((3L, "c")).toDF("id", "v"))
    val ds = new GraftDataset(store, new SchemaRegistry("asof"), spark)
    assert(ds.snapshots("t").last != snap1)
    assert(ds.asOf("t", snap1).df().count() === 2L)
    assert(ds.table("t").df().count() === 3L)
    // composes: filter over the pinned snapshot
    assert(ds.asOf("t", snap1).where("id", "gte", 2).select("v")
      .df().collect().map(_.getString(0)).toSeq === Seq("b"))
    // a vacuumed snapshot reports, not NPEs
    store.append("t", Seq((4L, "d")).toDF("id", "v"))
    store.vacuum("t", retainManifests = 1)
    val e = intercept[IllegalArgumentException](ds.asOf("t", snap1))
    assert(e.getMessage.contains("vacuumed"))
  }
}
