package graft.incremental

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cursor cases from FIXTURES.md §A4 (reference tests/extract/
  * test_incremental.py / test_lag.py). */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._
  import Incremental._

  private val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "d"), (4L, "e"))

  test("first run takes everything and state advances to max") {
    val df = rows.toDF("cur", "v")
    val cfg = Config(cursorColumn = "cur", primaryKey = Seq("v"))
    val out = Incremental(df, cfg, State.empty)
    assert(out.count() == 5)
    val st = advance(out, cfg, State.empty)
    assert(st.lastValue.contains("4"))
    assert(st.boundaryHashes.length == 1) // only row e sits on the boundary
  }

  test("boundary dedup drops re-delivered boundary rows, keeps new ones") {
    val cfg = Config(cursorColumn = "cur", primaryKey = Seq("v"))
    val st1 = advance(Seq((3L, "c"), (3L, "d")).toDF("cur", "v"), cfg, State.empty)
    assert(st1.lastValue.contains("3") && st1.boundaryHashes.length == 2)
    // next batch re-delivers c and d at the boundary plus new rows
    val batch2 = Seq((3L, "c"), (3L, "d"), (3L, "new_at_boundary"), (4L, "e")).toDF("cur", "v")
    val out = Incremental(batch2, cfg, st1)
    assert(out.select("v").as[String].collect().sorted.toSeq == Seq("e", "new_at_boundary"))
  }

  test("min cursor goes backwards") {
    val cfg = Config(cursorColumn = "cur", lastValueFunc = MinFunc, primaryKey = Seq("v"))
    val st = State(Some("3"), Nil)
    val out = Incremental(rows.toDF("cur", "v"), cfg, st)
    assert(out.select("cur").as[Long].collect().forall(_ <= 3))
  }

  test("end_value backfill window does not advance state") {
    val cfg = Config(cursorColumn = "cur", initialValue = Some("2"),
      endValue = Some("4"), primaryKey = Seq("v"))
    val out = Incremental(rows.toDF("cur", "v"), cfg, State.empty)
    assert(out.select("cur").as[Long].collect().forall(c => c >= 2 && c < 4))
    assert(advance(out, cfg, State.empty) == State.empty)
  }

  test("lag reopens the window") {
    val cfg = Config(cursorColumn = "cur", lag = Some(2.0), primaryKey = Seq("v"))
    val out = Incremental(rows.toDF("cur", "v"), cfg, State(Some("4"), Nil))
    // window reopens at 4-2=2 (closed start)
    assert(out.select("cur").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 3L, 4L))
  }

  test("datetime lag: timestamp cursor reopens by seconds, format kept") {
    val df = Seq("2024-03-01 08:59:59", "2024-03-01 09:00:00",
      "2024-03-01 09:30:00", "2024-03-01 10:00:00")
      .zipWithIndex.map { case (s, i) => (s, s"r$i") }.toDF("s", "v")
      .select(to_timestamp(col("s")).as("ts"), col("v"))
    val cfg = Config(cursorColumn = "ts", lag = Some(3600.0), primaryKey = Seq("v"))
    val out = Incremental(df, cfg, State(Some("2024-03-01 10:00:00"), Nil))
    // window reopens at 10:00 - 1h = 09:00 (closed start)
    assert(out.select("v").as[String].collect().sorted.toSeq === Seq("r1", "r2", "r3"))
  }

  test("date lag: lag is days; compact yyyyMMdd strings keep their format") {
    assert(Lag.applyLag("2024-03-10", 3.0, isMax = true) === "2024-03-07")
    assert(Lag.applyLag("20240310", 3.0, isMax = true) === "20240307")
    assert(Lag.applyLag("2024-03-10T05:06:07.123", 60.0, isMax = true)
      === "2024-03-10T05:05:07.123")
    assert(Lag.applyLag("2024-03-10 05:06:07Z", 7.0, isMax = false)
      === "2024-03-10 05:06:14Z")
    intercept[IllegalArgumentException] { Lag.applyLag("not-a-cursor", 1.0, isMax = true) }
  }

  test("lag never crosses the initial value and is off during backfill") {
    val cfg = Config(cursorColumn = "cur", lag = Some(100.0),
      initialValue = Some("3"), primaryKey = Seq("v"))
    // 4 - 100 would land at -96; clamped to initialValue 3
    assert(Incremental.startValue(cfg, State(Some("4"), Nil)) === Some("3"))
    // lag applies to last_value only, never to the initial value
    assert(Incremental.startValue(cfg, State.empty) === Some("3"))
    // endValue deactivates lag
    assert(Incremental.startValue(cfg.copy(endValue = Some("9")),
      State(Some("4"), Nil)) === Some("4"))
  }

  test("custom last_value_func windows and advances by its own order") {
    // track the largest ABSOLUTE cursor value
    val cfg = Config(cursorColumn = "cur", primaryKey = Seq("v"),
      lastValueFunc = CustomFunc(c => max(abs(c)), (last, cur) => abs(cur) >= last))
    val df = Seq((-5L, "a"), (2L, "b"), (4L, "c"), (-3L, "d")).toDF("cur", "v")
    val out = Incremental(df, cfg, State(Some("4"), Nil))
    assert(out.select("v").as[String].collect().sorted.toSeq === Seq("a", "c"))
    val st = advance(out, cfg, State(Some("4"), Nil))
    assert(st.lastValue.contains("5"))
    // and it is not pushable to JDBC
    assert(graft.sources.Jdbc.incrementalWhere(cfg, st).isEmpty)
  }

  test("table-backed boundary dedup anti-joins instead of collecting") {
    val cfg = Config(cursorColumn = "cur", primaryKey = Seq("v"))
    val run1 = Seq.tabulate(500)(i => (1L, s"r$i")).toDF("cur", "v")
    val fps = boundaryFingerprints(run1, cfg, "1")
    assert(fps.count() === 500)
    // re-delivery of all 500 + 2 new at the boundary + 1 beyond
    val run2 = (Seq.tabulate(500)(i => (1L, s"r$i")) ++
      Seq((1L, "new1"), (1L, "new2"), (2L, "z"))).toDF("cur", "v")
    val out = Incremental(run2, cfg, State(Some("1"), Nil), Some(fps))
    assert(out.select("v").as[String].collect().sorted.toSeq ===
      Seq("new1", "new2", "z"))
  }

  test("null cursor include/exclude") {
    val df = Seq((Some(1L), "a"), (None, "n"), (Some(2L), "b")).toDF("cur", "v")
    val inc = Config(cursorColumn = "cur", onMissing = Include, primaryKey = Seq("v"))
    assert(Incremental(df, inc, State.empty).count() == 3)
    val exc = inc.copy(onMissing = Exclude)
    assert(Incremental(df, exc, State.empty).count() == 2)
  }

  test("nested cursor path (struct field) windows and advances") {
    val df = rows.toDF("cur", "v")
      .select(struct(col("cur").as("ts")).as("payload"), col("v"))
    val cfg = Config(cursorColumn = "payload.ts", primaryKey = Seq("v"))
    val st1 = advance(Incremental(df, cfg, State.empty), cfg, State.empty)
    assert(st1.lastValue.contains("4"))
    val out2 = Incremental(df, cfg, st1)
    // boundary row 'e' deduped; nothing newer exists
    assert(out2.count() == 0)
  }

  test("state store round-trips") {
    val store = new StateStore(Files.createTempDirectory("graft-state").toString)
    val st = State(Some("2024-01-01 00:00:00"), Seq("h1", "h2"))
    store.save("p", "events/ts", st)
    store.save("p", "orders/id", State(Some("9"), Nil))
    assert(store.load("p", "events/ts") == st)
    assert(store.load("p", "orders/id").lastValue.contains("9"))
    assert(store.load("p", "missing") == State.empty)
    // overwrite
    store.save("p", "events/ts", State(Some("x"), Nil))
    assert(store.load("p", "events/ts").lastValue.contains("x"))
  }
}
