package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{Pipeline, Resource}
import graft.streaming.Streaming
import graft.write.TableStore

/** Structured-Streaming plane (SURVEY.md §2.8): the AvailableNow
  * micro-batch bridge into the load plane, event-time windows, and
  * stateful stream dedup — each drained to a table and checked against
  * a DuckDB oracle over the same input.
  *
  * `events.ts` arrives as epoch-nanos LongType (see Verify's
  * nanosAsLong note); `ts DIV 1000` keeps integer precision where a
  * double-typed division would corrupt 1e18-scale nanos.
  */
object StreamQueries {

  /** Stateful streaming operators materialize one state-store instance
    * per shuffle partition per operator per micro-batch (checkpoint
    * files included). With driver-small key cardinality the session
    * default (32 here) is pure commit overhead — a cloned session
    * scopes a smaller setting to the stream without touching the
    * global conf. On a real cluster the same dial sizes state-store
    * parallelism to key cardinality, not executor count. */
  private def streamSession(c: Ctx, partitions: Int = 4) = {
    val s = c.spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    s
  }

  val defs: Map[String, Q] = Map(
    // file stream → AvailableNow → full pipeline load path per batch
    "stream_pipeline_append" -> q { c =>
      val p = new Pipeline("st", Files.createTempDirectory("graft-st").toString, c.spark)
      val src = Streaming.fileStream(c.spark, s"${c.dir}/events.parquet")
      Streaming.intoPipeline(p, src, b =>
        Resource("events_stream", b.select("event_id", "user_id", "event_type")))
      p.store.read("events_stream")
        .select("event_id", "user_id", "event_type").orderBy("event_id")
    },

    // event-time tumbling window counts, complete mode → overwrite
    "stream_window_tumbling" -> q { c =>
      val ss = streamSession(c)
      val store = new TableStore(Files.createTempDirectory("graft-stw").toString, c.spark)
      val src = Streaming.fileStream(ss, s"${c.dir}/events.parquet")
        .withColumn("ets", timestamp_micros(expr("ts DIV 1000")))
      val agg = Streaming.tumblingCounts(src, "ets", "1 hour", "event_type")
      Streaming.drainAvailableNow(agg, outputMode = "complete") {
        (batch, _) => store.overwrite("win", batch)
      }
      store.read("win").orderBy("window_start", "event_type")
    },

    // custom keyed state (mapGroupsWithState): running per-key counts in
    // update mode; the final value per key is the max of its updates
    "stream_stateful_counts" -> q { c =>
      val ss = streamSession(c)
      val store = new TableStore(Files.createTempDirectory("graft-sts").toString, c.spark)
      val src = Streaming.fileStream(ss, s"${c.dir}/events.parquet")
      val counts = Streaming.statefulCounts(src, "event_type")
      Streaming.drainAvailableNow(counts, outputMode = "update") {
        (batch, _) => store.append("sc", batch)
      }
      store.read("sc").groupBy("event_type").agg(max(col("n")).as("n"))
        .orderBy("event_type")
    },

    // streaming MERGE: revisions of the same key arrive on the stream;
    // foreachBatch upserts each micro-batch through the segment-pruned
    // merge path; the final table holds the highest revision per key
    "stream_merge_upsert" -> q { c =>
      val tmp = Files.createTempDirectory("graft-stm").toString
      val ev = c.spark.read.parquet(s"${c.dir}/events.parquet")
        .select(col("event_id"), col("user_id"), col("value"))
      // rev 1: every event; rev 2: a bumped value for event_id % 3 == 0
      ev.withColumn("rev", lit(1L))
        .unionByName(ev.filter(col("event_id") % 3 === 0)
          .withColumn("value", col("value") * 2).withColumn("rev", lit(2L)))
        .write.parquet(s"$tmp/src")
      val store = new TableStore(s"$tmp/store", c.spark)
      val src = Streaming.fileStream(c.spark, s"$tmp/src")
      Streaming.intoMerge(store, src, "ev",
        graft.write.MergeConfig(primaryKey = Seq("event_id"), dedupSort = Some("rev")))
      store.read("ev")
        .select(col("event_id"), col("user_id"),
          round(col("value").cast("decimal(18,4)") * 10000).cast("long").as("value_s"))
        .orderBy("event_id")
    },

    // stateful dedup: input duplicated 2x, dropDuplicates state keeps
    // exactly one row per event_id across micro-batches
    "stream_dedup_exactly_once" -> q { c =>
      val ss = streamSession(c)
      val store = new TableStore(Files.createTempDirectory("graft-std").toString, c.spark)
      val src = Streaming.fileStream(ss, s"${c.dir}/events.parquet")
        .select(col("event_id"), col("user_id"))
        .withColumn("_copy", explode(array(lit(1), lit(2))))
        .drop("_copy")
      val deduped = Streaming.dedupByKeyUnbounded(src, Seq("event_id"))
      Streaming.drainAvailableNow(deduped)((batch, _) => store.append("dd", batch))
      store.read("dd").orderBy("event_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "stream_pipeline_append" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    "stream_window_tumbling" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "stream_stateful_counts" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_merge_upsert" ->
      """SELECT event_id, user_id,
        |  CAST(ROUND(CAST(CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END
        |    AS DECIMAL(18,4)) * 10000) AS BIGINT) AS value_s
        |FROM events ORDER BY event_id""".stripMargin,
    "stream_dedup_exactly_once" ->
      "SELECT event_id, user_id FROM events ORDER BY event_id"
  )
}
