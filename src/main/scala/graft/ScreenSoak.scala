package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PRODUCTION-SHAPE screen soak (round-16 verdict item): the gate
  * `sim_pq_append_dedup` runs the ADC dedup-on-ingest screen at a
  * fixture-scale `nlist = 8` with `nprobe = nlist` — the regime where
  * [[graft.write.VectorSink]]'s bipartite s×s tiling replicates the
  * corpus ×s. The tiling Scaladoc CLAIMS replication vanishes at the
  * production operating point (`nlist ≈ √corpus` ⇒ `s = 1`, probes
  * touch `nprobe ≪ nlist` lists); this harness MEASURES that claim at
  * blow-up scale instead of arguing it: build an IVF-PQ collection
  * over the fixture's even vectors at `nlist ≈ √corpus`, screen the
  * gate's own batch shape (affine twins of the evens + untouched
  * odds) at `nprobe ≪ nlist`, and report wall, max task, task census,
  * the (s, spread) the screen chose, and kept/dropped.
  *
  * Usage: runMain graft.ScreenSoak <fixtureDir> [nlist] [nprobe]
  * (defaults: round(√|evens|), 16). One JSON line on stdout; per-stage
  * top-5 to stderr, the [[Soak]] discipline. */
object ScreenSoak {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageSum = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageN = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        val d = Option(t.taskInfo).map(_.duration).getOrElse(0L)
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
        stageMax.merge(t.stageId, d, (a, b) => math.max(a, b))
        stageSum.merge(t.stageId, d, (a, b) => a + b)
        stageN.merge(t.stageId, 1L, (a, b) => a + b)
      }
    })

    import graft.write.{TableStore, VectorSink}
    val vecs = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val evens = vecs.filter(col("vec_id") % 2 === 0)
    val nCorpus = evens.count()
    val nlist = if (args.length > 1) args(1).toInt
      else math.round(math.sqrt(nCorpus.toDouble)).toInt
    val nprobe = if (args.length > 2) args(2).toInt else 16
    // r15's GLOBAL salt formula, for the record — the r16 screen
    // tiles PER LIST from the census + probe counts (see
    // VectorSink.tiledScreenJoin), so this is the value the old
    // tiler would have used, not what runs
    val parts = cpus.toInt
    val s = math.max(1, math.min(64, (2 * parts) / math.max(1, nlist)))
    System.err.println(s"[screensoak] corpus=$nCorpus nlist=$nlist " +
      s"nprobe=$nprobe s_r15_formula=$s parts=$parts")

    val store = new TableStore(queries.Scratch.dir("graft-ssoak"), spark)
    val tBuild0 = System.nanoTime()
    VectorSink.writeIvfPq(store, "emb", evens, "vec_id", "embedding",
      nlist = nlist, m = 8, ksub = 16, iters = 2)
    val buildWall = (System.nanoTime() - tBuild0) / 1e9
    // max/mean coarse-list occupancy: at s = 1 the screen's
    // parallelism granularity IS the list, so any straggler should be
    // attributable to list-size skew, not to the (inactive) tiler
    val skew = VectorSink.listSkew(store, "emb")
    System.err.println(f"[screensoak] collection built in $buildWall%.1f s " +
      f"list_skew=$skew%.2f")

    // the gate's batch shape at fixture scale: affine twins of every
    // even (near-dups by construction) + the untouched odds
    val twins = evens.select((col("vec_id") + lit(3000000000L)).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.01) + lit(0.005))
        .cast("array<float>").as("embedding"))
    val batch = twins.unionByName(vecs.filter(col("vec_id") % 2 === 1))

    Thread.sleep(300)
    maxTaskMs.set(0L); nTasks.set(0L)
    stageMax.clear(); stageSum.clear(); stageN.clear()
    val t0 = System.nanoTime()
    val (kept, dropped) = VectorSink.appendDedupedAdc(store, "emb",
      batch, "vec_id", "embedding", threshold = 0.52, nprobe = nprobe)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"""{"query":"screen_prod_shape","wall_s":$wall%.1f,""" +
      f""""max_task_s":${maxTaskMs.get() / 1e3}%.1f,""" +
      s""""tasks":${nTasks.get()},"kept":$kept,"dropped":$dropped,""" +
      s""""nlist":$nlist,"nprobe":$nprobe,"s_r15_formula":$s,""" +
      f""""list_skew":$skew%.2f,"corpus":$nCorpus,""" +
      f""""build_wall_s":$buildWall%.1f}""")
    import scala.jdk.CollectionConverters._
    stageMax.asScala.toSeq.sortBy(-_._2).take(5).foreach { case (sid, ms) =>
      System.err.println(f"[screensoak] stage $sid max_task=${ms / 1e3}%.1fs " +
        f"tasks=${stageN.getOrDefault(sid, 0L)} " +
        f"sum=${stageSum.getOrDefault(sid, 0L) / 1e3}%.1fs")
    }
    queries.Scratch.sweep()
    spark.stop()
  }
}
