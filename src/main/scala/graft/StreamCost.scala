package graft

import org.apache.spark.sql.SparkSession

/** One-question harness (round-16 verdict item): how much of a 3-batch
  * `foreachBatch` gate's wall time is STREAMING MACHINERY — source
  * listing, offset log, checkpoint commits, the per-trigger planning
  * Structured Streaming adds — versus the work itself? Runs the same
  * trivial per-batch job (read one parquet file, append it to a
  * lakehouse table) both ways:
  *
  *   batch:  3 direct `spark.read.parquet(file)` → `store.append` calls
  *   stream: the SAME 3 files drained through
  *           [[graft.streaming.Streaming.drainAvailableNow]] at
  *           `maxFilesPerTrigger = 1` (3 micro-batches), appending in
  *           `foreachBatch`
  *
  * Each variant runs `iters` times (fresh store each rep, alternating
  * order so JIT/page-cache drift cannot favor one side); prints
  * per-rep walls and the median delta — the fixed cost a 3-batch
  * streaming gate carries over its batch twin. Usage:
  *   runMain graft.StreamCost [iters]
  */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val srcDir = java.nio.file.Files.createTempDirectory("sc-src").toString
    (0 until 3).foreach { i =>
      (i * 1000 until (i + 1) * 1000).map(j => (j.toLong, s"document $j"))
        .toDF("id", "text").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val files = new java.io.File(srcDir).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted
    require(files.length == 3, s"expected 3 part files, got ${files.length}")

    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def runBatch(): Double = {
      val store = new graft.write.TableStore(tmp("sc-b"), spark)
      time { files.foreach(f => store.append("t", spark.read.parquet(f))) }
    }
    def runStream(): Double = {
      val store = new graft.write.TableStore(tmp("sc-s"), spark)
      val src = graft.streaming.Streaming.fileStream(spark, srcDir,
        options = Map("maxFilesPerTrigger" -> "1"))
      time { graft.streaming.Streaming.drainAvailableNow(src)((b, _) =>
        store.append("t", b)) }
    }
    // untimed warmup of BOTH paths (JIT, codegen, parquet footers)
    runBatch(); runStream()
    val (bs, ss) = (Array.fill(iters)(0.0), Array.fill(iters)(0.0))
    (0 until iters).foreach { i =>
      if (i % 2 == 0) { bs(i) = runBatch(); ss(i) = runStream() }
      else { ss(i) = runStream(); bs(i) = runBatch() }
      println(f"rep ${i + 1}: batch=${bs(i)}%.2f s  stream=${ss(i)}%.2f s")
    }
    def med(v: Array[Double]) = v.sorted.apply((v.length - 1) / 2)
    println(f"median: batch=${med(bs)}%.2f s  stream=${med(ss)}%.2f s  " +
      f"machinery=${med(ss) - med(bs)}%.2f s over 3 batches " +
      f"(${(med(ss) - med(bs)) / 3}%.2f s/batch)")
    spark.stop()
  }
}
