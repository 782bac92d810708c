package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (see TESTDATA.md). Every `SparkEntry.queries` entry receives the
  * sf directory and resolves tables through here so filter/column
  * pushdown reaches the parquet scan directly.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema memo per table path: parquet schema inference submits a
    * footer-read job per `spark.read.parquet` call, and every gated
    * query loads 1-3 tables — a fixed ~30-45 ms job per load that adds
    * up to whole seconds across a bench run (and at cluster scale, a
    * footer sweep per load of a many-file table). The testdata files
    * are static per process, so the FIRST load of each path infers and
    * memoizes; later loads supply the schema and skip inference. The
    * memo carries no session state, BUT parquet inference is
    * conf-dependent (nanosAsLong flips TIMESTAMP(NANOS) to LongType),
    * so the key includes the confs that change the inferred result —
    * a session without the flag must hit its own entry (and fail
    * loudly on the nanos file, as its own inference would), never one
    * poisoned by a flagged session. */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def memoKey(spark: SparkSession, path: String): String = {
    // conf.get(key) resolves registered defaults; the two-arg form
    // would TYPE-VALIDATE our placeholder default and throw
    def c(k: String) = scala.util.Try(spark.conf.get(k)).getOrElse("?")
    s"$path|${c("spark.sql.legacy.parquet.nanosAsLong")}" +
      s"|${c("spark.sql.parquet.int96AsTimestamp")}" +
      s"|${c("spark.sql.parquet.inferTimestampNTZ.enabled")}" +
      s"|${c("spark.sql.parquet.binaryAsString")}" +
      s"|${c("spark.sql.parquet.fieldId.read.enabled")}"
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = memoKey(spark, path)
    val memo = schemaMemo.get(key)
    val df =
      if (memo != null) spark.read.schema(memo).parquet(path)
      else {
        val d = spark.read.parquet(path)
        schemaMemo.put(key, d.schema)
        d
      }
    nanosNormalize(df)
  }

  /** The testdata contract every query codes against: `events.ts` is
    * epoch-NANOS LongType (= DuckDB `epoch_ns(ts)`; integer-exact
    * `DIV` arithmetic at 1e18 scale) and `*date` columns are DateType.
    * Testdata generations differ in physical encoding — TIMESTAMP(NANOS)
    * (unrepresentable in Spark, read as exactly the nanos long under
    * `legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS) (reads as
    * TIMESTAMP_NTZ), or DATE for the date columns. Normalize at load:
    * date-named timestamp columns (midnight-valued by generation) back
    * to DateType, every other timestamp column to epoch-nanos longs
    * (sessions pin tz=UTC, so the NTZ wall clock IS the epoch reading,
    * matching DuckDB's epoch_ns on a TIMESTAMP). Column pruning still
    * reaches the scan (projection only); ts-range filters give up
    * parquet row-group pushdown, which no gated query relies on. */
  def nanosNormalize(df: DataFrame): DataFrame = {
    val tsCols = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType || f.dataType == TimestampType => f.name
    }
    tsCols.foldLeft(df)((d, c0) =>
      if (c0.toLowerCase.endsWith("date"))
        d.withColumn(c0, col(c0).cast(org.apache.spark.sql.types.DateType))
      else
        d.withColumn(c0, unix_micros(col(c0).cast(TimestampType)) * 1000L))
  }

  /** Load for COMPUTE-DENSE consumers (the text/shingle kernels run
    * ~0.1 ms/row of regex + hashing; relational rows cost nanoseconds).
    *
    * The driver's test tables are written as ONE parquet file with ONE
    * row group, and a row group is Spark's minimum split unit — so the
    * scan plans as a single task no matter how many cores the session
    * has (`files.maxPartitionBytes` / `files.minPartitionNum` cannot
    * split inside a row group), serializing all per-row compute behind
    * one core. A real lake table arrives as many files/row groups and
    * never hits this. When the natural split count is far below the
    * session's parallelism, re-spread round-robin once at load: the
    * shuffle moves O(file) bytes and unlocks full-width downstream
    * compute. The re-spread is a PUSHDOWN BARRIER (r14): filters and
    * pruning deliberately do NOT reach the scan — pushdown through the
    * repartition put heavy text-kernel predicates back in the
    * row-group-bound scan stage, re-serializing exactly the work the
    * re-spread exists to spread (soak-measured; asserted by PlanSpec).
    * The lost scan pruning is bounded: the barrier fires only on
    * under-split small inputs, where a full-width scan is file-sized.
    * Selective readers of BIG tables should stay on [[load]], which
    * keeps the columnar scan and full pushdown.
    * Light consumers should stay on [[load]]: for them the exchange
    * costs more than the serial scan it cures (measured: a blanket
    * re-spread moved the sf0.1 bench 120 s → 130 s, while the text pack
    * alone gained ~13 s).
    *
    * `cols` (optional): the columns the caller actually needs. The
    * barrier blocks COLUMN pruning as well as filters, so without it a
    * consumer projecting two narrow columns of a document table would
    * scan AND SHUFFLE the full text bytes. The select is applied BELOW
    * the re-spread (scan-side), so only the named columns ride the
    * exchange; empty = all columns (callers that consume the heavy
    * column anyway).
    */
  def loadWide(spark: SparkSession, dir: String, name: String,
      cols: Seq[String] = Nil): DataFrame = {
    val base = load(spark, dir, name)
    val df = if (cols.isEmpty) base else base.select(cols.map(col): _*)
    // split estimate from file size (NOT df.rdd.getNumPartitions — that
    // forces a physical planning pass on every load)
    val cores = spark.sparkContext.defaultParallelism
    // a directory-shaped table (standard Spark write layout) reports its
    // directory-entry size (~4 KB) from File.length() — sum the leaf
    // files instead, or the re-spread fires on arbitrarily large tables
    def leafBytes(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(leafBytes).sum)
      else f.length()
    val bytes =
      try leafBytes(new java.io.File(s"$dir/$name.parquet"))
      catch { case _: Throwable => Long.MaxValue }
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    // overflow-safe ceiling: the unreadable-size fallback is
    // Long.MaxValue, and `bytes + maxSplit - 1` would wrap negative —
    // collapsing naturalSplits to 1 and firing the re-spread on exactly
    // the "assume huge, leave it alone" case
    val naturalSplits =
      math.max(1L, bytes / maxSplit + (if (bytes % maxSplit == 0L) 0L else 1L))
    if (naturalSplits < cores / 2) {
      // repartition alone is NOT enough: filter/projection pushdown
      // walks straight through RepartitionByExpression, so heavy
      // downstream predicates (the text-kernel quality gates) land
      // back in the SCAN stage — whose parallelism is row-group-bound
      // (a small driver-written parquet holds 1-2 row groups,
      // unsplittable however small maxPartitionBytes goes; measured:
      // 2-task 10 s stages dominating the corpus-assembly soak while
      // every post-shuffle stage ran 32-way). The RDD round-trip ABOVE
      // the exchange is an optimizer barrier (LogicalRDD is opaque to
      // pushdown): the scan stays cheap (read + shuffle write at file
      // parallelism), and every downstream kernel runs at session
      // width. Only taken on under-split inputs — big tables keep the
      // plain columnar scan and full pushdown.
      val spread = df.repartition(cores)
      df.sparkSession.createDataFrame(spread.rdd, df.schema)
    } else df
  }

  /** All tables as a map (lazily planned — scans are only executed when
    * a downstream action runs). */
  def all(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap
}
