package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training order: the global document shuffle every
  * pretraining epoch needs (and the curriculum generalization —
  * shuffle WITHIN ordered stages). The order key is a seeded md5 over
  * the document id, so the permutation is a pure function of
  * (seed, epoch, id): re-running the plan, resuming a failed job, or
  * recomputing a lost partition can never shift a single rank — the
  * property `rand()`-based shuffles lack (Spark may re-execute a stage
  * and re-draw). A different epoch re-keys the hash → an independent
  * permutation, no state carried between epochs.
  *
  * Scale shape — the [[SequencePack]] two-level discipline applied to
  * ranks: a naive global `row_number` puts the corpus on ONE task.
  * Here documents bucket by the hash's first `bucketChars` hex chars
  * (16^w deterministic, data-derived buckets, ~uniform by
  * construction), rank WITHIN buckets in parallel windows, and a
  * single tiny window over the bucket COUNTS (broadcast back) turns
  * local ranks into the exact global rank of
  * `ORDER BY (stage..., hash, id)`.
  *
  * The bucket width is DATA-SCALED by default (mirroring
  * [[SequencePack.chunkAssignments]]'s `orderCol div bucketSize`
  * buckets): width w puts ~corpus/16^w on each rank window's task, so
  * a fixed w=2 that is invisible at bench scale becomes a ~400 GB
  * single-task sort at 100 TB. Ranks are WIDTH-INVARIANT by
  * construction — the bucket is a PREFIX of the order hash, so
  * (bucket, hash) sorts identically to (hash) for every width and the
  * global rank never moves (spec-pinned across widths); the only
  * single-partition window always runs over the 16^w × |stages|
  * bucket-count frame, never the data. */
object TrainingOrder {

  /** The order key: lowercase md5 hex of `seed:epoch:id` — identical
    * in Spark and any engine with md5 (the oracle re-derives it). A
    * NULL id fails LOUDLY (codegen'd, zero extra pass): concat_ws
    * would silently absorb it, giving every null-id row the SAME hash
    * and a nondeterministic tie order — the exact retry-stability the
    * operator exists to guarantee. */
  def orderKey(id: Column, seed: Long, epoch: Int): Column =
    md5(concat(lit(s"$seed:$epoch:"),
      coalesce(id.cast("string"),
        raise_error(lit("TrainingOrder: idCol is NULL — the id keys the " +
          "permutation and must be non-null and unique")).cast("string"))))

  /** Pick the hash-prefix width from the input's Catalyst size
    * estimate (plan stats — no job): ≤ ~4 GiB per rank window, i.e.
    * the smallest width whose 16^w buckets keep a bucket's slice of
    * the estimated bytes under the target. Width 2 (256 buckets) up
    * to ~1 TiB; 100 TB estimates land at width 4 (65,536 buckets,
    * ~1.6 GB per window task). Capped at 5 (1M buckets): past that
    * the bucket-count frame itself stops being "tiny". */
  private[operators] def autoWidth(df: DataFrame): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val perBucket = BigInt(4L << 30)
    (2 to 5).find(w => BigInt(16).pow(w) * perBucket >= bytes).getOrElse(5)
  }

  /** Adds `shuffle_rank` (0-based global rank in seeded-hash order,
    * optionally stage-major via `stages`: all rows of an earlier
    * stage rank before any row of a later one — curriculum order).
    * `idCol` must be unique per row (it breaks hash ties and keys the
    * permutation). `bucketChars` sets the rank-window bucket count to
    * 16^bucketChars; 0 (default) derives it from the input's size
    * estimate ([[autoWidth]]). Any width yields the identical
    * `shuffle_rank` — it is parallelism, not semantics. */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long, epoch: Int,
      stages: Seq[String] = Nil, bucketChars: Int = 0): DataFrame = {
    require(bucketChars >= 0 && bucketChars <= 8,
      s"bucketChars must be 0 (auto) or 1..8, got $bucketChars")
    val width = if (bucketChars > 0) bucketChars else autoWidth(df)
    val stageCols = stages.map(col)
    val keyed = df
      .withColumn("__h", orderKey(col(idCol), seed, epoch))
      .withColumn("__bucket", substring(col("__h"), 1, width))
    val within = Window
      .partitionBy((stageCols :+ col("__bucket")): _*)
      .orderBy(col("__h"), col(idCol))
    // bucket totals: |stages| × 16^width rows — the only
    // single-partition window runs over THAT frame, never the data
    val overBuckets = Window
      .orderBy((stageCols :+ col("__bucket")): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed
      .groupBy((stageCols :+ col("__bucket")): _*)
      .agg(count(lit(1L)).as("__bcount"))
      .withColumn("__boffset",
        coalesce(sum("__bcount").over(overBuckets), lit(0L)))
      .drop("__bcount")
    // NULL-SAFE stage equality (<=>): a using-columns join would drop
    // every null-stage row (NULL != NULL) and leave gaps in the
    // permutation. Null stages group and rank like any other value —
    // they sort FIRST (Spark's null-first ASC window order).
    val oKeys = stages.map(c => c -> s"__o_$c") :+ ("__bucket" -> "__o_bucket")
    val off = oKeys.foldLeft(offsets) { case (d, (c, o)) =>
      d.withColumnRenamed(c, o) }
    val cond = (stages.map(c => col(c) <=> col(s"__o_$c")) :+
      (col("__bucket") === col("__o_bucket"))).reduce(_ && _)
    keyed
      .withColumn("__within", row_number().over(within).cast("long") - 1L)
      .join(broadcast(off), cond)
      .withColumn("shuffle_rank", col("__boffset") + col("__within"))
      .drop((oKeys.map(_._2) ++
        Seq("__h", "__bucket", "__within", "__boffset")): _*)
  }
}
