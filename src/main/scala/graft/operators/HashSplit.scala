package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and downsampling by content hash —
  * how a training pipeline assigns held-out splits: membership must be
  * a pure function of the record id (stable across re-runs, re-shards,
  * engine versions and cluster sizes), never `rand()` (which silently
  * re-deals every retry/recomputation and leaks test data into train).
  *
  * The bucket is the first 32 bits of md5 of the id's string form —
  * engine-portable (md5 is everywhere; xxhash is not) and uniform.
  * Everything is a pure projection: no shuffle, no state, scales
  * embarrassingly. */
object HashSplit {

  private val Buckets = 4294967296L // 2^32

  /** Uniform bucket in [0, 2^32) from md5(id). */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Adds `splitCol` assigning each row to a named split with the given
    * weights (must sum to ~1; the last split absorbs rounding). */
  def assign(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val thresholds = splits.map(_._1).zip(cum.map(w => math.round(w * Buckets)))
    val b = bucket(col(idCol))
    val expr = thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((name, t), els) => when(b < t, name).otherwise(els)
    }
    df.withColumn(splitCol, expr)
  }

  /** Keep a deterministic `rate` fraction of rows (bucket < rate·2^32).
    * Subsets are NESTED: sample(0.1) ⊆ sample(0.2) — growing a sample
    * keeps every previously selected row, unlike `df.sample`. */
  def sample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    df.filter(bucket(col(idCol)) < math.round(rate * Buckets))
  }

  /** MIX EQUALIZATION: deterministically downsample every stratum to
    * (approximately) the size of the smallest one — the "balance the
    * source mix" step of training-data assembly. The α = 0 point of
    * [[temperatureMix]] (pow(x, 1.0) is exactly x, so membership is
    * bit-identical to the direct min/n threshold). */
  def equalizeMix(df: DataFrame, idCol: String,
      strataCol: String): DataFrame =
    temperatureMix(df, idCol, strataCol, alpha = 0.0)

  /** TEMPERATURE mixing (the multilingual-LM data-mixing dial, e.g.
    * XLM-R's α-smoothed sampling): kept counts follow n_s^α — α = 1
    * keeps everything (proportional), α = 0 equalizes to the smallest
    * stratum ([[equalizeMix]]), between flattens the source
    * distribution while favoring larger sources. Downsample-only
    * realization: rate_s = (n_min / n_s)^(1−α), which keeps the
    * smallest stratum whole and scales every other toward it; rates
    * are DERIVED from the data, then applied through the same
    * md5-bucket threshold, so membership is reproducible run-to-run
    * and NESTED as α grows. Plan: one tiny per-stratum count aggregate
    * broadcast back onto a pure projection filter — no extra pass over
    * the data. */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0,1]")
    import org.apache.spark.sql.functions.{broadcast, count => cnt, lit => l, min => mn}
    val counts = df.groupBy(strataCol).agg(cnt(l(1)).as("__n"))
      .withColumnRenamed(strataCol, "__stratum")
    val minN = counts.agg(mn("__n").as("__min_n"))
    // null-safe join (<=>): the groupBy emits a NULL-stratum count row,
    // but plain equality never matches NULL — a = join would silently
    // drop every NULL-stratum row while stratifiedSample keeps them
    df.join(broadcast(counts), col(strataCol) <=> col("__stratum"))
      .crossJoin(broadcast(minN))
      .filter(bucket(col(idCol)) <
        round(pow(col("__min_n").cast("double") / col("__n"), 1.0 - alpha) * Buckets))
      .drop("__stratum", "__n", "__min_n")
  }

  /** PER-DOMAIN CAP (the RefinedWeb/C4-style host-level limit): keep at
    * most `cap` documents per domain, preferring the highest `rankBy`
    * value with the id as a deterministic tie-break. One shuffle on the
    * domain; WindowGroupLimit prunes past the cap during the sort at
    * scale, so a million-page domain never materializes fully ranked. */
  def domainCap(df: DataFrame, idCol: String, domainCol: String,
      cap: Int, rankBy: String): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col(rankBy).desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** DETERMINISTIC GLOBAL SHUFFLE into training shards — the "randomize
    * the example order" step before writing training data, without a
    * single grain of `rand()`: shard = md5(id ⊕ salt) mod `nShards`,
    * within-shard position = rank of the same hash. Changing the salt
    * re-deals the whole corpus (one salt per epoch); keeping it makes
    * the order reproducible run-to-run and engine-portable. Plan: one
    * shuffle on the shard key + a per-shard sort (the window partitions
    * by shard, so no global single-partition sort); at 100 TB each
    * shard sorts independently across executors and writes its own
    * file — exactly the training-shard layout. The id joins the hash in
    * the sort key so even a hash collision keeps a total order. */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int,
      salt: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = md5(concat(col(idCol).cast("string"), lit("#"), lit(salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** WEIGHTED (importance) sampling: per-row keep probability ∝ its
    * weight — the quality-weighted corpus downsample (a document with
    * twice the quality score survives twice as often). Keep iff
    * bucket(id) < min(1, target·w/mean(w))·2³². Weights above
    * mean/target clip at probability 1 (the standard importance
    * clip), so the realized fraction ≈ `target` when few rows clip.
    * Deterministic and ENGINE-EXACT: the mean is the decimal-exact Σ
    * cast to double over the count (two correctly-rounded ops), the
    * threshold is correctly-rounded double arithmetic only — no
    * transcendentals — and membership compares the integer md5
    * bucket, so an oracle replays it bit-for-bit. Plan: one 1-row
    * broadcast onto a pure projection filter. Null/non-positive
    * weights never survive. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      target: Double): DataFrame = {
    require(target >= 0.0 && target <= 1.0, "target must be in [0,1]")
    import org.apache.spark.sql.types.DecimalType
    // eligible rows only, for BOTH the mean and the filter: a mean
    // over the full frame would let null/non-positive weights skew —
    // or, with negative weights, invert — every keep probability
    val eligible = df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
    val m = eligible.agg(
      (sum(col(weightCol).cast(DecimalType(28, 12))).cast("double")
        / count(lit(1))).as("__mw"))
    eligible.crossJoin(broadcast(m))
      .filter(bucket(col(idCol)) <
        least(lit(1.0), lit(target) * col(weightCol) / col("__mw"))
          * lit(Buckets.toDouble))
      .drop("__mw")
  }

  /** STRATIFIED deterministic sampling: a per-stratum keep rate (the
    * training-mix dial — e.g. keep 100% of a rare language, 10% of the
    * dominant one). Still a pure projection: the rate lookup compiles
    * to a literal CASE over the stratum column, membership stays a
    * function of (id, stratum rate) only, and per-stratum subsets stay
    * nested as rates grow. Strata absent from `rates` keep
    * `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, "rates must be in [0,1]"))
    val threshold = rates.foldRight(lit(math.round(defaultRate * Buckets)): Column) {
      case ((stratum, r), els) =>
        when(col(strataCol) === stratum, lit(math.round(r * Buckets))).otherwise(els)
    }
    df.filter(bucket(col(idCol)) < threshold)
  }
}
