package graft.write

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Embedding-collection destination — the role of the reference's
  * vector-store adapters (dlt/destinations/impl/{qdrant,weaviate,
  * lancedb}/: write vectors + build an index so readers query without
  * re-scanning), re-expressed lakehouse-first: a "collection" is a set
  * of manifest-committed tables in a [[TableStore]], IVF-list-bucketed
  * so a probe reads nprobe/nlist of the corpus from a cold start.
  *
  * Layout for collection `t`:
  *  - `t`              — the corpus rows + `__list` (nearest coarse
  *    centroid), segment RANGE-PARTITIONED by `__list` with min/max
  *    stats, so list-targeted reads prune to the probed segments;
  *  - `t__centroids`   — (`__list`, `__centroid`): the coarse quantizer,
  *    nlist rows (driver-small by construction);
  *  - `t__ivf_meta`    — one row of index parameters (nlist, seed,
  *    train_fraction, metric, dim) — the manifest a reader validates
  *    probes against, as the lancedb adapter stores index config;
  *  - `t__collection`  — one row PER GENERATION pinning the snapshot
  *    id of every sub-table: the COLLECTION-LEVEL manifest. Writers
  *    append the next `gen` row LAST, so it is the linearization point
  *    of a multi-table model swap — a crash mid-rewrite leaves the
  *    previous complete generation the newest row, and probes (which
  *    time-travel every sub-table to the pinned snapshots via
  *    [[TableStore.readAt]]) never observe new SQ8 stats over old
  *    codes or fresh centroids over a stale corpus, with NO lock on
  *    the read side. Older rows stay probe-able history
  *    ([[generationAt]] — the Iceberg snapshot-log shape) until
  *    [[pruneGenerations]] trims them; [[vacuumCollection]] retains
  *    every still-listed generation's segments while reclaiming the
  *    rest.
  *
  * 100 TB shape: the one expensive step (k-means fit on a hash-sample +
  * one assignment pass) happens ONCE at write; every subsequent query
  * is a broadcast centroid ranking + a pruned equi-join on `__list`.
  * Rebuilding the index per query session — what the in-memory
  * [[Similarity.ivfTopK]] does — is the thing this sink amortizes away.
  */
object VectorSink {

  final case class IvfMeta(nlist: Int, seed: Long, trainFraction: Double,
      metric: String, dim: Int)

  /** One CONSISTENT generation of a collection: every sub-table
    * time-travelled to the snapshot the collection manifest pinned. */
  final case class Generation(meta: IvfMeta, corpus: DataFrame,
      centroids: DataFrame, stats: Option[DataFrame],
      pqModel: Option[graft.ext.Pq.PqModel])

  private val SubTables = Seq(
    "" -> "corpus_snap", "__centroids" -> "centroids_snap",
    "__ivf_meta" -> "meta_snap", "__sq_stats" -> "stats_snap",
    "__pq_codebooks" -> "codebooks_snap", "__pq_meta" -> "pqmeta_snap")

  /** Commit the collection-level manifest: APPEND one row pinning each
    * sub-table's LATEST snapshot (−1 for sub-tables this metric does
    * not use) under the next `gen` number. Called LAST by every
    * writer, under the writer lock — this commit is what makes the new
    * generation visible; earlier rows stay as probe-able HISTORY
    * ([[generationAt]]) until [[pruneGenerations]] trims them. */
  private def commitCollection(store: TableStore, table: String,
      spark: SparkSession): Unit = {
    import spark.implicits._
    val ct = s"${table}__collection"
    val gen = if (!store.exists(ct)) 1L
      else store.read(ct).agg(max("gen")).head().getLong(0) + 1L
    val snaps = SubTables.map { case (suffix, _) =>
      val t = s"$table$suffix"
      if (store.exists(t)) store.snapshots(t).max else -1L
    }
    store.append(ct,
      Seq((gen, snaps(0), snaps(1), snaps(2), snaps(3), snaps(4), snaps(5)))
        .toDF("gen" +: SubTables.map(_._2): _*))
  }

  /** Generation numbers still probe-able, oldest → newest. */
  def generations(store: TableStore, table: String): Seq[Long] = {
    import org.apache.spark.sql.Row
    store.read(s"${table}__collection").select("gen").collect()
      .map { case Row(g: Long) => g }.toSeq.sorted
  }

  /** Trim the collection's generation HISTORY to the newest `keep`
    * rows — after which [[vacuumCollection]] (which retains every pin
    * still listed) can reclaim the dropped generations' segments. */
  def pruneGenerations(store: TableStore, table: String,
      keep: Int = 2): Unit = store.exclusively(table) {
    require(keep >= 1, "keep at least the live generation")
    val ct = s"${table}__collection"
    val gens = generations(store, table)
    if (gens.length > keep) {
      val floor = gens.takeRight(keep).head
      store.overwrite(ct, store.read(ct).filter(col("gen") >= floor))
    }
  }

  private def metaFrom(r: org.apache.spark.sql.Row): IvfMeta =
    IvfMeta(r.getAs[Int]("nlist"), r.getAs[Long]("seed"),
      r.getAs[Double]("train_fraction"), r.getAs[String]("metric"),
      r.getAs[Int]("dim"))

  /** Resolve the collection's CURRENT generation — the NEWEST row of
    * the collection manifest — then pin every sub-table to its
    * recorded snapshot. No lock — the manifest row was committed after
    * all its sub-table snapshots, so the set is consistent even
    * against a concurrent [[rebalance]] or a crash that left newer
    * partial sub-table commits behind. */
  def generation(store: TableStore, table: String): Generation =
    resolve(store, table,
      store.read(s"${table}__collection").orderBy(col("gen").desc).head())

  /** Resolve a HISTORICAL generation by number — probe the collection
    * as it stood before later appends/rebalances, as long as
    * [[pruneGenerations]] has not trimmed the row (and
    * [[vacuumCollection]], which retains every still-listed pin, has
    * not been narrowed below it). */
  def generationAt(store: TableStore, table: String, gen: Long): Generation = {
    val rows = store.read(s"${table}__collection")
      .filter(col("gen") === gen).collect()
    require(rows.nonEmpty, s"collection '$table' has no generation $gen " +
      s"(live: ${generations(store, table).mkString(", ")})")
    resolve(store, table, rows.head)
  }

  private def resolve(store: TableStore, table: String,
      c: org.apache.spark.sql.Row): Generation = {
    def at(suffix: String): DataFrame = {
      val snapCol = SubTables.toMap.apply(suffix)
      store.readAt(s"$table$suffix", c.getAs[Long](snapCol))
    }
    val meta = metaFrom(at("__ivf_meta").head())
    val corpus = at("")
    val centroids = at("__centroids")
    meta.metric match {
      case "cosine" => Generation(meta, corpus, centroids, None, None)
      case "cosine-sq8" =>
        Generation(meta, corpus, centroids, Some(at("__sq_stats")), None)
      case "cosine-pq" =>
        val pm = at("__pq_meta").head()
        val model = pqModelFrom(at("__pq_codebooks"),
          pm.getAs[Int]("m"), pm.getAs[Int]("ksub"), meta.dim, table)
        Generation(meta, corpus, centroids, None, Some(model))
      case other => throw new IllegalArgumentException(
        s"collection '$table' has unknown metric '$other'")
    }
  }

  /** Index `corpus` and commit the collection through `store`. The
    * sub-table swaps are each atomic; the collection manifest commit
    * (last) is what flips readers to the new generation. */
  def writeIvf(store: TableStore, table: String, corpus: DataFrame,
      id: String, vec: String, nlist: Int = 16, seed: Long = 42L,
      trainFraction: Double = 0.25): Unit = store.exclusively(table) {
    val (assigned, centroids) =
      Similarity.ivfIndex(corpus, id, vec, nlist, seed, trainFraction)
    val dim = corpus.select(size(col(vec))).head().getInt(0)
    store.overwrite(table, assigned,
      statsFor = Seq("__list"), rangeBy = Seq("__list"))
    store.overwrite(s"${table}__centroids", centroids)
    val spark = corpus.sparkSession
    import spark.implicits._
    store.overwrite(s"${table}__ivf_meta",
      Seq((nlist, seed, trainFraction, "cosine", dim))
        .toDF("nlist", "seed", "train_fraction", "metric", "dim"))
    commitCollection(store, table, spark)
  }

  def readMeta(store: TableStore, table: String): IvfMeta =
    metaFrom(store.read(s"${table}__ivf_meta").head())

  /** Top-k over the PERSISTED collection: cold-read the centroids and
    * the bucketed corpus, probe with [[Similarity.ivfProbe]] — the same
    * math as the in-memory path, so `nprobe = nlist` is exact. The
    * sub-tables resolve through the collection manifest
    * ([[generation]]), so a concurrent [[rebalance]] — or a crash that
    * left partial sub-table commits — can never hand a probe centroids
    * from one generation and corpus rows from another. */
  def topK(store: TableStore, table: String, queries: DataFrame,
      id: String, vec: String, k: Int, nprobe: Int): DataFrame = {
    val g = generation(store, table)
    require(nprobe >= 1 && nprobe <= g.meta.nlist,
      s"nprobe $nprobe outside [1, ${g.meta.nlist}]")
    Similarity.ivfProbe(g.corpus, g.centroids, queries, id, vec, k, nprobe)
  }

  /** IVF + SQ8: the collection stores INT8 CODES instead of vectors
    * (4× less data under every probe scan — the FAISS IVF-SQ8 layout).
    * Extra table: `t__sq_stats` — one row of per-dimension (mins,
    * maxs), the dequantization parameters. The corpus rows themselves
    * hold only (id, `__list`, `__q`). */
  def writeIvfQuantized(store: TableStore, table: String, corpus: DataFrame,
      id: String, vec: String, nlist: Int = 16, seed: Long = 42L,
      trainFraction: Double = 0.25): Unit = store.exclusively(table) {
    val (assigned, centroids) =
      Similarity.ivfIndex(corpus, id, vec, nlist, seed, trainFraction)
    val dim = corpus.select(size(col(vec))).head().getInt(0)
    val stats = graft.ext.Quantize.dimStats(corpus, vec)
    store.overwrite(s"${table}__sq_stats", stats)
    val coded = assigned.crossJoin(broadcast(store.read(s"${table}__sq_stats")))
      .select(col(id), col("__list"),
        graft.functions.VectorFunctions.quantizeInt8(
          col(vec), col("mins"), col("maxs"))("q").as("__q"))
    store.overwrite(table, coded,
      statsFor = Seq("__list"), rangeBy = Seq("__list"))
    store.overwrite(s"${table}__centroids", centroids)
    val spark = corpus.sparkSession
    import spark.implicits._
    store.overwrite(s"${table}__ivf_meta",
      Seq((nlist, seed, trainFraction, "cosine-sq8", dim))
        .toDF("nlist", "seed", "train_fraction", "metric", "dim"))
    commitCollection(store, table, spark)
  }

  /** THE centroid-ranking implementation — distance² ranking
    * (|c|² − 2·v·c, the |v|² term is rank-invariant) with ties to the
    * lowest `__list`, matching the k-means transform's first-minimum
    * argmin. Shared by the probe paths ([[probeLists]]) and the append
    * assignment ([[assignToStored]]) so the two can never diverge:
    * appended rows must land exactly where a probe will look. Appends
    * the top-`maxRank` (`__list`) per `idCol` row; all other input
    * columns pass through. */
  private def rankedLists(rows: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, maxRank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dot = graft.functions.VectorFunctions.dotp _
    val wd = rows.crossJoin(broadcast(centroids))
      .withColumn("__d", dot(col("__centroid"), col("__centroid"))
        - lit(2.0) * dot(col(vecCol), col("__centroid")))
    val w = Window.partitionBy(idCol).orderBy(col("__d"), col("__list"))
    wd.withColumn("__pr", row_number().over(w))
      .filter(col("__pr") <= maxRank)
      .drop("__d", "__pr", "__centroid")
  }

  /** Centroid-ranked probe lists per query: (query_id, __qv, __list)
    * for the `nprobe` nearest coarse centroids — the shared head of
    * every quantized probe path. */
  private def probeLists(centroids: DataFrame, queries: DataFrame,
      id: String, vec: String, nprobe: Int): DataFrame =
    rankedLists(
      queries.select(col(id).as("query_id"), col(vec).as("__qv")),
      centroids, "query_id", "__qv", nprobe)
      .select(col("query_id"), col("__qv"), col("__list"))

  /** Top-k over the QUANTIZED collection: centroid-ranked probe lists,
    * ADC (dequantized-cosine) shortlist over the stored codes, exact
    * re-rank of ONLY the shortlist against `fullVectors` (the
    * full-precision corpus — a point-read join, shortlist-sized). With
    * `nprobe = nlist` this is exactly the ADC re-rank pipeline
    * ([[graft.ext.Quantize.rerankTopK]]), which is what the gate
    * exploits. */
  def topKQuantized(store: TableStore, table: String,
      fullVectors: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    // resolve ALL model tables through the collection manifest:
    // dequantizing old codes with new stats (or ranking old lists with
    // new centroids) mid-rebalance would silently corrupt every score
    val g = generation(store, table)
    require(g.meta.metric == "cosine-sq8",
      s"collection '$table' is '${g.meta.metric}', not an SQ8 collection")
    require(nprobe >= 1 && nprobe <= g.meta.nlist,
      s"nprobe $nprobe outside [1, ${g.meta.nlist}]")
    val stats = broadcast(g.stats.get)
    val probes = probeLists(g.centroids, queries, id, vec, nprobe)
    val deq = g.corpus.crossJoin(stats)
      .select(col(id).as("match_id"), col("__list"),
        graft.functions.VectorFunctions.dequantizeInt8(
          col("__q"), col("mins"), col("maxs")).as("__deq"))
    // ADC shortlist + exact re-rank: the ONE shared implementation of
    // the tie-break-sensitive tail ([[graft.ext.Quantize.shortlistRerank]])
    graft.ext.Quantize.shortlistRerank(
      probes.join(deq, Seq("__list"))
        .filter(col("query_id") =!= col("match_id")),
      fullVectors, id, vec, k, shortlist)
  }

  /** IVF + PQ (Jégou'11 IVFADC; FAISS `IVFx,PQy`): the collection
    * stores m-byte PRODUCT-QUANTIZED codes — m·log₂(ksub) bits per
    * vector against SQ8's 8·d, the layout billion-vector indexes
    * actually ship. Extra tables: `t__pq_codebooks` ((sub, cl,
    * centroid) — m·ksub rows, sketch-sized) and `t__pq_meta` (m, ksub,
    * iters, dim). Training follows the deterministic [[graft.ext.Pq]]
    * contract, so a probe with `nprobe = nlist` is oracle-exact. */
  def writeIvfPq(store: TableStore, table: String, corpus: DataFrame,
      id: String, vec: String, nlist: Int = 16, seed: Long = 42L,
      trainFraction: Double = 0.25, m: Int = 4, ksub: Int = 16,
      iters: Int = 2): Unit = store.exclusively(table) {
    val (assigned, centroids) =
      Similarity.ivfIndex(corpus, id, vec, nlist, seed, trainFraction)
    val dim = corpus.select(size(col(vec))).head().getInt(0)
    val model = graft.ext.Pq.train(corpus, id, vec, m, ksub, iters)
    val coded = assigned.select(col(id), col("__list"),
      graft.ext.Pq.codes(col(vec), model).as("__codes"))
    store.overwrite(table, coded,
      statsFor = Seq("__list"), rangeBy = Seq("__list"))
    store.overwrite(s"${table}__centroids", centroids)
    val spark = corpus.sparkSession
    import spark.implicits._
    val cbRows = for {
      j <- model.codebooks.indices
      c <- model.codebooks(j).indices
    } yield (j, c, model.codebooks(j)(c).toSeq)
    store.overwrite(s"${table}__pq_codebooks",
      cbRows.toDF("sub", "cl", "centroid"))
    store.overwrite(s"${table}__pq_meta",
      Seq((m, ksub, iters, dim)).toDF("m", "ksub", "iters", "dim"))
    store.overwrite(s"${table}__ivf_meta",
      Seq((nlist, seed, trainFraction, "cosine-pq", dim))
        .toDF("nlist", "seed", "train_fraction", "metric", "dim"))
    commitCollection(store, table, spark)
  }

  /** Rebuild the [[graft.ext.Pq.PqModel]] from a codebook frame
    * (m·ksub rows — a driver-small point read by contract). */
  private def pqModelFrom(codebooks: DataFrame, m: Int, ksub: Int,
      dim: Int, table: String): graft.ext.Pq.PqModel = {
    val dsub = dim / m
    val books = Array.ofDim[Array[Double]](m, ksub)
    codebooks.collect().foreach { r =>
      books(r.getAs[Int]("sub"))(r.getAs[Int]("cl")) =
        r.getSeq[Double](r.fieldIndex("centroid")).toArray
    }
    require(books.forall(_.forall(_ != null)),
      s"collection '$table' codebook table is incomplete")
    graft.ext.Pq.PqModel(m, dsub, books.map(_.map(identity)))
  }

  /** The CURRENT PQ model (writer-side: called under the writer lock
    * by [[append]]). Probes use [[generation]] instead. */
  private def readPqModel(store: TableStore, table: String,
      dim: Int): graft.ext.Pq.PqModel = {
    val pm = store.read(s"${table}__pq_meta").head()
    pqModelFrom(store.read(s"${table}__pq_codebooks"),
      pm.getAs[Int]("m"), pm.getAs[Int]("ksub"), dim, table)
  }

  /** Per-list occupancy of collection `table`: one (list, size) entry
    * for EVERY coarse list in [0, nlist) — empty lists included, they
    * are exactly what a skewed quantizer produces. nlist rows by
    * contract (driver-small); the count aggregate is the only scan. */
  def listSizes(store: TableStore, table: String): Array[(Int, Long)] = {
    val g = generation(store, table)
    val counts = g.corpus.groupBy("__list").count()
      .collect()
      .map(r => r.getInt(r.fieldIndex("__list")) ->
        r.getLong(r.fieldIndex("count"))).toMap
    Array.tabulate(g.meta.nlist)(l => l -> counts.getOrElse(l, 0L))
  }

  /** Coarse-list skew: max occupancy / mean occupancy over all nlist
    * lists (empties count toward the mean). 1.0 = perfectly balanced;
    * nlist = the whole corpus in one list — at which point a probe of
    * the hot list scans the corpus, not corpus/nlist. */
  def listSkew(store: TableStore, table: String): Double = {
    val sizes = listSizes(store, table).map(_._2)
    val total = sizes.sum
    if (total == 0L) 1.0 else sizes.max.toDouble * sizes.length / total
  }

  /** Assign `rows` to the nearest STORED coarse centroid —
    * [[rankedLists]] at rank 1, the SAME implementation the probe
    * paths rank with. The window partitions on a SYNTHETIC row key,
    * not `id`: a batch carrying duplicate ids must keep every row (the
    * writeIvf path does — the k-means transform is per-row), not
    * collapse to one survivor per id. Batch-sized work only. */
  private def assignToStored(store: TableStore, table: String,
      rows: DataFrame, id: String, vec: String): DataFrame =
    rankedLists(rows.withColumn("__rowid", monotonically_increasing_id()),
      store.read(s"${table}__centroids"), "__rowid", vec, 1)
      .drop("__rowid")

  /** Append a batch to an existing collection by encoding it under the
    * STORED model: coarse assignment against the stored centroids, and
    * for quantized collections the stored SQ8 stats / PQ codebooks —
    * readers keep seeing ONE consistent model. This is the cheap
    * incremental-growth path (one broadcast argmin over the batch, no
    * retraining); its cost is that distribution drift concentrates new
    * vectors in few lists (and SQ8 values outside the trained [min,max]
    * encode beyond the int8 range — reconstruction stays faithful, the
    * codes are stored as ints, but the byte-width contract degrades),
    * so probe balance decays over time — [[rebalance]] is the
    * maintenance op that restores it. */
  def append(store: TableStore, table: String, rows: DataFrame,
      id: String, vec: String): Unit = store.exclusively(table) {
    // the whole read-model-then-commit holds the corpus table's lock:
    // a concurrent rebalance would otherwise swap the centroids/stats/
    // codebooks between this append's model read and its commit,
    // landing rows encoded under the OLD model in the NEW collection
    val meta = readMeta(store, table)
    // the kernels truncate to min(length): a wrong-width batch would
    // ingest silently-corrupt assignments/codes — probe the width like
    // writeIvf's dim probe and fail loudly instead
    val bdim = rows.select(size(col(vec))).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"append to '$table': empty batch"))
    require(bdim == meta.dim,
      s"append to '$table': batch vectors have $bdim dims, " +
        s"collection is trained at ${meta.dim}")
    val assigned = assignToStored(store, table, rows, id, vec)
    meta.metric match {
      case "cosine" =>
        // match the stored segment schema (corpus columns + __list)
        val cols = store.read(table).columns
        store.append(table, assigned.select(cols.map(col): _*),
          statsFor = Seq("__list"))
      case "cosine-sq8" =>
        val stats = broadcast(store.read(s"${table}__sq_stats"))
        val coded = assigned.crossJoin(stats)
          .select(col(id), col("__list"),
            graft.functions.VectorFunctions.quantizeInt8(
              col(vec), col("mins"), col("maxs"))("q").as("__q"))
        store.append(table, coded, statsFor = Seq("__list"))
      case "cosine-pq" =>
        val model = readPqModel(store, table, meta.dim)
        val coded = assigned.select(col(id), col("__list"),
          graft.ext.Pq.codes(col(vec), model).as("__codes"))
        store.append(table, coded, statsFor = Seq("__list"))
      case other =>
        throw new IllegalArgumentException(
          s"collection '$table' has unknown metric '$other'")
    }
    // the appended corpus snapshot becomes visible to probes only
    // through the manifest — commit it as the last step
    commitCollection(store, table, rows.sparkSession)
  }

  /** Vacuum every sub-table of a collection WITHOUT breaking the
    * pinned generation: each sub-table retains its newest
    * `retainManifests` manifests PLUS the snapshot the collection
    * manifest pins — so out-of-band commits (a crash-interrupted
    * rewrite's partial sub-table swaps, manual writes) can never age
    * the live generation out of the retention window. Returns total
    * data directories deleted. */
  def vacuumCollection(store: TableStore, table: String,
      retainManifests: Int = 2): Int = store.exclusively(table) {
    val c = store.read(s"${table}__collection").head()
    val subs = SubTables.map { case (suffix, snapCol) =>
      (s"$table$suffix", c.getAs[Long](snapCol))
    }
    val fromSubs = subs.collect {
      case (t, snap) if snap >= 0L && store.exists(t) =>
        store.vacuum(t, retainManifests, Set(snap))
    }.sum
    fromSubs + store.vacuum(s"${table}__collection", retainManifests)
  }

  /** Append + SELF-HEAL: the post-append maintenance composition (the
    * way [[Zorder.compact]] pairs with lakehouse appends) — append the
    * batch under the stored model, then [[rebalance]] if the grown
    * collection's occupancy skew passed `maxSkew`. One lock
    * acquisition covers both, so no other writer can interleave
    * between the append and its maintenance. For quantized collections
    * `fullVectors` must cover the GROWN corpus (original + this
    * batch). Returns whether a rebalance ran. */
  def appendAndMaintain(store: TableStore, table: String, rows: DataFrame,
      id: String, vec: String, fullVectors: Option[DataFrame] = None,
      maxSkew: Double = 4.0): Boolean = store.exclusively(table) {
    append(store, table, rows, id, vec)
    rebalance(store, table, id, vec, fullVectors, maxSkew)
  }

  /** MAINTENANCE: retrain-and-rewrite the collection when coarse-list
    * occupancy skews past `maxSkew` (max/mean, see [[listSkew]]) — the
    * FAISS "retrain the coarse quantizer" discipline, composed as
    * write-over-read like [[Zorder.compact]]. [[append]] encodes under
    * the ORIGINAL quantizer, so a drifted ingest stream piles into a
    * few hot lists; every probe touching a hot list then scans far
    * more than corpus/nlist rows, and SQ8 codes spill past the int8
    * range against stale per-dimension stats. The rewrite retrains the FULL model — coarse
    * centroids and, for quantized collections, the SQ8 stats / PQ
    * codebooks — on today's corpus (same seed/params: the hash-sample
    * is deterministic per id set, so the new fit reflects the new data,
    * not RNG drift) and rewrites through the same writeIvf* path.
    *
    * Consistency: the COLLECTION MANIFEST (`t__collection`, committed
    * last by every writer) is the linearization point of the
    * multi-table model swap. Probes resolve every sub-table through it
    * ([[generation]]), so neither a concurrent rewrite nor a crash
    * that left newer partial sub-table commits can expose a mixed
    * model — a crash mid-rewrite simply leaves the previous complete
    * generation active; re-running rebalance finishes the swap.
    *
    * Plain IVF collections store their vectors, so the corpus is read
    * back from the collection itself. Quantized collections store only
    * lossy codes: pass `fullVectors` (the full-precision corpus, the
    * same frame [[topKQuantized]]/[[topKPq]] already require) — it must
    * cover exactly the collection's current rows. Holds the corpus
    * table's store lock for the whole read-train-rewrite, like
    * [[Zorder.compact]]. Returns whether a rewrite ran. */
  def rebalance(store: TableStore, table: String, id: String, vec: String,
      fullVectors: Option[DataFrame] = None,
      maxSkew: Double = 4.0): Boolean = {
    require(maxSkew >= 1.0, s"maxSkew $maxSkew below the balanced floor 1.0")
    store.exclusively(table) {
      if (listSkew(store, table) <= maxSkew) false
      else {
        val meta = readMeta(store, table)
        def full = {
          val f = fullVectors.getOrElse(throw new IllegalArgumentException(
            s"rebalancing quantized collection '$table' needs fullVectors: " +
              "the stored codes are lossy and cannot retrain the model"))
          // the rewrite REPLACES the collection with whatever `f` holds:
          // a stale corpus (e.g. missing an appended batch, or holding
          // a same-size but different id set) would silently drop or
          // swap vectors during maintenance — fail fast on a row-count
          // mismatch AND on collection ids absent from fullVectors.
          // (Stale VALUES under identical ids are uncheckable here: the
          // quantized collection stores only lossy codes — that part of
          // the contract stays with the caller.)
          val (have, want) = (f.count(), store.read(table).count())
          require(have == want,
            s"fullVectors covers $have rows but collection '$table' " +
              s"holds $want — pass the corpus INCLUDING every appended " +
              "batch, or appended vectors would vanish in the rewrite")
          val missing = store.read(table).select(col(id))
            .join(f.select(col(id)), Seq(id), "left_anti").count()
          require(missing == 0L,
            s"fullVectors is missing $missing of collection '$table's " +
              "ids — a different corpus would silently replace the " +
              "collection's content in the rewrite")
          f
        }
        meta.metric match {
          case "cosine" =>
            writeIvf(store, table, store.read(table).drop("__list"),
              id, vec, meta.nlist, meta.seed, meta.trainFraction)
          case "cosine-sq8" =>
            writeIvfQuantized(store, table, full, id, vec,
              meta.nlist, meta.seed, meta.trainFraction)
          case "cosine-pq" =>
            val pm = store.read(s"${table}__pq_meta").head()
            writeIvfPq(store, table, full, id, vec,
              meta.nlist, meta.seed, meta.trainFraction,
              pm.getAs[Int]("m"), pm.getAs[Int]("ksub"),
              pm.getAs[Int]("iters"))
          case other =>
            throw new IllegalArgumentException(
              s"collection '$table' has unknown metric '$other'")
        }
        true
      }
    }
  }

  /** Top-k over the PQ collection: probe lists, ADC shortlist over
    * CODE RECONSTRUCTIONS (the scan reads m bytes per vector), exact
    * re-rank of only the shortlist — the shared tail again, so
    * `nprobe = nlist` reproduces [[graft.ext.Pq.adcTopK]] exactly. */
  def topKPq(store: TableStore, table: String,
      fullVectors: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    // same consistent-snapshot discipline as [[topKQuantized]]
    val g = generation(store, table)
    require(g.meta.metric == "cosine-pq",
      s"collection '$table' is '${g.meta.metric}', not a PQ collection")
    require(nprobe >= 1 && nprobe <= g.meta.nlist,
      s"nprobe $nprobe outside [1, ${g.meta.nlist}]")
    val probes = probeLists(g.centroids, queries, id, vec, nprobe)
    val deq = g.corpus
      .select(col(id).as("match_id"), col("__list"),
        graft.ext.Pq.reconstruction(col("__codes"), g.pqModel.get).as("__deq"))
    graft.ext.Quantize.shortlistRerank(
      probes.join(deq, Seq("__list"))
        .filter(col("query_id") =!= col("match_id")),
      fullVectors, id, vec, k, shortlist)
  }
}
