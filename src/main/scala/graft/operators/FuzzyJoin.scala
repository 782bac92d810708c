package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy string) join — the entity-resolution workhorse
  * (matching customer/supplier/product names across sources that spell
  * them slightly differently).
  *
  * Scale shape (Gravano et al. 2001, "Approximate string joins in a
  * database (almost) for free"): never all-pairs over the corpus.
  *  - LONG strings: each explodes to its q-gram MULTISET (an
  *    inverted-index shuffle, work ∝ corpus size); candidates come
  *    from the q-gram equi-join with the COUNT FILTER — strings within
  *    edit distance k share ≥ max(|a|,|b|) − q + 1 − k·q q-grams (each
  *    edit destroys at most q) — a bound with PERFECT RECALL whenever
  *    it is positive, i.e. whenever the longer string has ≥ q·(k+1)
  *    characters.
  *  - SHORT strings (length < q·(k+1)): the bound is non-positive —
  *    "ab"/"ac" at k=1 share zero bigrams — so they pair through their
  *    DISTINCT VALUES: the short-value set is bounded by |Σ|^(q·(k+1)−1)
  *    per block (a constant independent of corpus size), value pairs
  *    verify exactly, and ids expand back through equi-joins. A
  *    short×long pair with long ≥ q·(k+1) either shares a gram
  *    (covered by the gram join) or exceeds k by the length gap alone.
  *  - Optional BLOCKING (`blockCol`): the block key rides every
  *    candidate join, so cross-block pairs never reach the count
  *    filter or the verify — the standard ER blocking discipline, a
  *    join-key restriction rather than a post-filter.
  * Only candidates pay the exact `levenshtein` verify (Spark builtin,
  * codegen'd; classic unit costs — parity with the oracle's
  * implementation pinned by the rel_edit_distance gate). */
object FuzzyJoin {

  private def grams(df: DataFrame, id: String, str: String,
      q: Int, block: Column): DataFrame =
    df.select(col(id).as("_id"), col(str).as("_s"), block.as("_blk"))
      .where(length(col("_s")) >= q)
      .select(col("_id"), col("_blk"), length(col("_s")).as("_len"),
        explode(transform(sequence(lit(1), length(col("_s")) - (q - 1)),
          i => col("_s").substr(i, lit(q)))).as("_g"))
      .groupBy("_id", "_blk", "_len", "_g")
      .agg(count(lit(1)).as("_c"))

  /** Gram-join candidates with the count filter (recall-complete for
    * pairs whose longer side has ≥ q·(k+1) chars); the block key is
    * part of the join, so cross-block pairs are pruned pre-filter. */
  private def gramCandidates(ga: DataFrame, gb: DataFrame,
      aId: String, bId: String, cond: Column, k: Int, q: Int): DataFrame =
    ga.as("a").join(gb.as("b"),
        col("a._g") === col("b._g") && col("a._blk") === col("b._blk") && cond)
      .groupBy(col("a._id").as(aId), col("b._id").as(bId),
        col("a._len").as("_la"), col("b._len").as("_lb"))
      .agg(sum(least(col("a._c"), col("b._c"))).as("_common"))
      .filter(col("_common") >=
        greatest(col("_la"), col("_lb")) - (q - 1) - k * q)
      .select(aId, bId)

  /** Distinct SHORT (value, block) pairs of both sides, paired within
    * a recall-safe LENGTH BAND (edit distance ≥ |len gap|) and the
    * block — the value set is alphabet-bounded per block, never
    * corpus-sized — then pre-verified exactly. */
  private def shortValuePairs(a: DataFrame, b: DataFrame,
      k: Int, q: Int): DataFrame = {
    val lim = q * (k + 1)
    val va = a.where(length(col("_vs")) < lim).distinct()
    val vb = b.where(length(col("_vs")) < lim).distinct()
      .withColumnRenamed("_vs", "_ws")
      .withColumn("_lb", length(col("_ws")))
    va.select(col("_vs"), col("_vb"),
        explode(sequence(greatest(length(col("_vs")) - k, lit(0)),
          length(col("_vs")) + k)).as("_lb"))
      .join(vb, Seq("_lb", "_vb"))
      .filter(levenshtein(col("_vs"), col("_ws")) <= k)
      .select("_vs", "_ws", "_vb")
  }

  /** Self-join: (id_a, id_b, dist ≤ k) over one table's string column,
    * id_a < id_b. `q` = gram width (2 is the classic default; larger q
    * filters harder but needs longer strings); `blockCol` restricts
    * candidates to equal block values (ER blocking). */
  def selfJoin(df: DataFrame, id: String, str: String, k: Int,
      q: Int = 2, blockCol: Option[String] = None): DataFrame = {
    require(k >= 0, "k must be non-negative")
    require(q >= 1, "q must be positive")
    val block = blockCol.map(col).getOrElse(lit(0))
    val g = grams(df, id, str, q, block)
    val gramCand = gramCandidates(g, g, "id_a", "id_b",
      col("a._id") < col("b._id"), k, q)
    val vals = df.select(col(str).as("_vs"), block.as("_vb"))
    val names = df.select(col(id).as("_nid"), col(str).as("_ns"),
      block.as("_nb"))
    val shortCand = shortValuePairs(vals, vals, k, q)
      .join(names.select(col("_nid").as("id_a"), col("_ns").as("_vs"),
        col("_nb").as("_vb")), Seq("_vs", "_vb"))
      .join(names.select(col("_nid").as("id_b"), col("_ns").as("_ws"),
        col("_nb").as("_vb")), Seq("_ws", "_vb"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    verify(gramCand.unionByName(shortCand).distinct(), names, names,
      "id_a", "id_b", k)
  }

  /** Two-table flavor: (left_id, right_id, dist ≤ k). */
  def join(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      k: Int, q: Int = 2, leftBlock: Option[String] = None,
      rightBlock: Option[String] = None): DataFrame = {
    require(k >= 0 && q >= 1, "k >= 0 and q >= 1")
    require(leftBlock.isDefined == rightBlock.isDefined,
      "blocking needs a column on both sides")
    val lb = leftBlock.map(col).getOrElse(lit(0))
    val rb = rightBlock.map(col).getOrElse(lit(0))
    val gramCand = gramCandidates(
      grams(left, leftId, leftStr, q, lb),
      grams(right, rightId, rightStr, q, rb),
      "left_id", "right_id", lit(true), k, q)
    val ln = left.select(col(leftId).as("_nid"), col(leftStr).as("_ns"),
      lb.as("_nb"))
    val rn = right.select(col(rightId).as("_nid"), col(rightStr).as("_ns"),
      rb.as("_nb"))
    val shortCand = shortValuePairs(
        left.select(col(leftStr).as("_vs"), lb.as("_vb")),
        right.select(col(rightStr).as("_vs"), rb.as("_vb")), k, q)
      .join(ln.select(col("_nid").as("left_id"), col("_ns").as("_vs"),
        col("_nb").as("_vb")), Seq("_vs", "_vb"))
      .join(rn.select(col("_nid").as("right_id"), col("_ns").as("_ws"),
        col("_nb").as("_vb")), Seq("_ws", "_vb"))
      .select("left_id", "right_id")
    verify(gramCand.unionByName(shortCand).distinct(), ln, rn,
      "left_id", "right_id", k)
  }

  /** The ONE expand-and-verify tail: join the candidate ids back to
    * their strings (per side) and keep exact distance ≤ k. */
  private def verify(cand: DataFrame, aNames: DataFrame, bNames: DataFrame,
      aId: String, bId: String, k: Int): DataFrame =
    cand
      .join(aNames.select(col("_nid").as(aId), col("_ns").as("_sa")), aId)
      .join(bNames.select(col("_nid").as(bId), col("_ns").as("_sb")), bId)
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")))
      .filter(col("dist") <= k)
      .select(aId, bId, "dist")
}
