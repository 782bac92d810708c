package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that
  * turns pairwise near-duplicate MATCHES into duplicate CLUSTERS (pick
  * one keeper per component; the standard tail of every MinHash/SimHash
  * dedup pipeline).
  *
  * Algorithm: iterative minimum-label propagation. Each node starts
  * labeled with itself; every round each node adopts the minimum label
  * among itself and its neighbors; stop when no label changes. Rounds
  * needed = graph diameter — near-duplicate clusters are small and
  * dense (diameter 2-4), so a handful of hash-shuffle joins suffices;
  * `maxIter` bounds pathological chains. Labels persist per round and
  * the previous round unpersists — no lineage blow-up, no driver-side
  * graph. (GraphX solves the general case; for dedup clusters this
  * stays in the DataFrame plane with exact-oracle semantics.)
  */
object ConnectedComponents {

  /** Returns (`idCol`, component) for every node appearing in `edges`,
    * where component = the minimum node id in the component. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      idCol: String = "id", maxIter: Int = 20): DataFrame = {
    // symmetrize once: propagation then only needs one direction
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (eager), NOT persist: each round's plan references
    // the previous round's twice (propagation + convergence check), so
    // without lineage truncation the logical tree doubles per round and
    // an 11-hop chain OOMs the driver on plan strings alone. On a
    // cluster swap in reliable checkpointing; the iteration shape is
    // identical.
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("label", "nl"), "b")
        .groupBy(col("a").as("id")).agg(min(col("nl")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels.select(col("id").as(idCol), col("label").as("component"))
  }
}
