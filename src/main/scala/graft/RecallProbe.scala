package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway tuning harness: recall@5 of the ANN paths at a given SF
  * under several parameter settings. Usage: runMain graft.RecallProbe <sfDir> */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Similarity
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx, Seq("query_id", "match_id"), "left_semi").count().toDouble / nExact
    for (nprobe <- Seq(8, 10, 12)) {
      val t0 = System.nanoTime()
      val r = recall(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = nprobe))
      println(f"IVF nlist=16 nprobe=$nprobe recall=$r%.3f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    for ((bits, bands) <- Seq((60, 20), (96, 16), (144, 24), (128, 16), (192, 24))) {
      val t0 = System.nanoTime()
      val r = recall(Similarity.lshTopK(vecs, queries, "vec_id", "embedding",
        k = 5, bits = bits, bands = bands))
      println(f"LSH bits=$bits bands=$bands recall=$r%.3f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
