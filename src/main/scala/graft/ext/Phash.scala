package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

import Multimodal.MediaItem

/** Image near-duplicate detection: perceptual difference hash (dHash)
  * over decoded rasters + Hamming-bucketed pair generation — the step
  * that ties the codec plane into the dedup plane the way a multimodal
  * corpus pipeline needs (re-encoded/brightness-shifted copies of an
  * image hash within a few bits of each other; byte-level dedup sees
  * nothing).
  *
  * dHash (the standard 64-bit perceptual hash): pool the image to a
  * 9×8 luma grid, bit (gy·8 + gx) = 1 iff grid(gx, gy) > grid(gx+1,
  * gy) — brightness/contrast-invariant gradient signs. INTEGER
  * arithmetic end to end: block LUMA SUMS (ITU-R BT.601 integer
  * weights 299/587/114) compare identically to means when every block
  * holds the same pixel count, so the whole hash is exact and a SQL
  * oracle replays it bit-for-bit.
  *
  * Scale shape: the hash is one `mapPartitions` raster walk per image
  * (decoder state per partition — the [[Multimodal]] batch
  * discipline); pair generation reuses the SimHash pigeonhole
  * machinery ([[Dedup.hammingPairs]]): equi-join on 16-bit hash
  * blocks, exact `bit_count(xor)` verify, never all-pairs.
  */
object Phash {

  /** Grid geometry: 9 columns × 8 rows → 8×8 = 64 comparison bits. */
  val GridW = 9
  val GridH = 8

  /** One image's (media_id, dhash); empty for payloads that are not
    * complete P6 rasters or whose dimensions don't tile the 9×8 grid
    * evenly (equal-count blocks are what make sum-compares ≡
    * mean-compares — production resizes to 9×8 anyway). */
  def dhash(item: MediaItem): Iterator[(Long, Long)] = {
    val hd = Multimodal.Ppm.header(item.payload)
    if (hd == null) return Iterator.empty
    val (w, h, off) = hd
    if (w % GridW != 0 || h % GridH != 0) return Iterator.empty
    val (bw, bh) = (w / GridW, h / GridH)
    val p = item.payload
    val lum = Array.ofDim[Long](GridH, GridW)
    var y = 0
    while (y < h) {
      val gy = y / bh
      val row = off + 3 * y * w
      var x = 0
      while (x < w) {
        val o = row + 3 * x
        lum(gy)(x / bw) += 299L * (p(o) & 0xff) +
          587L * (p(o + 1) & 0xff) + 114L * (p(o + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    var ph = 0L
    var gy = 0
    while (gy < GridH) {
      var gx = 0
      while (gx < GridW - 1) {
        if (lum(gy)(gx) > lum(gy)(gx + 1)) ph |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    Iterator.single((item.media_id, ph))
  }

  /** Distributed dHash table (_id, sh) — the [[Dedup.hammingPairs]]
    * input contract, one raster walk per image. */
  def dhashTable(media: Dataset[MediaItem]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (once, not per row)
      it.flatMap(dhash)
    }.toDF("_id", "sh")
  }

  /** Near-duplicate image pairs: (id_a, id_b, hamming <= maxHamming),
    * pigeonhole-bucketed — identical machinery (and recall guarantee)
    * as the text SimHash plane. */
  def pairs(media: Dataset[MediaItem], maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs(dhashTable(media), maxHamming)
}
