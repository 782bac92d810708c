package graft.ext

import org.apache.spark.sql.Dataset

import Multimodal.MediaItem

/** REAL baseline JPEG codec (ITU-T T.81), grayscale profile — the
  * third compressed image format this engine decodes for real in pure
  * JVM code, and the first with a full transform-coding pipeline:
  *
  *  - marker segment walk (SOI / DQT / DHT / SOF0 / SOS / EOI, APPn
  *    and COM skipped by length);
  *  - CANONICAL HUFFMAN DECODE driven entirely by the DHT tables read
  *    from the file (mincode/maxcode/valptr per code length — the
  *    Annex C construction), with 0xFF00 byte unstuffing;
  *  - DC prediction + category/extend sign decoding, AC run-length /
  *    ZRL / EOB decoding through the zigzag order;
  *  - dequantization from the file's DQT and a real 2-D IDCT
  *    (separable cosine basis), level shift, clamp;
  *  - per-image statistics accumulated during the pixel walk (full +
  *    strided sums in one pass, like the other codecs).
  *
  * The encoder is the matching real pipeline (FDCT → quantize →
  * zigzag → run-length → canonical Huffman with tables carried in
  * DHT), so spec round-trips exercise lossy transform coding on real
  * signals. The decoder is TABLE-GENERAL: it decodes any 8-bit
  * baseline non-interleaved grayscale JPEG regardless of which
  * quantization/Huffman tables produced it. Out of profile (color,
  * progressive, restart intervals, 12-bit) → Iterator.empty — an
  * unsupported image skips, never aborts the job.
  *
  * Exactness note for oracles: a block that is CONSTANT has all-zero
  * AC coefficients, and with a DC quantization step of 8 the DC path
  * `round(8·(v−128)/8) · 8 / 8` is lossless, so constant-block images
  * survive the full lossy pipeline bit-exactly — which is what lets a
  * SQL oracle re-derive the decoded sums analytically while the engine
  * runs the complete Huffman+IDCT machinery.
  *
  * Ref: ITU-T T.81 Annex C (canonical tables), F.2 (decoding); the
  * reference ingests images as opaque payloads + metadata. */
object Jpeg {

  /** Per-image statistics over the decoded (grayscale) raster. */
  final case class JpegStats(media_id: Long, width: Int, height: Int,
    n_blocks: Int, sum_y: Long, s_sum_y: Long)

  // ---- shared DCT basis --------------------------------------------------

  /** coef(u)(x) = C(u)·cos((2x+1)uπ/16)/2, so both transforms are
    * plain double dot products over the same orthonormal basis. */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0) / 2.0
  }

  /** JPEG zigzag order: Zigzag(k) = raster index of the k-th coefficient. */
  private val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var (k, x, y, up) = (0, 0, 0, true)
    while (k < 64) {
      out(k) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      k += 1
    }
    out
  }

  // ---- Huffman tables (canonical, carried in DHT) ------------------------

  /** A canonical table as JPEG carries it: `bits(l)` = number of codes
    * of length l+1 (l = 0..15), `vals` = symbols in code order. */
  private final case class HuffSpec(bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 16 && bits.sum == vals.length)
  }

  /** Build a canonical spec from (symbol → code length). */
  private def canonical(lengths: Seq[(Int, Int)]): HuffSpec = {
    val sorted = lengths.sortBy { case (sym, len) => (len, sym) }
    val bits = new Array[Int](16)
    sorted.foreach { case (_, len) => bits(len - 1) += 1 }
    // Kraft inequality keeps the table decodable; strict < 1 also keeps
    // the reserved all-ones code unused
    val kraft = sorted.map { case (_, len) => math.pow(2.0, -len) }.sum
    require(kraft < 1.0, s"Huffman lengths overflow Kraft: $kraft")
    HuffSpec(bits, sorted.map(_._1).toArray)
  }

  /** Standard luminance DC table (T.81 Annex K.3.1): categories 0-11. */
  private val DcSpec: HuffSpec = HuffSpec(
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))

  /** AC table covering every (run, size) symbol plus EOB/ZRL, with
    * frequency-shaped lengths (short codes for low-run small-size). */
  private val AcSpec: HuffSpec = canonical(
    (0x00, 4) +: (0xf0, 11) +: (for {
      run <- 0 to 15
      size <- 1 to 10
    } yield ((run << 4) | size, math.min(16, 3 + size + run))))

  /** Encoder-side code assignment: symbol → (code, length). */
  private def encodeTable(spec: HuffSpec): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < spec.bits(l - 1)) {
        out += spec.vals(vi) -> (code, l)
        code += 1; vi += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  /** Decoder-side canonical tables (T.81 F.2.2.3): per length l,
    * mincode/maxcode and the index of its first symbol. */
  private final class HuffDecoder(spec: HuffSpec) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var vi = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = vi
        minCode(l) = code
        code += spec.bits(l - 1); vi += spec.bits(l - 1)
        maxCode(l) = code - 1
        if (spec.bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return spec.vals(valPtr(l) + code - minCode(l))
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1 // no 17-bit codes exist: corrupt stream
    }
  }

  // ---- bit I/O with JPEG byte stuffing -----------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val b = ((acc >>> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (n > 0) { // pad with 1s per the spec
        val b = (((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00)
        n = 0
      }
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var acc = 0
    private var n = 0
    /** Next bit, or -1 at the end of entropy data (a marker or EOF). */
    def bit(): Int = {
      if (n == 0) {
        if (pos >= end) return -1
        val b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= end) return -1
          val m = data(pos) & 0xff
          if (m != 0x00) return -1 // a real marker terminates the scan
          pos += 1
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) {
        val b = bit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
  }

  /** JPEG magnitude category of a coefficient value. */
  private def category(v: Int): Int = {
    var (a, c) = (math.abs(v), 0)
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** T.81 F.12 EXTEND: reconstruct a signed value from `size` bits. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  // ---- encoder -----------------------------------------------------------

  /** Quantization table in RASTER order; `qDc` is the DC step —
    * 8 makes constant blocks lossless (see the object scaladoc). The
    * AC steps are a standard-shaped ramp. */
  def quantTable(qDc: Int): Array[Int] = {
    val qt = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val (x, y) = (i % 8, i / 8)
      qt(i) = if (i == 0) qDc else math.min(255, 10 + 2 * (x + y))
      i += 1
    }
    qt
  }

  /** Serialize an 8-bit baseline grayscale JPEG of `pixel(x, y)`
    * (values 0-255). Dimensions need not be block-aligned — edge
    * blocks replicate the border pixel. */
  def build(width: Int, height: Int, pixel: (Int, Int) => Int,
      qDc: Int = 8): Array[Byte] = {
    val qt = quantTable(qDc)
    val dcEnc = encodeTable(DcSpec)
    val acEnc = encodeTable(AcSpec)
    val bw = new BitWriter
    val (bx, by) = ((width + 7) / 8, (height + 7) / 8)
    val f = new Array[Double](64)
    val coef = new Array[Int](64)
    var pred = 0
    var byi = 0
    while (byi < by) {
      var bxi = 0
      while (bxi < bx) {
        // level-shifted source block, border-replicated
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sx = math.min(width - 1, bxi * 8 + x)
            val sy = math.min(height - 1, byi * 8 + y)
            f(y * 8 + x) = (pixel(sx, sy) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        // FDCT + quantize (raster order)
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                s += f(yy * 8 + xx) * Basis(u)(xx) * Basis(v)(yy)
                xx += 1
              }
              yy += 1
            }
            val i = v * 8 + u
            coef(i) = math.round(s / qt(i)).toInt
            v += 1
          }
          u += 1
        }
        // DC: predicted difference, category + extra bits
        val diff = coef(0) - pred
        pred = coef(0)
        val cat = category(diff)
        val (dcode, dlen) = dcEnc(cat)
        bw.put(dcode, dlen)
        if (cat > 0)
          bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
        // AC: zigzag run-length with ZRL and EOB
        var run = 0
        var k = 1
        while (k < 64) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { val (c, l) = acEnc(0xf0); bw.put(c, l); run -= 16 }
            val size = category(v)
            val (c, l) = acEnc((run << 4) | size)
            bw.put(c, l)
            bw.put(if (v < 0) v + (1 << size) - 1 else v, size)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = acEnc(0x00); bw.put(c, l) }
        bxi += 1
      }
      byi += 1
    }
    val entropy = bw.finish()
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    seg(0xdb, 0 +: Zigzag.map(qt)) // DQT table 0, zigzag order
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0)) // SOF0: 8-bit, 1 component, 1x1 sampling, qt 0
    seg(0xc4, 0x00 +: (DcSpec.bits ++ DcSpec.vals)) // DHT DC 0
    seg(0xc4, 0x10 +: (AcSpec.bits ++ AcSpec.vals)) // DHT AC 0
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    out.write(entropy, 0, entropy.length)
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder -----------------------------------------------------------

  /** Decode one baseline grayscale JPEG into a raster, or null when the
    * payload is out of profile, corrupt, or truncated. */
  private[ext] def decodeRaster(p: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return null
    def be16(o: Int) = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
    val qts = new java.util.HashMap[Int, Array[Int]]
    val dcs = new java.util.HashMap[Int, HuffDecoder]
    val acs = new java.util.HashMap[Int, HuffDecoder]
    var (w, h, qtId) = (-1, -1, -1)
    var o = 2
    var scanStart = -1
    var (dcId, acId) = (-1, -1)
    while (scanStart < 0) {
      if (o + 4 > p.length || (p(o) & 0xff) != 0xff) return null
      val m = p(o + 1) & 0xff
      val len = be16(o + 2)
      if (o + 2 + len > p.length) return null
      m match {
        case 0xdb => // DQT: one or more tables, 8-bit precision only
          var q = o + 4
          while (q < o + 2 + len) {
            val pq = (p(q) & 0xff) >> 4
            val id = p(q) & 0x0f
            if (pq != 0 || q + 65 > o + 2 + len) return null
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = p(q + 1 + k) & 0xff; k += 1 }
            qts.put(id, t)
            q += 65
          }
        case 0xc4 => // DHT: one or more tables
          var q = o + 4
          while (q < o + 2 + len) {
            val cls = (p(q) & 0xff) >> 4
            val id = p(q) & 0x0f
            if (q + 17 > o + 2 + len) return null
            val bits = Array.tabulate(16)(i => p(q + 1 + i) & 0xff)
            val n = bits.sum
            if (q + 17 + n > o + 2 + len) return null
            val vals = Array.tabulate(n)(i => p(q + 17 + i) & 0xff)
            val dec = new HuffDecoder(HuffSpec(bits, vals))
            if (cls == 0) dcs.put(id, dec) else acs.put(id, dec)
            q += 17 + n
          }
        case 0xc0 => // SOF0 baseline; 8-bit single-component profile
          if ((p(o + 4) & 0xff) != 8 || (p(o + 9) & 0xff) != 1) return null
          h = be16(o + 5); w = be16(o + 7)
          qtId = p(o + 12) & 0xff
        case 0xda => // SOS
          if ((p(o + 4) & 0xff) != 1) return null
          dcId = (p(o + 6) & 0xff) >> 4
          acId = p(o + 6) & 0x0f
          scanStart = o + 2 + len
        case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 =>
          return null // progressive/extended/arithmetic: out of profile
        case 0xdd => return null // restart intervals: out of profile
        case _ => () // APPn / COM / others: skip by length
      }
      o += 2 + len
    }
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) return null
    val qt = qts.get(qtId)
    val dc = dcs.get(dcId)
    val ac = acs.get(acId)
    if (qt == null || dc == null || ac == null) return null
    val br = new BitReader(p, scanStart, p.length)
    val (bx, by) = ((w + 7) / 8, (h + 7) / 8)
    val raster = new Array[Byte](w * h)
    val coef = new Array[Int](64)
    var pred = 0
    var byi = 0
    while (byi < by) {
      var bxi = 0
      while (bxi < bx) {
        java.util.Arrays.fill(coef, 0)
        val cat = dc.decode(br)
        if (cat < 0 || cat > 11) return null
        val diffBits = br.bits(cat)
        if (diffBits == Int.MinValue) return null
        pred += extend(diffBits, cat)
        coef(0) = pred * qt(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val sym = ac.decode(br)
          if (sym < 0) return null
          if (sym == 0x00) eob = true
          else if (sym == 0xf0) k += 16
          else {
            val (run, size) = (sym >> 4, sym & 0x0f)
            k += run
            if (k > 63 || size == 0) return null
            val bitsV = br.bits(size)
            if (bitsV == Int.MinValue) return null
            coef(Zigzag(k)) = extend(bitsV, size) * qt(Zigzag(k))
            k += 1
          }
        }
        // IDCT + level shift + clamp, writing the visible pixels
        var y = 0
        while (y < 8) {
          val py = byi * 8 + y
          var x = 0
          while (x < 8) {
            val px = bxi * 8 + x
            if (px < w && py < h) {
              var s = 0.0
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  val cuv = coef(v * 8 + u)
                  if (cuv != 0) s += cuv * Basis(u)(x) * Basis(v)(y)
                  v += 1
                }
                u += 1
              }
              val g = math.round(s).toInt + 128
              raster(py * w + px) =
                (if (g < 0) 0 else if (g > 255) 255 else g).toByte
            }
            x += 1
          }
          y += 1
        }
        bxi += 1
      }
      byi += 1
    }
    (w, h, raster)
  }

  /** Decode one JPEG's statistics; Iterator.empty out of profile. */
  def stats(item: MediaItem, stride: Int): Iterator[JpegStats] = {
    val dec = decodeRaster(item.payload)
    if (dec == null) return Iterator.empty
    val (w, h, raster) = dec
    var (sy, ssy) = (0L, 0L)
    var y = 0
    while (y < h) {
      val keepRow = y % stride == 0
      var x = 0
      while (x < w) {
        val g = raster(y * w + x) & 0xff
        sy += g
        if (keepRow && x % stride == 0) ssy += g
        x += 1
      }
      y += 1
    }
    Iterator.single(JpegStats(item.media_id, w, h,
      ((w + 7) / 8) * ((h + 7) / 8), sy, ssy))
  }

  /** Distributed transform decode: decoder state per PARTITION. */
  def decodeStats(media: Dataset[MediaItem], stride: Int): Dataset[JpegStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (once, not per row)
      it.flatMap(stats(_, stride))
    }
  }
}

/** REAL video: Motion-JPEG in a REAL AVI (RIFF) container — the video
  * plane's honest upgrade from the GVID stand-in: the container is the
  * actual AVI layout (RIFF/AVI LIST tree: hdrl → avih + strl/strh/strf
  * BITMAPINFOHEADER, movi → one `00dc` chunk per frame, word-aligned)
  * and every frame payload is a complete baseline JPEG decoded by the
  * real [[Jpeg]] transform pipeline. MJPEG is what DV cameras and
  * capture cards actually emit, so this is a decodable-today format,
  * not a toy.
  *
  * The demux walk honors the sampling stride DURING the chunk walk:
  * unsampled frames are SKIPPED — never entropy-decoded, never copied
  * (the per-frame JPEG decode is ~1000× the cost of the chunk-header
  * hop, so stride-8 sampling cuts ~8× of the work, which is the whole
  * point of demux-time sampling at 100 TB). Corrupt containers and
  * frames skip, never abort. */
object Mjpeg {

  /** One demuxed + decoded (sampled) frame. */
  final case class MjpegFrame(media_id: Long, frame_idx: Int, n_frames: Int,
    width: Int, height: Int, pts_micros: Long, sum_y: Long)

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Serialize an AVI/MJPEG video: `frame(f)` returns the JPEG payload
    * of frame f (encode with [[Jpeg.build]]). */
  def build(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(fcc(id)).putInt(body.length).put(body)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(kind) ++ body)
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height)
      .array() // + 16 reserved zero bytes already in the buffer
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(fcc("vids")).put(fcc("MJPG"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(usPerFrame).putInt(1000000) // scale/rate: fps = rate/scale
      .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      .array()
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .put(fcc("MJPG")).putInt(width * height * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    chunk("RIFF", fcc("AVI ") ++ hdrl ++ movi)
  }

  /** Demux + decode the sampled frames (every `stride`-th): the walk
    * hops chunk headers and only sampled `00dc` payloads reach the
    * JPEG decoder. Non-AVI / truncated payloads yield nothing; a frame
    * that fails to decode is skipped, the rest of the video survives. */
  def parse(item: MediaItem, stride: Int): Iterator[MjpegFrame] =
    parseFrames(item, stride) { (fi, nf, w, h, pts, raster) =>
      var s = 0L
      var i = 0
      while (i < raster.length) { s += raster(i) & 0xff; i += 1 }
      MjpegFrame(item.media_id, fi, nf, w, h, pts, s)
    }

  /** The demux walk with a caller-supplied frame consumer:
    * `emit(frameIdx, nFrames, width, height, ptsMicros, raster)` runs
    * on each SAMPLED, successfully decoded frame — the shared walk
    * behind [[parse]] (sum stats) and [[Phash.videoFrameHashes]]
    * (per-frame perceptual hashes). Lazy: skipped frames are hopped by
    * chunk header, never decoded. */
  def parseFrames[T](item: MediaItem, stride: Int)(
      emit: (Int, Int, Int, Int, Long, Array[Byte]) => T): Iterator[T] = {
    val p = item.payload
    def le32(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(p, o, 4, "US-ASCII")
    if (p.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ")
      return Iterator.empty
    val riffEnd = math.min(p.length.toLong, 8L + le32(4)).toInt
    // top-level LIST walk: find avih (for usPerFrame/n_frames) and movi
    var (o, usPerFrame, nFrames, moviOff, moviEnd) = (12, -1, -1, -1, -1)
    while (o + 8 <= riffEnd && moviOff < 0) {
      val (id, len) = (tag(o), le32(o + 4))
      if (len < 0 || o + 8 + len > riffEnd) return Iterator.empty
      if (id == "LIST" && len >= 4) {
        val kind = tag(o + 8)
        if (kind == "movi") { moviOff = o + 12; moviEnd = o + 8 + len }
        else if (kind == "hdrl") {
          // one level down: avih sits first in hdrl
          var q = o + 12
          var walking = true
          while (walking && q + 8 <= o + 8 + len && usPerFrame < 0) {
            val l = le32(q + 4)
            if (l < 0) walking = false // crafted length: never walk back
            else {
              if (tag(q) == "avih" && l >= 24) {
                usPerFrame = le32(q + 8)
                nFrames = le32(q + 8 + 16)
              }
              q += 8 + l + (l & 1)
            }
          }
        }
      }
      o += 8 + len + (len & 1)
    }
    if (moviOff < 0 || usPerFrame <= 0 || nFrames < 0) return Iterator.empty
    val step = math.max(1, stride)
    val (mo, me, us, nf) = (moviOff, moviEnd, usPerFrame, nFrames)
    new Iterator[T] {
      private var off = mo
      private var idx = 0
      private var nextFrame: Option[T] = advance()
      private def advance(): Option[T] = {
        while (off + 8 <= me) {
          val len = le32(off + 4)
          if (len < 0 || off + 8 + len > me) return None
          val (id, start) = (tag(off), off + 8)
          val fi = idx
          off += 8 + len + (len & 1)
          if (id == "00dc") {
            idx += 1
            if (fi % step == 0) {
              // only sampled frames pay the transform decode
              val dec = Jpeg.decodeRaster(
                java.util.Arrays.copyOfRange(p, start, start + len))
              if (dec != null) {
                val (w, h, raster) = dec
                return Some(emit(fi, nf, w, h, fi.toLong * us, raster))
              } // undecodable frame: skip it, keep demuxing
            }
          }
        }
        None
      }
      def hasNext: Boolean = nextFrame.isDefined
      def next(): T = {
        val f = nextFrame.get; nextFrame = advance(); f
      }
    }
  }

  /** Distributed demux+decode: one row per sampled frame, decoder
    * state per PARTITION, stride applied during the chunk walk. */
  def explodeFrames(media: Dataset[MediaItem], stride: Int): Dataset[MjpegFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition demuxer/decoder init would go here (once, not per row)
      it.flatMap(parse(_, stride))
    }
  }
}
