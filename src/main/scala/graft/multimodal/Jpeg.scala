package graft.multimodal

/** Pure-JVM baseline JPEG codec (ITU T.81 sequential DCT): 8-bit
  * grayscale or interleaved YCbCr color (JFIF matrix) with 4:4:4,
  * 4:2:2 and 4:2:0 subsampling, one scan, and DRI/RSTn restart
  * intervals. Progressive (SOF2) files return None (callers fall
  * back to the header probe + stub), which keeps every shipped claim
  * honest: what decodes, decodes for real — markers, canonical Huffman
  * tables, per-component differential DC, AC run-length, zigzag,
  * dequantization and the full 2-D IDCT.
  *
  * The IDCT here is the textbook direct form (O(64²) per block) — correct
  * first; a production build swaps in the separable/AAN fast path without
  * touching anything else in this file.
  */
object Jpeg {

  /** zigzag index -> natural (row-major) position, T.81 Figure A.6. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table (T.81 Annex C): 16 length counts + symbols
    * in code order.
    */
  private final class HuffTable(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def symbol(length: Int, code: Int): Int =
      symbols(valPtr(length) + code - minCode(length))
  }

  /** MSB-first entropy-coded-segment reader with 0xFF00 unstuffing. */
  private final class BitReader(d: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var bad = false
    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= d.length) { bad = true; return 0 }
        var b = d(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= d.length) { bad = true; return 0 }
          val m = d(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed literal FF
          else { bad = true; return 0 } // a real marker: scan ended early
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) &&
            code >= t.minCode(l))
          return t.symbol(l, code)
        code = (code << 1) | nextBit()
        l += 1
      }
      bad = true; 0
    }
    /** Byte-align and consume the next restart marker, scanning past pad
      * bytes (incl. a stuffed FF00 the 1-bit padding can produce).
      * Returns the marker's low nibble (0-7), or -1 on anything else.
      */
    def restartMarker(): Int = {
      nBits = 0 // discard pad bits
      while (pos + 1 < d.length) {
        val b = d(pos) & 0xff
        if (b != 0xff) { pos += 1 } // pad byte
        else {
          val m = d(pos + 1) & 0xff
          if (m == 0x00) pos += 2 // stuffed FF pad
          else if (m >= 0xd0 && m <= 0xd7) { pos += 2; return m - 0xd0 }
          else return -1
        }
      }
      -1
    }
  }

  /** T.81 F.2.2.1 EXTEND: map the s received bits to the signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline grayscale JPEG to `(width, height, pixels)`. */
  def decodeGray(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decode(p).collect { case (w, h, 1, px) => (w, h, px) }

  /** Decode a baseline JPEG to `(width, height, channels, pixels)` —
    * grayscale (1 ch) or interleaved YCbCr color (3 ch, converted to RGB
    * with the JFIF matrix). Sampling factors 1 and 2 are supported per
    * component, which covers the layouts that exist in practice — 4:4:4,
    * 4:2:0 (the dominant one: luma 2x2, chroma 1x1 per MCU) and 4:2:2 —
    * with chroma upsampled by sample replication. Restart intervals
    * (DRI/RSTn) are consumed with per-marker DC reset. Progressive
    * (SOF2) files return None.
    */
  def decode(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    def u8(i: Int) = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var w = 0; var h = 0; var ncomp = 0
    var compQ: Array[Int] = null  // per-component quant selector
    var compH: Array[Int] = null  // per-component sampling factors
    var compV: Array[Int] = null
    var compId: Array[Int] = null // per-component id (SOF order)
    var scanDc: Array[Int] = null // per-component table ids (SOF order)
    var scanAc: Array[Int] = null
    var scanStart = -1
    var restartInterval = 0
    while (scanStart < 0) {
      if (i + 4 > p.length || u8(i) != 0xff) return None
      val m = u8(i + 1)
      val len = be16(i + 2)
      if (len < 2 || i + 2 + len > p.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      m match {
        case 0xdb => // DQT: one or more tables
          var j = seg
          while (j < segEnd) {
            val pq = u8(j) >> 4; val tq = u8(j) & 15
            if (pq != 0 || tq > 3 || j + 65 > segEnd) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigZag(k)) = u8(j + 1 + k); k += 1 }
            qt(tq) = t
            j += 65
          }
        case 0xc4 => // DHT: one or more tables
          var j = seg
          while (j < segEnd) {
            if (j + 17 > segEnd) return None
            val tc = u8(j) >> 4; val th = u8(j) & 15
            if (tc > 1 || th > 3) return None
            val counts = Array.tabulate(16)(k => u8(j + 1 + k))
            val n = counts.sum
            if (n == 0 || n > 256 || j + 17 + n > segEnd) return None
            val syms = Array.tabulate(n)(k => u8(j + 17 + k))
            val t = new HuffTable(counts, syms)
            if (tc == 0) dcT(th) = t else acT(th) = t
            j += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (seg + 6 > segEnd) return None // truncated frame header
          if (u8(seg) != 8) return None // precision
          h = be16(seg + 1); w = be16(seg + 3)
          ncomp = u8(seg + 5)
          if (ncomp != 1 && ncomp != 3) return None
          if (seg + 6 + 3 * ncomp > segEnd) return None
          compId = new Array[Int](ncomp); compQ = new Array[Int](ncomp)
          compH = new Array[Int](ncomp); compV = new Array[Int](ncomp)
          for (c <- 0 until ncomp) {
            compId(c) = u8(seg + 6 + 3 * c)
            compH(c) = u8(seg + 7 + 3 * c) >> 4
            compV(c) = u8(seg + 7 + 3 * c) & 15
            if (compH(c) < 1 || compH(c) > 2 ||
                compV(c) < 1 || compV(c) > 2) return None
            compQ(c) = u8(seg + 8 + 3 * c)
          }
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          return None // non-baseline frame types: out of scope
        case 0xdd => // DRI: restart every n MCUs
          if (len != 4) return None
          restartInterval = be16(seg)
        case 0xda => // SOS
          if (seg + 1 > segEnd) return None // truncated scan header
          if (ncomp == 0 || u8(seg) != ncomp) return None
          // component selectors + Ss/Se/Ah-Al must fit the segment
          if (seg + 1 + 2 * ncomp + 3 > segEnd) return None
          scanDc = new Array[Int](ncomp); scanAc = new Array[Int](ncomp)
          for (c <- 0 until ncomp) {
            val sel = u8(seg + 1 + 2 * c)
            val sofIdx = compId.indexOf(sel)
            if (sofIdx < 0) return None
            scanDc(sofIdx) = u8(seg + 2 + 2 * c) >> 4
            scanAc(sofIdx) = u8(seg + 2 + 2 * c) & 15
          }
          scanStart = segEnd
        case _ => () // APPn/COM/etc: skip
      }
      i = segEnd
    }
    if (w == 0) return None
    for (c <- 0 until ncomp)
      if (qt(compQ(c)) == null || dcT(scanDc(c)) == null ||
          acT(scanAc(c)) == null) return None
    val hmax = compH.max; val vmax = compV.max
    val mcuW = (w + 8 * hmax - 1) / (8 * hmax)
    val mcuH = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component plane dims (A.1.1: ceil(dim * sampling / max))
    val pw = Array.tabulate(ncomp)(c => (w * compH(c) + hmax - 1) / hmax)
    val ph = Array.tabulate(ncomp)(c => (h * compV(c) + vmax - 1) / vmax)
    val planes = Array.tabulate(ncomp)(c => new Array[Byte](pw(c) * ph(c)))
    val r = new BitReader(p, scanStart)
    val coef = new Array[Int](64)
    val pred = new Array[Int](ncomp)
    var mcuDone = 0
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        // restart boundary: byte-align, consume RSTn (cycling 0-7),
        // reset every DC predictor (T.81 F.2.1.3.1)
        if (restartInterval > 0 && mcuDone > 0 &&
            mcuDone % restartInterval == 0) {
          val m = r.restartMarker()
          if (m != (mcuDone / restartInterval - 1) % 8) return None
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < ncomp) { // interleaved MCU: hi x vi blocks per comp
          val q = qt(compQ(c))
          var v = 0
          while (v < compV(c)) {
            var u = 0
            while (u < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              // DC: category + extend bits, differential per component
              val t = r.decode(dcT(scanDc(c)))
              if (t > 11 || r.bad) return None
              pred(c) += extend(r.receive(t), t)
              coef(0) = pred(c) * q(0)
              // AC: run-length of zigzag coefficients
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = r.decode(acT(scanAc(c)))
                if (r.bad) return None
                val run = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += run
                  if (k > 63) return None
                  coef(ZigZag(k)) = extend(r.receive(s), s) * q(ZigZag(k))
                  k += 1
                }
              }
              if (r.bad) return None
              idctBlock(coef, planes(c), pw(c), ph(c),
                (mx * compH(c) + u) * 8, (my * compV(c) + v) * 8)
              u += 1
            }
            v += 1
          }
          c += 1
        }
        mcuDone += 1
        mx += 1
      }
      my += 1
    }
    if (ncomp == 1) Some((w, h, 1, planes(0)))
    else {
      // JFIF YCbCr -> RGB, rounded and clamped; subsampled chroma is
      // upsampled by sample replication (x*hi/hmax maps 1:1 when the
      // component is full-resolution)
      val out = new Array[Byte](w * h * 3)
      def clamp(v: Long): Byte =
        (if (v < 0) 0 else if (v > 255) 255 else v.toInt).toByte
      def sample(c: Int, x: Int, y: Int): Int =
        planes(c)((y * compV(c) / vmax) * pw(c) + x * compH(c) / hmax) & 0xff
      var y0 = 0
      while (y0 < h) {
        var x0 = 0
        while (x0 < w) {
          val k = y0 * w + x0
          val y = sample(0, x0, y0)
          val cb = sample(1, x0, y0) - 128
          val cr = sample(2, x0, y0) - 128
          out(k * 3) = clamp(math.round(y + 1.402 * cr))
          out(k * 3 + 1) =
            clamp(math.round(y - 0.344136 * cb - 0.714136 * cr))
          out(k * 3 + 2) = clamp(math.round(y + 1.772 * cb))
          x0 += 1
        }
        y0 += 1
      }
      Some((w, h, 3, out))
    }
  }

  /** Direct 2-D type-III DCT (T.81 A.3.3) + level shift + clamp, written
    * into the image at (ox, oy) with edge clipping.
    */
  private def idctBlock(coef: Array[Int], out: Array[Byte], w: Int,
      h: Int, ox: Int, oy: Int): Unit = {
    var y = 0
    while (y < 8 && oy + y < h) {
      var x = 0
      while (x < 8 && ox + x < w) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) 0.7071067811865476 else 1.0
              val cv = if (v == 0) 0.7071067811865476 else 1.0
              sum += cu * cv * c *
                math.cos((2 * x + 1) * u * math.Pi / 16) *
                math.cos((2 * y + 1) * v * math.Pi / 16)
            }
            u += 1
          }
          v += 1
        }
        val s = math.round(sum / 4).toInt + 128
        out((oy + y) * w + ox + x) =
          (if (s < 0) 0 else if (s > 255) 255 else s).toByte
        x += 1
      }
      y += 1
    }
  }

  // ---- encoder (for planting known content in tests/oracles) -----------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, length: Int): Unit = {
      var l = length - 1
      while (l >= 0) {
        acc = (acc << 1) | ((code >> l) & 1); nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // stuffing
          acc = 0; nBits = 0
        }
        l -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (nBits > 0) { put(0x7f, 8 - nBits) } // pad bits (1s per spec)
    def restart(m: Int): Unit = {
      flushWithOnes(); out.write(0xff); out.write(0xd0 + m)
    }
  }

  // simple valid custom tables: DC = 12 categories as 4-bit codes;
  // AC = {EOB, 0x01, 0x11, 0xF0} as 3-bit codes
  private val DcCounts =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcSyms = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcCounts =
    Array(0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcSyms = Array(0x00, 0x01, 0x11, 0xf0)

  private def huffCodes(counts: Array[Int],
      syms: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (l <- 1 to 16) {
      for (_ <- 0 until counts(l - 1)) {
        m(syms(k)) = (code, l); k += 1; code += 1
      }
      code <<= 1
    }
    m.toMap
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode an 8-bit grayscale image as a real baseline JPEG (see
    * [[encodeBaseline]]).
    */
  private[graft] def encodeGray(w: Int, h: Int, quant: Int,
      blocks: (Int, Int) => Array[Int]): Array[Byte] =
    encodeBaseline(w, h, quant, 1, (_, bx, by) => blocks(bx, by))

  /** Encode a real baseline JPEG with `ncomp` components (1 = grayscale,
    * 3 = interleaved YCbCr 4:4:4). `blocks(comp, bx, by)` supplies each
    * 8x8 block's coefficient array in NATURAL order, PRE-quantization
    * (the encoder divides by the quant table, so planted values should
    * be multiples of it for exactness). The quant table is flat `quant`
    * everywhere; all components share the same Huffman tables (legal,
    * and what the simple planting needs).
    */
  private[graft] def encodeBaseline(w: Int, h: Int, quant: Int,
      ncomp: Int, blocks: (Int, Int, Int) => Array[Int],
      subsample420: Boolean = false,
      restartInterval: Int = 0): Array[Byte] = {
    require(ncomp == 1 || ncomp == 3, "1 or 3 components")
    require(!subsample420 || ncomp == 3, "4:2:0 needs color")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xdb); be16(2 + 65); out.write(0) // DQT, table 0
    for (_ <- 0 until 64) out.write(quant)
    marker(0xc0); be16(8 + 3 * ncomp); out.write(8) // SOF0
    be16(h); be16(w); out.write(ncomp)
    for (c <- 1 to ncomp) {
      out.write(c)
      out.write(if (subsample420 && c == 1) 0x22 else 0x11)
      out.write(0) // qtable 0
    }
    def dht(tc: Int, counts: Array[Int], syms: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 17 + syms.length); out.write(tc << 4)
      counts.foreach(out.write); syms.foreach(out.write)
    }
    dht(0, DcCounts, DcSyms)
    dht(1, AcCounts, AcSyms)
    if (restartInterval > 0) { // DRI
      marker(0xdd); be16(4); be16(restartInterval)
    }
    marker(0xda); be16(6 + 2 * ncomp); out.write(ncomp) // SOS
    for (c <- 1 to ncomp) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0) // spectral selection
    val dcCodes = huffCodes(DcCounts, DcSyms)
    val acCodes = huffCodes(AcCounts, AcSyms)
    val bits = new BitWriter(out)
    // one MCU = one block per comp (4:4:4) or 4 luma + 2 chroma (4:2:0);
    // the flat list below enumerates (comp, plane-bx, plane-by) in the
    // exact interleave order the decoder consumes
    val mcuSpan = if (subsample420) 16 else 8
    val mw = (w + mcuSpan - 1) / mcuSpan
    val mh = (h + mcuSpan - 1) / mcuSpan
    val mcus: Seq[Seq[(Int, Int, Int)]] = for {
      my <- 0 until mh
      mx <- 0 until mw
    } yield for {
      comp <- 0 until ncomp
      v <- 0 until (if (subsample420 && comp == 0) 2 else 1)
      u <- 0 until (if (subsample420 && comp == 0) 2 else 1)
    } yield {
      if (subsample420 && comp == 0) (comp, mx * 2 + u, my * 2 + v)
      else (comp, mx, my)
    }
    val pred = new Array[Int](ncomp)
    val flatOrder = mcus.zipWithIndex.flatMap { case (mcu, m) =>
      // restart boundary marker interleaved as a pseudo-block
      if (restartInterval > 0 && m > 0 && m % restartInterval == 0)
        Seq((-1, (m / restartInterval - 1) % 8, 0)) ++ mcu
      else mcu
    }
    for ((comp, bx, by) <- flatOrder) {
      if (comp == -1) {
        bits.restart(bx)
        java.util.Arrays.fill(pred, 0)
      } else {
      val c = blocks(comp, bx, by)
      require(c.length == 64, "64 natural-order coefficients per block")
      val dcQ = {
        require(c(0) % quant == 0, "plant DC as a multiple of quant")
        c(0) / quant
      }
      val diff = dcQ - pred(comp)
      pred(comp) = dcQ
      val s = category(diff)
      require(s <= 11, "DC category out of range")
      val (code, len) = dcCodes(s)
      bits.put(code, len)
      if (s > 0)
        bits.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC: only the patterns our table can express — zigzag index 1
      // (symbol 0x01) or nothing; everything else must be 0
      var k = 1
      if (c(ZigZag(1)) != 0) {
        require(c(ZigZag(1)) % quant == 0, "plant AC as quant multiple")
        val v = c(ZigZag(1)) / quant
        val sa = category(v)
        require(sa == 1, "encoder AC table covers size-1 coefficients")
        val (ac1, al1) = acCodes(0x01)
        bits.put(ac1, al1)
        bits.put(if (v < 0) v + (1 << sa) - 1 else v, sa)
        k = 2
      }
      var j = k
      while (j < 64) {
        require(c(ZigZag(j)) == 0,
          "planting encoder only expresses DC + first zigzag AC")
        j += 1
      }
      val (eob, el) = acCodes(0x00)
      bits.put(eob, el)
      }
    }
    bits.flushWithOnes()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
