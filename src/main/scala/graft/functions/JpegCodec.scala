package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Hand-rolled BASELINE SEQUENTIAL JPEG (ITU-T T.81) decoder — the
  * modality that dominates crawled images (BMP/PNG cover the
  * uncompressed and lossless-compressed tiers; JPEG is the lossy tier
  * every real crawl pipeline actually faces). Written against the
  * public spec in the same fail-closed discipline as
  * [[BmpCodec]]/[[PngCodec]]: marker walk (SOI → tables → SOF0 → SOS →
  * entropy → EOI), DQT/DHT table parse with canonical Huffman
  * construction, interleaved MCU entropy decode (DC prediction +
  * EXTEND, AC run/size with EOB/ZRL, FF00 byte-unstuffing, DRI/RSTn
  * restart intervals with predictor reset), dequantization in zigzag
  * order, separable floating IDCT, box-replication chroma upsampling
  * for subsampled scans (1×1..2×2 factors), and libjpeg-style
  * FIXED-POINT integer YCbCr→RGB (scaled 16-bit constants, +32768
  * rounding, arithmetic >>16) so the conversion is exactly mirrorable
  * in integer SQL. Null on ANY malformation — wrong magic, progressive
  * or non-baseline SOF, missing tables, truncated entropy stream,
  * trailing garbage — the strict NULL the dispatch tier uses as its
  * format sniffer.
  *
  * `jpeg_decode` returns the [[PngCodec]] feature shape: geometry +
  * channel sums + `px_hash`, the position-sensitive rolling hash over
  * the row-major RGB stream (breaks on any MCU-order, upsample, or
  * edge-clip mistake the order-invariant sums would miss).
  *
  * Scale shape: one decode per row inside whole-stage codegen — a
  * map-only projection, zero shuffle at 100 TB. The naive O(64·64)
  * per-block IDCT is the clarity-first choice; swapping in AAN is a
  * constant-factor change localized to [[idctBlock]].
  *
  * Reference cell: like the other codecs, nearest reference op is the
  * byte-chunk source (`/root/reference/src/Data/Conduino/
  * Combinators.hs:280-288`) — containers are chunked byte streams with
  * structure; everything else is Spark-first engineering.
  */
object JpegCodec {

  import PngCodec.Malformed

  val HashMod: Long = PngCodec.HashMod

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("px_hash", LongType, nullable = false)))

  // --- fixed-point YCbCr→RGB (libjpeg-style scaled-integer constants;
  //     SQL mirror: ((k*c + 32768) + 2^26) // 65536 - 1024 emulates the
  //     arithmetic shift, since SQL integer division truncates) ---

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  def ycc2r(y: Int, cr: Int): Int =
    clamp(y + ((91881 * (cr - 128) + 32768) >> 16))
  def ycc2g(y: Int, cb: Int, cr: Int): Int =
    clamp(y + ((-22554 * (cb - 128) - 46802 * (cr - 128) + 32768) >> 16))
  def ycc2b(y: Int, cb: Int): Int =
    clamp(y + ((116131 * (cb - 128) + 32768) >> 16))

  // --- canonical Huffman (T.81 Annex C) ---

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per length, the standard DECODE procedure
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
      if (k != vals.length) throw Malformed
    }
  }

  // --- entropy-coded segment reader: MSB-first bits with FF00
  //     unstuffing; markers are only legal at restart boundaries ---

  private final class EntropyReader(val a: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0

    def readBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= a.length) throw Malformed
        var b = a(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= a.length) throw Malformed
          val m = a(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed data byte
          else throw Malformed // marker inside entropy data
          b = 0xff
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def decode(t: HuffTable): Int = {
      var code = readBit()
      var l = 1
      while (code > t.maxCode(l)) {
        code = (code << 1) | readBit()
        l += 1
        if (l > 16) throw Malformed
      }
      t.values(t.valPtr(l) + code - t.minCode(l))
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      bitCnt = 0
      if (pos + 2 > a.length) throw Malformed
      if ((a(pos) & 0xff) != 0xff || (a(pos + 1) & 0xff) != (0xd0 + n)) throw Malformed
      pos += 2
    }

    def align(): Unit = { bitCnt = 0 }
  }

  /** T.81 EXTEND: map an S-bit amplitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // --- zigzag order (coef index → natural 8×8 position) ---

  private[functions] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16)
        u += 1
      }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Separable IDCT of one dequantized block (natural order) into
    * clamped level-shifted samples. DC-only blocks (every AC zero —
    * the EOB-immediately case that dominates smooth image regions and
    * is every real decoder's fast path) shortcut to the constant
    * DC/8 + 128 the full transform reproduces exactly.
    */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var acZero = true
    var ci = 1
    while (acZero && ci < 64) { acZero = coef(ci) == 0; ci += 1 }
    if (acZero) {
      val v = clamp(math.round(coef(0) / 8.0 + 128.0).toInt)
      java.util.Arrays.fill(out, v)
      return
    }
    // rows then columns, double precision
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * coef(y * 8 + u) * CosTable(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x2 = 0
    while (x2 < 8) {
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          s += cv * tmp(v * 8 + x2) * CosTable(y2 * 8 + v)
          v += 1
        }
        out(y2 * 8 + x2) = clamp(math.round(s / 2.0 + 128.0).toInt)
        y2 += 1
      }
      x2 += 1
    }
  }

  private final class Component {
    var id = 0
    var h = 0
    var v = 0
    var tq = 0
    var td = 0
    var ta = 0
    var pred = 0
    // padded plane: mcusX*h*8 wide, mcusY*v*8 tall
    var plane: Array[Int] = null
    var planeW = 0
  }

  /** Full decode → (width, height, per-pixel RGB visitor). Throws
    * [[PngCodec.Malformed]] on any malformation.
    */
  private def decodeInternal(a: Array[Byte], init: (Int, Int) => Unit = (_, _) => ())(
      visit: (Int, Int, Int, Int, Int) => Unit): (Int, Int) = {
    if (a == null || a.length < 4) throw Malformed
    if ((a(0) & 0xff) != 0xff || (a(1) & 0xff) != 0xd8) throw Malformed // SOI
    var pos = 2
    def u16(p: Int): Int = {
      if (p + 2 > a.length) throw Malformed
      ((a(p) & 0xff) << 8) | (a(p + 1) & 0xff)
    }
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var sawSOF = false
    var done = false
    var er: EntropyReader = null

    while (!done) {
      if (pos + 2 > a.length) throw Malformed
      if ((a(pos) & 0xff) != 0xff) throw Malformed
      val marker = a(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd8 => throw Malformed // second SOI
        case 0xd9 => throw Malformed // EOI before SOS
        case 0xc0 => // SOF0 baseline
          val len = u16(pos)
          if (sawSOF) throw Malformed
          sawSOF = true
          val p = pos + 2
          if ((a(p) & 0xff) != 8) throw Malformed // precision
          height = u16(p + 1)
          width = u16(p + 3)
          if (width == 0 || height == 0) throw Malformed
          // dimension-product cap (the PngCodec guard): a few-dozen-byte
          // crafted SOF0 would otherwise command multi-GB component
          // planes before the entropy decode can reject the stream —
          // and the dispatch tier feeds this decoder arbitrary payloads
          // as a sniffer
          if (width.toLong * height > (1L << 24)) throw Malformed
          val nc = a(p + 5) & 0xff
          if (nc != 1 && nc != 3) throw Malformed
          if (len != 8 + 3 * nc) throw Malformed
          comps = Array.fill(nc)(new Component)
          var i = 0
          while (i < nc) {
            val q = p + 6 + 3 * i
            comps(i).id = a(q) & 0xff
            comps(i).h = (a(q + 1) & 0xff) >> 4
            comps(i).v = a(q + 1) & 0x0f
            comps(i).tq = a(q + 2) & 0xff
            if (comps(i).h < 1 || comps(i).h > 2 ||
                comps(i).v < 1 || comps(i).v > 2 || comps(i).tq > 3) throw Malformed
            i += 1
          }
          pos += len
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          throw Malformed // non-baseline SOF: fail closed
        case 0xc4 => // DHT (possibly several tables)
          val len = u16(pos)
          var p = pos + 2
          val end = pos + len
          while (p < end) {
            val tc = (a(p) & 0xff) >> 4
            val th = a(p) & 0x0f
            if (tc > 1 || th > 3) throw Malformed
            val bits = new Array[Int](17)
            var total = 0
            var i = 0
            while (i < 16) {
              bits(i + 1) = a(p + 1 + i) & 0xff
              total += bits(i + 1)
              i += 1
            }
            if (p + 17 + total > end) throw Malformed
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = a(p + 17 + i) & 0xff; i += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + total
          }
          if (p != end) throw Malformed
          pos += len
        case 0xdb => // DQT (possibly several tables)
          val len = u16(pos)
          var p = pos + 2
          val end = pos + len
          while (p < end) {
            val pq = (a(p) & 0xff) >> 4
            val tq = a(p) & 0x0f
            if (pq > 1 || tq > 3) throw Malformed
            val n = if (pq == 0) 64 else 128
            if (p + 1 + n > end) throw Malformed
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) {
              q(i) = if (pq == 0) a(p + 1 + i) & 0xff
                     else ((a(p + 1 + 2 * i) & 0xff) << 8) | (a(p + 2 + 2 * i) & 0xff)
              if (q(i) == 0) throw Malformed
              i += 1
            }
            quant(tq) = q
            p += 1 + n
          }
          if (p != end) throw Malformed
          pos += len
        case 0xdd => // DRI
          if (u16(pos) != 4) throw Malformed
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xda => // SOS
          val len = u16(pos)
          if (!sawSOF) throw Malformed
          val p = pos + 2
          val ns = a(p) & 0xff
          if (ns != comps.length || len != 6 + 2 * ns) throw Malformed
          var i = 0
          while (i < ns) {
            val cid = a(p + 1 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(throw Malformed)
            c.td = (a(p + 2 + 2 * i) & 0xff) >> 4
            c.ta = a(p + 2 + 2 * i) & 0x0f
            i += 1
          }
          // Ss/Se/AhAl must be the baseline 0/63/0
          if ((a(p + 1 + 2 * ns) & 0xff) != 0 ||
              (a(p + 2 + 2 * ns) & 0xff) != 63 ||
              (a(p + 3 + 2 * ns) & 0xff) != 0) throw Malformed
          pos += len
          er = new EntropyReader(a, pos)
          done = true
        case m if m >= 0xe0 && m <= 0xef => pos += u16(pos) // APPn
        case 0xfe => pos += u16(pos) // COM
        case _ => throw Malformed
      }
    }

    // --- interleaved MCU decode ---
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.plane = new Array[Int](c.planeW * mcusY * c.v * 8)
      c.pred = 0
      if (quant(c.tq) == null) throw Malformed
      if (dcTabs(c.td) == null || acTabs(c.ta) == null) throw Malformed
    }
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var rstIdx = 0
    var sinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          er.restart(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          sinceRestart = 0
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.tq)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val s = er.decode(dcTabs(c.td))
              if (s > 11) throw Malformed
              val diff = extend(er.readBits(s), s)
              c.pred += diff
              coef(0) = c.pred * q(0)
              // AC
              var k = 1
              while (k < 64) {
                val rs = er.decode(acTabs(c.ta))
                val r = rs >> 4
                val sz = rs & 0x0f
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  if (k > 63) throw Malformed
                  coef(ZigZag(k)) = extend(er.readBits(sz), sz) * q(k)
                  k += 1
                }
              }
              idctBlock(coef, block)
              val ox = (mx * c.h + bh) * 8
              val oy = (my * c.v + bv) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  c.plane((oy + yy) * c.planeW + ox + xx) = block(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        sinceRestart += 1
        mx += 1
      }
      my += 1
    }
    // trailer: byte-align, then EOI and nothing else
    er.align()
    if (er.pos + 2 > a.length) throw Malformed
    if ((a(er.pos) & 0xff) != 0xff || (a(er.pos + 1) & 0xff) != 0xd9) throw Malformed
    if (er.pos + 2 != a.length) throw Malformed

    // --- color convert + visit (box upsampling by index scaling) ---
    init(width, height)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val s = c.plane(y * c.planeW + x)
          visit(x, y, s, s, s)
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = cy.plane((y * cy.v / maxV) * cy.planeW + (x * cy.h / maxH))
          val bv = cb.plane((y * cb.v / maxV) * cb.planeW + (x * cb.h / maxH))
          val rv = cr.plane((y * cr.v / maxV) * cr.planeW + (x * cr.h / maxH))
          visit(x, y, ycc2r(yv, rv), ycc2g(yv, bv, rv), ycc2b(yv, bv))
          x += 1
        }
        y += 1
      }
    }
    (width, height)
  }

  /** Geometry + channel sums + position-sensitive px_hash (the
    * [[PngCodec.decodeFeatures]] shape); null on malformation.
    */
  def decodeFeatures(bytes: Array[Byte]): InternalRow = {
    try {
      var sumR = 0L; var sumG = 0L; var sumB = 0L
      var hsh = 0L
      val (w, h) = decodeInternal(bytes) { (_, _, r, g, b) =>
        sumR += r; sumG += g; sumB += b
        hsh = (hsh * 31 + r) % HashMod
        hsh = (hsh * 31 + g) % HashMod
        hsh = (hsh * 31 + b) % HashMod
      }
      new GenericInternalRow(Array[Any](w, h, w.toLong * h, sumR, sumG, sumB, hsh))
    } catch {
      case Malformed | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => null
    }
  }

  /** Decode to packed 0xRRGGBB pixels (spec cross-validation entry);
    * throws on malformation.
    */
  def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    var px: Array[Int] = null
    var ww = 0
    val (w, h) = decodeInternal(bytes,
      (dw, dh) => { ww = dw; px = new Array[Int](dw * dh) }) { (x, y, r, g, b) =>
      px(y * ww + x) = (r << 16) | (g << 8) | b
    }
    (w, h, px)
  }

  // ---------------------------------------------------------------------
  // Fixture-side encoder: constant-cell baseline JPEG. Each C×C cell
  // (C = 8, or 16 under 4:2:0) holds one constant (Y,Cb,Cr) derived
  // from one corpus byte, so the 8×8 blocks are DC-only and the decode
  // is EXACT (a DC-only IDCT reproduces its constant bit-exactly under
  // any faithful IDCT) — the property that lets a lossy codec face a
  // hash-exact DuckDB oracle. DC prediction still walks real
  // inter-block differences, the entropy stream still needs FF00
  // unstuffing, and restart intervals still reset predictors, so the
  // oracle-checked path exercises the full baseline machinery except
  // nonzero ACs (JpegCodecSpec covers those via JDK ImageIO streams).
  // ---------------------------------------------------------------------

  /** Fixture mapping corpus byte → constant (Y,Cb,Cr) for one cell
    * (the BMP/PNG byte→channel discipline, routed through YCbCr).
    */
  def cellY(b: Int): Int = b
  def cellCb(b: Int): Int = (7 * b + 13) % 256
  def cellCr(b: Int): Int = 255 - b

  private final class JBitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    private def flushByte(): Unit = {
      out.write(cur)
      if (cur == 0xff) out.write(0x00) // byte stuffing
      cur = 0; n = 0
    }
    def putBits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) flushByte()
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (T.81 F.1.2.3). */
    def pad(): Unit = if (n > 0) { cur = (cur << (8 - n)) | ((1 << (8 - n)) - 1); flushByte() }
    def raw(b: Int): Unit = { require(n == 0); out.write(b) }
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
                  payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  private def dcCategory(diff: Int): Int =
    if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))

  /** Encode a constant-cell baseline JPEG: `cellBytes(i)` colors the
    * i-th cell (row-major over the MCU grid; cells beyond the array
    * are byte 0), grid C = 16 when `subsample420` (color only) else 8;
    * declared `wPx`×`hPx` may clip the right/bottom cells (C-1 max).
    * `restartInterval` > 0 emits DRI + RSTn every that many MCUs.
    */
  def encodeCells(cellBytes: Array[Int], wPx: Int, hPx: Int,
                  subsample420: Boolean, gray: Boolean,
                  restartInterval: Int): Array[Byte] = {
    require(wPx > 0 && hPx > 0, "JPEG dims must be positive")
    val c = if (!gray && subsample420) 16 else 8
    val mcusX = (wPx + c - 1) / c
    val mcusY = (hPx + c - 1) / c
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // DQT: q[0]=1 (exact DC), rest 16 (moot: ACs are zero)
    val qtab = Array.tabulate(64)(i => if (i == 0) 1 else 16)
    def dqt(id: Int): Array[Byte] =
      (Array(id) ++ qtab).map(_.toByte)
    seg(out, 0xdb, dqt(0))
    if (!gray) seg(out, 0xdb, dqt(1))
    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((hPx >> 8) & 0xff); sof.write(hPx & 0xff)
    sof.write((wPx >> 8) & 0xff); sof.write(wPx & 0xff)
    if (gray) {
      sof.write(1)
      sof.write(1); sof.write(0x11); sof.write(0)
    } else {
      sof.write(3)
      val yHV = if (subsample420) 0x22 else 0x11
      sof.write(1); sof.write(yHV); sof.write(0)
      sof.write(2); sof.write(0x11); sof.write(1)
      sof.write(3); sof.write(0x11); sof.write(1)
    }
    seg(out, 0xc0, sof.toByteArray)
    // DHT: DC = 12 categories at length 4; AC = EOB at length 1 + ZRL
    // at length 2 (all-ones codes of both lengths stay unused, as T.81
    // requires)
    val dhtDc = (Array(0x00) ++ Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      (0 to 11)).map(_.toByte)
    val dhtAc = (Array(0x10) ++ Array(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      Array(0x00, 0xf0)).map(_.toByte)
    seg(out, 0xc4, dhtDc)
    seg(out, 0xc4, dhtAc)
    if (restartInterval > 0)
      seg(out, 0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    val nc = if (gray) 1 else 3
    sos.write(nc)
    var i = 0
    while (i < nc) { sos.write(i + 1); sos.write(0x00); i += 1 }
    sos.write(0); sos.write(63); sos.write(0)
    seg(out, 0xda, sos.toByteArray)
    // entropy
    val w = new JBitWriter
    val preds = new Array[Int](3)
    var rstIdx = 0
    var sinceRestart = 0
    def putDc(comp: Int, value: Int): Unit = {
      val dc = 8 * (value - 128)
      val diff = dc - preds(comp)
      preds(comp) = dc
      val s = dcCategory(diff)
      w.putBits(s, 4) // DC table: category ≡ its own 4-bit code
      if (s > 0) w.putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      w.putBits(0, 1) // EOB (code 0, length 1)
    }
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          w.pad()
          w.raw(0xff); w.raw(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          sinceRestart = 0
          java.util.Arrays.fill(preds, 0)
        }
        val ci = my * mcusX + mx
        val b = if (ci < cellBytes.length) cellBytes(ci) & 0xff else 0
        if (gray) putDc(0, cellY(b))
        else if (subsample420) {
          // four constant Y blocks, then Cb, Cr
          putDc(0, cellY(b)); putDc(0, cellY(b))
          putDc(0, cellY(b)); putDc(0, cellY(b))
          putDc(1, cellCb(b))
          putDc(2, cellCr(b))
        } else {
          putDc(0, cellY(b)); putDc(1, cellCb(b)); putDc(2, cellCr(b))
        }
        sinceRestart += 1
        mx += 1
      }
      my += 1
    }
    w.pad()
    out.write(w.out.toByteArray)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}

/** `jpeg_decode(bytes)` — strict baseline-JPEG feature decode; see
  * [[JpegCodec.decodeFeatures]].
  */
case class JpegDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = JpegCodec.schema
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jpeg_decode needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    JpegCodec.decodeFeatures(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JpegCodec.decodeFeatures($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): JpegDecode =
    copy(child = newChild)
  override def prettyName: String = "jpeg_decode"
}

object JpegDecode {
  def jpeg_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(JpegDecode(GraftColumnBridge.expression(c)))
  }
}
