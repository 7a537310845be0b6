package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL compressed image codec: 8-bit truecolor (color type 2) PNG —
  * the third media container after [[WavCodec]] and [[BmpCodec]], and
  * the first GENUINELY ENCODED one: unlike WAV/BMP, the pixel bytes sit
  * behind zlib/DEFLATE and per-scanline prediction filters, so the
  * decoder cannot index into the payload — it must actually inflate and
  * unfilter. Everything is hand-rolled (CRC-32, Adler-32, DEFLATE,
  * filters): the JDK's Inflater would trivialize exactly the part this
  * codec exists to make real.
  *
  * Coverage:
  *   - COMPLETE DEFLATE decode: stored (BTYPE 00), fixed-Huffman
  *     (BTYPE 01), and dynamic-Huffman (BTYPE 10) blocks, with the full
  *     LZ77 length/distance alphabet — ColOpsSpec cross-validates the
  *     inflate against streams produced by the JDK's Deflater (which
  *     emits dynamic blocks at default settings), so a real-world zlib
  *     payload in our container decodes, not just our own encoder's
  *     output. The ENCODER emits all three block types per payload
  *     (stored chain + fixed + package-merge dynamic tail), and
  *     PngCodecSpec cross-validates the dynamic WRITE path against the
  *     JDK Inflater — the codec is honest from both sides.
  *   - all FIVE scanline filters (None/Sub/Up/Average/Paeth); the
  *     encoder assigns filter y % 5 so every staged asset with h ≥ 5
  *     exercises every unfilter path.
  *   - full container validation: signature, chunk framing, per-chunk
  *     CRC-32, IHDR field checks, consecutive-IDAT rule, IEND-last,
  *     zlib header + Adler-32, exact inflated length, filter-byte
  *     range. Any lie → NULL.
  *
  * `png_decode` returns geometry + channel sums PLUS `px_hash`, a
  * rolling polynomial hash over the logical top-down RGB byte stream —
  * the position-sensitive moment (channel sums are order-invariant and
  * would not catch a row-order or filter mistake; the hash breaks on
  * any of them). Same fail-closed NULL discipline as the other codecs.
  */
object PngCodec {

  val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Rolling polynomial hash modulus — shared with the text tier's
    * portable hash (TextOps.HashMod) so both engines compute it with
    * exact integer arithmetic.
    */
  val HashMod = 1000000007L

  // --- checksums (hand-rolled; see scaladoc) ---

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  private[functions] def crc32(bytes: Array[Byte], from: Int, len: Int): Int = {
    var c = 0xffffffff
    var i = from
    val end = from + len
    while (i < end) {
      c = crcTable((c ^ bytes(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    c ^ 0xffffffff
  }

  private[functions] def adler32(bytes: Array[Byte]): Int = {
    var a = 1; var b = 0
    var i = 0
    while (i < bytes.length) {
      a = (a + (bytes(i) & 0xff)) % 65521
      b = (b + a) % 65521
      i += 1
    }
    (b << 16) | a
  }

  // --- DEFLATE fixed-Huffman tables ---

  private[functions] val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
    23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private[functions] val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private[functions] val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private[functions] val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
    6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

  // --- encoder ---

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    /** LSB-first field (DEFLATE non-Huffman fields). */
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >>> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** Huffman code: packed MSB of the code first. */
    def putHuff(code: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur |= ((code >>> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def alignByte(): Unit = if (nBits > 0) { buf.write(cur); cur = 0; nBits = 0 }
    def writeRaw(b: Array[Byte], from: Int, len: Int): Unit = {
      alignByte(); buf.write(b, from, len)
    }
    def bytes(): Array[Byte] = { alignByte(); buf.toByteArray }
  }

  /** Fixed-Huffman literal code for symbol 0..287. Returns (code, bits). */
  @inline private def fixedLit(sym: Int): (Int, Int) =
    if (sym < 144) (0x30 + sym, 8)
    else if (sym < 256) (0x190 + (sym - 144), 9)
    else if (sym < 280) (sym - 256, 7)
    else (0xc0 + (sym - 280), 8)

  /** Length-limited Huffman code lengths by PACKAGE-MERGE (the
    * length-bounded construction DEFLATE requires: literal/length and
    * distance codes cap at 15 bits, the code-length code at 7).
    * Symbols with zero frequency get length 0; a single-symbol
    * alphabet still gets length 1 (a zero-bit code is not decodable).
    */
  private[graft] def limitedHuffLengths(freq: Array[Int], limit: Int): Array[Int] = {
    val lens = new Array[Int](freq.length)
    val syms = freq.indices.filter(freq(_) > 0).toArray
    if (syms.isEmpty) return lens
    if (syms.length == 1) { lens(syms.head) = 1; return lens }
    require(syms.length <= (1 << limit),
      s"alphabet ${syms.length} exceeds 2^$limit")
    // package-merge, array form: leaves sorted ONCE by weight; each
    // level's package list is the two-pointer merge of the leaf list
    // with pairs of the previous (already sorted) level, so no level
    // re-sorts and no symbol lists ride the packages — leaf
    // multiplicities are recovered by a backward needed-count walk.
    // O(n·limit) time, primitive arrays only (this runs per staged
    // asset, so the encoder's constant factor is query-visible).
    val n = syms.length
    val leafSyms = syms.sortBy(s => (freq(s), s))
    val leafW = leafSyms.map(freq(_).toLong)
    // per level: weights + origin (-1-leafIdx for a leaf, else pair
    // index j = children 2j, 2j+1 of the previous level); flat arrays
    // sized by the ACTIVE alphabet — this runs once per staged asset,
    // so the scratch size is query-visible on small payloads
    val maxLen = 2 * n
    val levW = new Array[Long](limit * maxLen)
    val levOrig = new Array[Int](limit * maxLen)
    val levN = new Array[Int](limit)
    var l = 0
    while (l < limit) {
      val base = l * maxLen
      val prevBase = (l - 1) * maxLen
      val prevN = if (l == 0) 0 else levN(l - 1)
      val nPairs = prevN / 2
      var li = 0 // leaf pointer
      var pi = 0 // pair pointer
      var k = 0
      while (li < n || pi < nPairs) {
        val lw = if (li < n) leafW(li) else Long.MaxValue
        val pw = if (pi < nPairs) levW(prevBase + 2 * pi) + levW(prevBase + 2 * pi + 1)
                 else Long.MaxValue
        if (lw <= pw) { levW(base + k) = lw; levOrig(base + k) = -1 - li; li += 1 }
        else { levW(base + k) = pw; levOrig(base + k) = pi; pi += 1 }
        k += 1
      }
      levN(l) = k
      l += 1
    }
    // backward walk: take the first `needed` packages per level; a
    // leaf increments its symbol, a pair demands two more from below
    var needed = 2 * (n - 1)
    l = limit - 1
    while (l >= 0) {
      var pairs = 0
      var k = 0
      while (k < needed) {
        val o = levOrig(l * maxLen + k)
        if (o < 0) lens(leafSyms(-1 - o)) += 1
        else pairs += 1
        k += 1
      }
      needed = 2 * pairs
      l -= 1
    }
    lens
  }

  /** Canonical DEFLATE codes from code lengths (RFC 1951 §3.2.2). */
  private[graft] def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val maxLen = if (lens.isEmpty) 0 else lens.max
    val blCount = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var bits = 1
    while (bits <= maxLen) {
      code = (code + blCount(bits - 1)) << 1
      nextCode(bits) = code
      bits += 1
    }
    lens.map { l =>
      if (l == 0) 0
      else { val c = nextCode(l); nextCode(l) += 1; c }
    }
  }

  /** A single-code Huffman tree is INCOMPLETE (Kraft sum ½) and zlib
    * rejects it for the literal and code-length alphabets — pad a
    * second length-1 code on an unused symbol, the same move zlib's
    * own encoder makes.
    */
  private def ensureComplete(lens: Array[Int]): Unit =
    if (lens.count(_ > 0) == 1)
      lens(if (lens(0) == 0) 0 else 1) = 1

  /** Code-length-sequence RLE (RFC 1951 §3.2.7): symbols 0-15 verbatim,
    * 16 = repeat previous 3-6, 17 = zeros 3-10, 18 = zeros 11-138.
    * Returns (symbol, extraValue, extraBits) triples.
    */
  private def rleCodeLengths(seq: Array[Int]): Seq[(Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < seq.length) {
      val v = seq(i)
      var run = 1
      while (i + run < seq.length && seq(i + run) == v) run += 1
      if (v == 0 && run >= 3) {
        var left = run
        while (left >= 11) { val n = math.min(left, 138); out += ((18, n - 11, 7)); left -= n }
        if (left >= 3) { out += ((17, left - 3, 3)); left = 0 }
        var j = 0
        while (j < left) { out += ((0, 0, 0)); j += 1 }
      } else if (v != 0 && run >= 4) {
        out += ((v, 0, 0))
        var left = run - 1
        while (left >= 3) { val n = math.min(left, 6); out += ((16, n - 3, 2)); left -= n }
        var j = 0
        while (j < left) { out += ((v, 0, 0)); j += 1 }
      } else {
        var j = 0
        while (j < run) { out += ((v, 0, 0)); j += 1 }
      }
      i += run
    }
    out.toSeq
  }

  /** One DYNAMIC-Huffman (BTYPE=10) literal block over
    * `data[from, from+len)`: per-payload literal tree (package-merge
    * bounded at 15), one zero-length distance code (RFC 1951: "one
    * distance code of zero bits means that there are no distance
    * codes used"), code-length sequence RLE'd through the 19-symbol
    * code-length code (bounded at 7). Literal-only is valid DEFLATE —
    * an encoder may always choose no matches.
    */
  private def dynamicBlock(w: BitWriter, data: Array[Byte], from: Int,
                           len: Int, bfinal: Boolean): Unit = {
    val litFreq = new Array[Int](257)
    var i = from
    while (i < from + len) { litFreq(data(i) & 0xff) += 1; i += 1 }
    litFreq(256) += 1 // EOB
    val litLens = limitedHuffLengths(litFreq, 15)
    ensureComplete(litLens)
    val litCodes = canonicalCodes(litLens)
    val nlit = 257
    val distLens = Array(0)
    val clSeq = litLens.take(nlit) ++ distLens
    val rle = rleCodeLengths(clSeq)
    val clFreq = new Array[Int](19)
    rle.foreach { case (s, _, _) => clFreq(s) += 1 }
    val clLens = limitedHuffLengths(clFreq, 7)
    ensureComplete(clLens)
    val clCodes = canonicalCodes(clLens)
    val order = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)
    var hclen = 19
    while (hclen > 4 && clLens(order(hclen - 1)) == 0) hclen -= 1
    w.putBits(if (bfinal) 1 else 0, 1)
    w.putBits(2, 2) // BTYPE=10
    w.putBits(nlit - 257, 5)
    w.putBits(0, 5) // HDIST-1: one distance code
    w.putBits(hclen - 4, 4)
    var k = 0
    while (k < hclen) { w.putBits(clLens(order(k)), 3); k += 1 }
    rle.foreach { case (s, extra, extraBits) =>
      w.putHuff(clCodes(s), clLens(s))
      if (extraBits > 0) w.putBits(extra, extraBits)
    }
    i = from
    while (i < from + len) {
      val b = data(i) & 0xff
      w.putHuff(litCodes(b), litLens(b))
      i += 1
    }
    w.putHuff(litCodes(256), litLens(256))
  }

  /** DEFLATE the payload as one STORED block chain, one fixed-Huffman
    * literal block, then one DYNAMIC-Huffman final block (each third
    * non-empty when the data allows), so every staged container
    * exercises ALL THREE block types — and the dynamic WRITE path
    * faces foreign decoders (JDK Inflater cross-validation in
    * PngCodecSpec), not just our own inflate. Literal-only coding is
    * valid DEFLATE (an encoder may always choose no matches); the
    * DECODER still handles full LZ77 back-references.
    */
  private def deflate(data: Array[Byte]): Array[Byte] = {
    val w = new BitWriter
    val third = data.length / 3
    val fixedEnd = third + (data.length - third) / 2
    // stored third, split at the format's 16-bit LEN field: a stored
    // block carries at most 65535 bytes, so larger spans emit a chain
    // of blocks (one unsplit LEN would truncate mod 2^16 — a silently
    // corrupt stream for any image over ~43k pixels)
    var off = 0
    var firstBlock = true
    while (firstBlock || off < third) { // empty span still emits one block
      firstBlock = false
      val len = math.min(third - off, 0xffff)
      w.putBits(0, 1); w.putBits(0, 2) // BFINAL=0, BTYPE=00
      w.alignByte()
      w.writeRaw(Array[Byte]((len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
        (~len & 0xff).toByte, ((~len >> 8) & 0xff).toByte), 0, 4)
      w.writeRaw(data, off, len)
      off += len
    }
    // fixed-Huffman middle block (literal codes have no length limit —
    // one block suffices at any size)
    w.putBits(0, 1); w.putBits(1, 2)
    var i = third
    while (i < fixedEnd) {
      val (c, n) = fixedLit(data(i) & 0xff)
      w.putHuff(c, n)
      i += 1
    }
    val (eob, eobN) = fixedLit(256)
    w.putHuff(eob, eobN)
    // dynamic final block over the rest
    dynamicBlock(w, data, fixedEnd, data.length - fixedEnd, bfinal = true)
    w.bytes()
  }

  /** Raw-DEFLATE emit entry for the spec's foreign-decoder
    * cross-validation (JDK Inflater(nowrap) over our three-block
    * stream, dynamic tail included).
    */
  private[graft] def deflateRaw(data: Array[Byte]): Array[Byte] = deflate(data)

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    def u32(v: Int): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    out.write(u32(data.length))
    val body = typ.getBytes("US-ASCII") ++ data
    out.write(body)
    out.write(u32(crc32(body, 0, body.length)))
  }

  /** Encode packed 0xRRGGBB pixels (top-down, row-major) as a valid
    * 8-bit truecolor PNG, scanline y filtered with filter y % 5.
    */
  def encodeRgb8(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(width > 0, s"width must be > 0, got $width")
    require(pixels.length == width * height,
      s"pixel count ${pixels.length} != $width x $height")
    val stride = width * 3
    val raw = new Array[Byte](height * stride) // unfiltered RGB rows
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        raw(y * stride + 3 * x) = ((p >> 16) & 0xff).toByte
        raw(y * stride + 3 * x + 1) = ((p >> 8) & 0xff).toByte
        raw(y * stride + 3 * x + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val filt = new Array[Byte](height * (1 + stride))
    y = 0
    while (y < height) {
      val f = y % 5
      filt(y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = raw(y * stride + i) & 0xff
        val left = if (i >= 3) raw(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) raw((y - 1) * stride + i - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filt(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    container(deflate(filt), filt, width, height)
  }

  /** Assemble the full PNG container around an externally-built DEFLATE
    * body (checksums and framing stay canonical). `private[graft]` as a
    * test seam: specs hand-craft block structures the encoder never
    * emits — LZ77 back-references, dynamic-Huffman headers, filter-byte
    * lies — and this wraps them into otherwise-valid containers so the
    * decoder's rejection is attributable to exactly the planted flaw.
    */
  private[graft] def container(deflateBody: Array[Byte], filt: Array[Byte],
                               width: Int, height: Int): Array[Byte] = {
    val zlib = new java.io.ByteArrayOutputStream()
    zlib.write(0x78); zlib.write(0x01) // CM=8 CINFO=7, FCHECK makes %31==0
    zlib.write(deflateBody)
    val ad = adler32(filt)
    zlib.write((ad >>> 24) & 0xff); zlib.write((ad >>> 16) & 0xff)
    zlib.write((ad >>> 8) & 0xff); zlib.write(ad & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    def be32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = ((v >>> 24) & 0xff).toByte; a(off + 1) = ((v >>> 16) & 0xff).toByte
      a(off + 2) = ((v >>> 8) & 0xff).toByte; a(off + 3) = (v & 0xff).toByte
    }
    be32(ihdr, 0, width); be32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zlib.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // --- decoder ---

  private[functions] final class BitReader(val data: Array[Byte]) {
    var pos = 0   // byte position
    var bit = 0   // bit position within current byte (LSB-first)
    def readBit(): Int = {
      if (pos >= data.length) throw Malformed
      val v = (data(pos) >>> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    /** LSB-first n-bit field. */
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    def alignByte(): Unit = if (bit > 0) { bit = 0; pos += 1 }
  }

  private[functions] object Malformed extends RuntimeException(null, null, false, false)

  /** Canonical Huffman decoder over a code-length array (the zlib
    * construction: codes of equal length are consecutive, ordered by
    * symbol — RFC 1951 §3.2.2; decode walks lengths 1..15 tracking the
    * first code of each length, the structure of puff.c's public-domain
    * reference decoder). Rejects over-subscribed length sets at build
    * time; an incomplete code simply fails at decode when an unassigned
    * code arrives.
    */
  private[functions] final class Huffman(lengths: Array[Int]) {
    private val MaxBits = 15
    private val count = new Array[Int](MaxBits + 1)
    lengths.foreach { l =>
      if (l < 0 || l > MaxBits) throw Malformed
      if (l > 0) count(l) += 1
    }
    // over-subscription check: codes available halve-and-extend per level
    locally {
      var left = 1
      var l = 1
      while (l <= MaxBits) {
        left <<= 1
        left -= count(l)
        if (left < 0) throw Malformed
        l += 1
      }
    }
    private val symbols = {
      val offs = new Array[Int](MaxBits + 2)
      var l = 1
      while (l <= MaxBits) { offs(l + 1) = offs(l) + count(l); l += 1 }
      val syms = new Array[Int](lengths.count(_ > 0))
      val cur = offs.clone()
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) > 0) { syms(cur(lengths(s))) = s; cur(lengths(s)) += 1 }
        s += 1
      }
      syms
    }
    def decode(r: BitReader): Int = {
      var code = 0; var first = 0; var index = 0
      var len = 1
      while (len <= MaxBits) {
        code |= r.readBit()
        val cnt = count(len)
        if (code - first < cnt) return symbols(index + (code - first))
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        len += 1
      }
      throw Malformed
    }
  }

  /** Fixed-Huffman tables per RFC 1951 §3.2.6 (built once). */
  private[functions] val FixedLit = new Huffman(Array.tabulate(288) { s =>
    if (s < 144) 8 else if (s < 256) 9 else if (s < 280) 7 else 8
  })
  private[functions] val FixedDist = new Huffman(Array.fill(30)(5))

  /** The code-length-code symbol order of RFC 1951 §3.2.7. */
  private val ClcOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)

  /** Read the dynamic-block header: the code-length code, then the
    * run-length-encoded literal/length and distance code lengths.
    */
  private[functions] def readDynamicTables(r: BitReader): (Huffman, Huffman) = {
    val hlit = r.readBits(5) + 257
    val hdist = r.readBits(5) + 1
    val hclen = r.readBits(4) + 4
    if (hlit > 286 || hdist > 30) throw Malformed
    val clcLens = new Array[Int](19)
    var i = 0
    while (i < hclen) { clcLens(ClcOrder(i)) = r.readBits(3); i += 1 }
    val clc = new Huffman(clcLens)
    val lens = new Array[Int](hlit + hdist)
    var n = 0
    while (n < lens.length) {
      val sym = clc.decode(r)
      if (sym < 16) { lens(n) = sym; n += 1 }
      else {
        val (rep, value) = sym match {
          case 16 =>
            if (n == 0) throw Malformed // no previous length to repeat
            (3 + r.readBits(2), lens(n - 1))
          case 17 => (3 + r.readBits(3), 0)
          case 18 => (11 + r.readBits(7), 0)
          case _ => throw Malformed
        }
        if (n + rep > lens.length) throw Malformed
        var j = 0
        while (j < rep) { lens(n) = value; n += 1; j += 1 }
      }
    }
    if (lens(256) == 0) throw Malformed // every block must end; EOB needs a code
    (new Huffman(lens.take(hlit)), new Huffman(lens.drop(hlit)))
  }

  /** Decode one Huffman-coded block (fixed or dynamic tables) into
    * `out` starting at `n`; returns the new fill. Full LZ77
    * length/distance alphabet.
    */
  private def decodeBlock(r: BitReader, lit: Huffman, dist: Huffman,
                          out: Array[Byte], n0: Int, expectLen: Int): Int = {
    var n = n0
    var eob = false
    while (!eob) {
      val sym = lit.decode(r)
      if (sym < 256) {
        if (n >= expectLen) throw Malformed
        out(n) = sym.toByte; n += 1
      } else if (sym == 256) eob = true
      else {
        val li = sym - 257
        if (li >= LenBase.length) throw Malformed
        val len = LenBase(li) + r.readBits(LenExtra(li))
        val d = dist.decode(r)
        if (d >= DistBase.length) throw Malformed
        val distance = DistBase(d) + r.readBits(DistExtra(d))
        if (distance > n || n + len > expectLen) throw Malformed
        var j = 0
        while (j < len) { out(n) = out(n - distance); n += 1; j += 1 }
      }
    }
    n
  }

  /** Inflate a complete DEFLATE stream — stored, fixed-Huffman, and
    * dynamic-Huffman blocks — into exactly `expectLen` bytes (PNG knows
    * its filtered size up front; any other length is a malformation).
    */
  private def inflate(r: BitReader, expectLen: Int): Array[Byte] = {
    val out = new Array[Byte](expectLen)
    var n = 0
    var fin = false
    while (!fin) {
      fin = r.readBits(1) == 1
      r.readBits(2) match {
        case 0 => // stored
          r.alignByte()
          if (r.pos + 4 > r.data.length) throw Malformed
          val len = (r.data(r.pos) & 0xff) | ((r.data(r.pos + 1) & 0xff) << 8)
          val nlen = (r.data(r.pos + 2) & 0xff) | ((r.data(r.pos + 3) & 0xff) << 8)
          if ((len ^ 0xffff) != nlen) throw Malformed
          r.pos += 4
          if (r.pos + len > r.data.length || n + len > expectLen) throw Malformed
          System.arraycopy(r.data, r.pos, out, n, len)
          r.pos += len; n += len
        case 1 =>
          n = decodeBlock(r, FixedLit, FixedDist, out, n, expectLen)
        case 2 =>
          val (lit, dist) = readDynamicTables(r)
          n = decodeBlock(r, lit, dist, out, n, expectLen)
        case _ => throw Malformed // BTYPE 11 is reserved
      }
    }
    if (n != expectLen) throw Malformed
    out
  }

  private final class Parsed(val width: Int, val height: Int,
                             val rgb: Array[Byte]) // unfiltered, top-down

  /** Strict validating parse; null on ANY malformation. */
  private def parse(bytes: Array[Byte]): Parsed = {
    try parseOrThrow(bytes)
    // NegativeArraySize belt-and-braces: the IHDR product cap prevents
    // the length overflows that could reach an allocation, but a
    // validating parser facing arbitrary bytes fails CLOSED, never up
    catch { case Malformed | _: ArrayIndexOutOfBoundsException
                 | _: NegativeArraySizeException => null }
  }

  private def parseOrThrow(bytes: Array[Byte]): Parsed = {
    if (bytes == null || bytes.length < Signature.length + 12) return null
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return null
      i += 1
    }
    @inline def be32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    var pos = Signature.length
    var w = 0; var h = 0
    var seenIhdr = false; var seenIend = false
    var idatDone = false // set once a non-IDAT follows an IDAT
    val idat = new java.io.ByteArrayOutputStream()
    while (pos < bytes.length) {
      if (seenIend) throw Malformed // trailing bytes after IEND
      if (pos + 12 > bytes.length) throw Malformed
      val len = be32(pos)
      if (len < 0 || len > Int.MaxValue - 12 || pos + 12 + len > bytes.length)
        throw Malformed
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = be32(pos + 8 + len.toInt)
      if ((crc32(bytes, pos + 4, 4 + len.toInt) & 0xffffffffL) != crc)
        throw Malformed
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) throw Malformed
          seenIhdr = true
          val wL = be32(pos + 8); val hL = be32(pos + 12)
          if (wL <= 0 || wL > (1L << 20) || hL <= 0 || hL > (1L << 20))
            throw Malformed
          // bound the PRODUCT too (checked in Long): per-axis caps alone
          // admit w*h up to 2^40 — the filtered length would overflow
          // Int (a NegativeArraySizeException escaping the fail-closed
          // catch) and, below overflow, a few-hundred-byte container
          // could command multi-GB allocations before any IDAT-length
          // validation. 2^24 px (a 4096x4096 image) is far above any
          // fixture and keeps the worst allocation ~50 MB.
          if (wL * hL > (1L << 24)) throw Malformed
          w = wL.toInt; h = hL.toInt
          // bit depth 8, truecolor, deflate, adaptive filtering, no interlace
          if (bytes(pos + 16) != 8 || bytes(pos + 17) != 2 ||
            bytes(pos + 18) != 0 || bytes(pos + 19) != 0 ||
            bytes(pos + 20) != 0) throw Malformed
        case "IDAT" =>
          if (!seenIhdr || idatDone) throw Malformed // IDATs must be consecutive
          idat.write(bytes, pos + 8, len.toInt)
        case "IEND" =>
          if (!seenIhdr || len != 0) throw Malformed
          seenIend = true
        case _ =>
          if (!seenIhdr) throw Malformed
          // unknown CRITICAL chunks (uppercase first letter — includes
          // PLTE, which has no business in a truecolor image) are a
          // malformation per the PNG contract: a conforming decoder
          // must not render what it cannot understand. Ancillary
          // chunks (lowercase first letter, e.g. tEXt/pHYs) pass.
          if ((bytes(pos + 4) & 0x20) == 0) throw Malformed
      }
      // any non-IDAT chunk after the first IDAT closes the IDAT run —
      // PNG requires IDATs consecutive, so a later IDAT is a malformation
      if (typ != "IDAT" && idat.size() > 0) idatDone = true
      pos += 12 + len.toInt
    }
    if (!seenIhdr || !seenIend || idat.size() == 0) throw Malformed
    val z = idat.toByteArray
    if (z.length < 6) throw Malformed
    val cmf = z(0) & 0xff; val flg = z(1) & 0xff
    if ((cmf & 0x0f) != 8 || (cmf * 256 + flg) % 31 != 0 || (flg & 0x20) != 0)
      throw Malformed
    val stride = w * 3
    val filtLen = h * (1 + stride)
    val r = new BitReader(java.util.Arrays.copyOfRange(z, 2, z.length - 4))
    val filt = inflate(r, filtLen)
    val ad = ((z(z.length - 4) & 0xffL) << 24) | ((z(z.length - 3) & 0xffL) << 16) |
      ((z(z.length - 2) & 0xffL) << 8) | (z(z.length - 1) & 0xffL)
    if ((adler32(filt) & 0xffffffffL) != ad) throw Malformed
    // unfilter into top-down raw RGB
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = filt(y * (1 + stride)) & 0xff
      if (f > 4) throw Malformed
      var i2 = 0
      while (i2 < stride) {
        val x = filt(y * (1 + stride) + 1 + i2) & 0xff
        val left = if (i2 >= 3) raw(y * stride + i2 - 3) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + i2) & 0xff else 0
        val ul = if (y > 0 && i2 >= 3) raw((y - 1) * stride + i2 - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * stride + i2) = ((x + pred) & 0xff).toByte
        i2 += 1
      }
      y += 1
    }
    new Parsed(w, h, raw)
  }

  val decodeSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("px_hash", LongType, nullable = false)))

  /** 2-D decimation in logical orientation (keep (x, y) with
    * x % k == 0 and y % k == 0) and RE-ENCODE — the full pipeline runs
    * twice per row: inflate + unfilter on the way in, re-filter (y % 5)
    * + deflate + re-checksum on the way out. The BMP resample
    * discipline for a compressed container.
    */
  def resample(bytes: Array[Byte], k: Int): Array[Byte] = {
    val p = parse(bytes)
    if (p == null) return null
    val w2 = (p.width + k - 1) / k
    val h2 = (p.height + k - 1) / k
    val stride = p.width * 3
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val off = (y * k) * stride + 3 * (x * k)
        out(y * w2 + x) = ((p.rgb(off) & 0xff) << 16) |
          ((p.rgb(off + 1) & 0xff) << 8) | (p.rgb(off + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    encodeRgb8(out, w2, h2)
  }

  /** Strict decode to packed 0xRRGGBB pixels in logical top-down
    * order (the transcode tier's input); null on malformation.
    */
  private[functions] def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val p = parse(bytes)
    if (p == null) return null
    val out = new Array[Int](p.width * p.height)
    var i = 0
    while (i < out.length) {
      out(i) = ((p.rgb(3 * i) & 0xff) << 16) |
        ((p.rgb(3 * i + 1) & 0xff) << 8) | (p.rgb(3 * i + 2) & 0xff)
      i += 1
    }
    (p.width, p.height, out)
  }

  /** Geometry + channel sums + the position-sensitive rolling hash over
    * the logical top-down RGB byte stream, one loop.
    */
  def decodeFeatures(bytes: Array[Byte]): InternalRow = {
    val p = parse(bytes)
    if (p == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L; var hsh = 0L
    var i = 0
    while (i < p.rgb.length) {
      val r = p.rgb(i) & 0xff
      val g = p.rgb(i + 1) & 0xff
      val b = p.rgb(i + 2) & 0xff
      sr += r; sg += g; sb += b
      hsh = (hsh * 31 + r) % HashMod
      hsh = (hsh * 31 + g) % HashMod
      hsh = (hsh * 31 + b) % HashMod
      i += 3
    }
    new GenericInternalRow(Array[Any](p.width, p.height,
      p.width.toLong * p.height, sr, sg, sb, hsh))
  }
}

/** `png_decode(media)` — see [[PngCodec.decodeFeatures]]. */
case class PngDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PngCodec.decodeSchema
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"png_decode needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    PngCodec.decodeFeatures(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PngCodec.decodeFeatures($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): PngDecode =
    copy(child = newChild)
  override def prettyName: String = "png_decode"
}

object PngDecode {
  def png_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PngDecode(GraftColumnBridge.expression(c)))
  }
}

/** `png_resample(media, k)` — see [[PngCodec.resample]]. */
case class PngResample(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"decimation factor must be >= 1, got $k")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"png_resample needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    PngCodec.resample(input.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PngCodec.resample($c, $k);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): PngResample =
    copy(child = newChild)
  override def prettyName: String = "png_resample"
}

object PngResample {
  def png_resample(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PngResample(GraftColumnBridge.expression(c), k))
  }
}
