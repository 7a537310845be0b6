package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._

/** REAL GIF codec (GIF87a/89a) — the remaining common crawled image
  * format after BMP/PNG/JPEG: palette-indexed pixels behind GIF-variant
  * LZW (LSB-first bit packing, 9→12-bit growing codes, clear/EOI,
  * 255-byte sub-block framing), optional 4-pass interlace, and the 89a
  * block zoo (graphic-control / comment / application extensions,
  * multi-image animations). Decode policy follows what a training-data
  * pipeline wants: the FIRST frame is the image (animation frames are
  * presentation, not content), every remaining block is still
  * structurally validated through the trailer so a truncated or
  * corrupted tail fails closed rather than silently passing.
  *
  * Same discipline as [[PngCodec]]/[[JpegCodec]]: hand-rolled from the
  * public GIF89a specification, fail-closed on ANY malformation
  * (shared `Malformed` control-flow), dimension-bomb caps (2^20 per
  * axis, 2^24 pixel product — the [[PngCodec]] numbers) checked BEFORE
  * allocating, fixture encoder on the staging side only, and ImageIO
  * used purely as spec-side cross-validation. WebP/VP8 remains the
  * documented cut — a VP8 entropy decoder is out of hand-rolled scope.
  *
  * Feature output mirrors png_decode: geometry, exact channel sums,
  * and the position-sensitive rolling px_hash over the LOGICAL
  * top-down RGB stream — which is precisely what breaks if the
  * deinterlace pass or the LZW dictionary growth is wrong anywhere.
  *
  * Reference cell: the byte-chunk source boundary
  * (/root/reference/src/Data/Conduino/Combinators.hs:280-297); the
  * codec tier is what those opaque chunks need once they are media.
  */
object GifCodec {

  /** Shared fixture palette: index v → (v, (7v+13) mod 256, 255−v) —
    * the SAME byte→channel algebra as the BMP/PNG fixtures, so the
    * oracle algebra is shared; a padded pixel is index 0 → (0,13,255).
    */
  @inline def palR(v: Int): Int = v
  @inline def palG(v: Int): Int = (7 * v + 13) % 256
  @inline def palB(v: Int): Int = 255 - v

  private val MaxAxis = 1L << 20
  private val MaxPixels = 1L << 24

  // ---------------------------------------------------------------------
  // Fixture-side encoder (staging only; the engine path is the decoder)
  // ---------------------------------------------------------------------

  /** Interlace row passes: stored row order for a given height. */
  private def interlaceOrder(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var n = 0
    var y = 0
    while (y < h) { out(n) = y; n += 1; y += 8 }
    y = 4
    while (y < h) { out(n) = y; n += 1; y += 8 }
    y = 2
    while (y < h) { out(n) = y; n += 1; y += 4 }
    y = 1
    while (y < h) { out(n) = y; n += 1; y += 2 }
    out
  }

  /** GIF-variant LZW encode of palette indices at the given minimum
    * code size: emit clear first, grow 9→12-bit codes LSB-first,
    * re-clear on a full dictionary, EOI last.
    */
  private[functions] def lzwEncode(indices: Array[Int], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 16)
    var acc = 0L
    var nBits = 0
    var codeSize = mcs + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    // dictionary: (prefix code, next index) → code, rebuilt on clear
    var dict = new java.util.HashMap[Long, Integer]()
    var nextCode = eoi + 1
    emit(clear)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val c = indices(i)
      if (prev < 0) prev = c
      else {
        val key = (prev.toLong << 12) | c
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          emit(prev)
          if (nextCode < 4096) {
            dict.put(key, Integer.valueOf(nextCode))
            nextCode += 1
            // grow ONE ENTRY LATER than the numeric threshold: the
            // decoder adds its mirror entry only upon reading the NEXT
            // code, so its counter lags this one by exactly one — the
            // emitted stream must stay at the old width for one more
            // code (verified against the JDK ImageIO decoder across
            // the 9→10→11-bit boundaries in GifCodecSpec)
            if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else {
            emit(clear)
            dict = new java.util.HashMap[Long, Integer]()
            codeSize = mcs + 1
            nextCode = eoi + 1
          }
          prev = c
        }
      }
      i += 1
    }
    if (prev >= 0) emit(prev)
    emit(eoi)
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  private def writeSubBlocks(bos: java.io.ByteArrayOutputStream, data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      bos.write(n)
      bos.write(data, off, n)
      off += n
    }
    bos.write(0) // block terminator
  }

  /** Encode palette indices (LOGICAL top-down row-major, values 0-255)
    * as a complete GIF file over the fixture palette. `secondFrame`
    * appends a GCE + 1×1 animation frame with a LOCAL color table that
    * the decoder must skip; `comment` inserts a comment extension.
    * Version is 89a exactly when an 89a block is present.
    */
  def encodeIndexed(indices: Array[Int], w: Int, h: Int,
                    interlaced: Boolean = false,
                    secondFrame: Boolean = false,
                    comment: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h,
      s"bad geometry: $w x $h with ${indices.length} indices")
    val bos = new java.io.ByteArrayOutputStream(indices.length / 2 + 800)
    def ascii(s: String): Unit =
      bos.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, s.length)
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    ascii(if (secondFrame || comment) "GIF89a" else "GIF87a")
    // logical screen descriptor: global 256-color table, 8-bit color res
    u16(w); u16(h)
    bos.write(0xf7) // GCT flag | color-res 7 | sort 0 | GCT size 7 (2^8)
    bos.write(0)    // background color index
    bos.write(0)    // no aspect ratio
    var v = 0
    while (v < 256) {
      bos.write(palR(v)); bos.write(palG(v)); bos.write(palB(v))
      v += 1
    }
    if (comment) {
      bos.write(0x21); bos.write(0xfe)
      writeSubBlocks(bos, "graft fixture".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
    }
    if (secondFrame) {
      // NETSCAPE looping application extension (the 89a block real
      // animated GIFs carry) + a graphic control extension per frame
      bos.write(0x21); bos.write(0xff); bos.write(11)
      ascii("NETSCAPE2.0")
      bos.write(3); bos.write(1); bos.write(0); bos.write(0); bos.write(0)
      bos.write(0x21); bos.write(0xf9); bos.write(4)
      bos.write(0); u16(4); bos.write(0); bos.write(0)
    }
    // image descriptor (frame 1 = full screen)
    bos.write(0x2c)
    u16(0); u16(0); u16(w); u16(h)
    bos.write(if (interlaced) 0x40 else 0x00) // no local table
    val stored =
      if (!interlaced) indices
      else {
        val order = interlaceOrder(h)
        val out = new Array[Int](indices.length)
        var r = 0
        while (r < h) {
          System.arraycopy(indices, order(r) * w, out, r * w, w)
          r += 1
        }
        out
      }
    bos.write(8) // LZW minimum code size for a 256-color palette
    writeSubBlocks(bos, lzwEncode(stored, 8))
    if (secondFrame) {
      bos.write(0x21); bos.write(0xf9); bos.write(4)
      bos.write(0); u16(4); bos.write(0); bos.write(0)
      bos.write(0x2c)
      u16(0); u16(0); u16(1); u16(1)
      bos.write(0x81) // LOCAL color table, size 1 → 4 entries
      for (i <- 0 until 4) { bos.write(3 * i + 1); bos.write(3 * i + 2); bos.write(3 * i + 3) }
      bos.write(2) // minimum LZW code size for a 4-color table
      writeSubBlocks(bos, lzwEncode(Array(3), 2))
    }
    bos.write(0x3b) // trailer
    bos.toByteArray
  }

  // ---------------------------------------------------------------------
  // Engine-side strict decoder
  // ---------------------------------------------------------------------

  private def Malformed = PngCodec.Malformed

  private final class Reader(val a: Array[Byte]) {
    var pos = 0
    @inline def u8(): Int = {
      if (pos >= a.length) throw Malformed
      val v = a(pos) & 0xff; pos += 1; v
    }
    @inline def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    def bytes(n: Int): Unit = { // skip n payload bytes
      if (pos + n > a.length) throw Malformed
      pos += n
    }
  }

  /** Concatenated LZW data sub-blocks → one buffer; validates the
    * sub-block framing and the terminating zero block.
    */
  private def readSubBlocks(r: Reader): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    var n = r.u8()
    while (n != 0) {
      if (r.pos + n > r.a.length) throw Malformed
      out.write(r.a, r.pos, n)
      r.pos += n
      n = r.u8()
    }
    out.toByteArray
  }

  private def skipSubBlocks(r: Reader): Unit = {
    var n = r.u8()
    while (n != 0) { r.bytes(n); n = r.u8() }
  }

  /** GIF-variant LZW decode into exactly `n` palette indices; strict on
    * invalid codes, output overflow, or a missing EOI.
    */
  private def lzwDecode(data: Array[Byte], mcs: Int, n: Int,
                        paletteSize: Int): Array[Int] = {
    if (mcs < 2 || mcs > 8) throw Malformed
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Int](n)
    var outN = 0
    var codeSize = mcs + 1
    var nextCode = eoi + 1
    var prev = -1
    var acc = 0L
    var nBits = 0
    var bp = 0
    val stack = new Array[Int](4096)
    @inline def firstOf(code0: Int): Int = {
      var c = code0
      while (c >= clear) c = prefix(c)
      c
    }
    def expand(code0: Int): Unit = {
      var sp = 0
      var c = code0
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      if (outN + sp + 1 > n) throw Malformed
      if (c >= paletteSize) throw Malformed
      out(outN) = c; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
    }
    var done = false
    while (!done) {
      while (nBits < codeSize) {
        if (bp >= data.length) throw Malformed
        acc |= (data(bp) & 0xffL) << nBits
        bp += 1
        nBits += 8
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      nBits -= codeSize
      if (code == clear) {
        codeSize = mcs + 1
        nextCode = eoi + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) throw Malformed // first code must be a literal
        if (code >= paletteSize || outN >= n) throw Malformed
        out(outN) = code; outN += 1
        prev = code
      } else {
        if (code < nextCode) {
          expand(code)
          if (nextCode < 4096) {
            prefix(nextCode) = prev
            suffix(nextCode) = firstOf(code)
            if (suffix(nextCode) >= paletteSize) throw Malformed
            nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        } else if (code == nextCode && nextCode < 4096) {
          // the KwKwK case: string(prev) + first(prev)
          prefix(nextCode) = prev
          suffix(nextCode) = firstOf(prev)
          if (suffix(nextCode) >= paletteSize) throw Malformed
          nextCode += 1
          expand(code) // the just-added code
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          prev = code
        } else throw Malformed
      }
    }
    if (outN != n) throw Malformed
    out
  }

  private final class Frame(val w: Int, val h: Int, val px: Array[Int])

  /** Strict whole-file parse: decode frame 1 to packed RGB (logical
    * top-down), then VALIDATE every remaining block through the
    * trailer. Throws Malformed on any framing/LZW/palette violation.
    */
  private def parseImpl(bytes: Array[Byte]): Frame = {
    val r = new Reader(bytes)
    if (bytes.length < 13) throw Malformed
    val h6 = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (h6 != "GIF87a" && h6 != "GIF89a") throw Malformed
    r.pos = 6
    val sw = r.u16(); val sh = r.u16()
    val packed = r.u8()
    r.u8() // background index
    r.u8() // aspect
    if (sw <= 0 || sh <= 0 || sw > MaxAxis || sh > MaxAxis) throw Malformed
    var global: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val size = 2 << (packed & 7)
      global = new Array[Int](size)
      var i = 0
      while (i < size) {
        global(i) = (r.u8() << 16) | (r.u8() << 8) | r.u8()
        i += 1
      }
    }
    var first: Frame = null
    var trailer = false
    while (!trailer) {
      r.u8() match {
        case 0x3b => trailer = true
        case 0x21 =>
          r.u8() // extension label — content is presentation metadata
          skipSubBlocks(r)
        case 0x2c =>
          r.u16(); r.u16() // left, top (composition offsets — frame 1 is the image)
          val fw = r.u16(); val fh = r.u16()
          val ip = r.u8()
          if (fw <= 0 || fh <= 0 || fw > MaxAxis || fh > MaxAxis) throw Malformed
          if (fw.toLong * fh > MaxPixels) throw Malformed
          var palette = global
          if ((ip & 0x80) != 0) {
            val size = 2 << (ip & 7)
            val local = new Array[Int](size)
            var i = 0
            while (i < size) {
              local(i) = (r.u8() << 16) | (r.u8() << 8) | r.u8()
              i += 1
            }
            palette = local
          }
          if (palette == null) throw Malformed // no color table at all
          val mcs = r.u8()
          if (first == null) {
            val data = readSubBlocks(r)
            val idx = lzwDecode(data, mcs, fw * fh, palette.length)
            val px = new Array[Int](fw * fh)
            if ((ip & 0x40) != 0) {
              // deinterlace: stored row j is logical row order(j)
              val order = interlaceOrder(fh)
              var j = 0
              while (j < fh) {
                val ly = order(j)
                var x = 0
                while (x < fw) { px(ly * fw + x) = palette(idx(j * fw + x)); x += 1 }
                j += 1
              }
            } else {
              var i = 0
              while (i < px.length) { px(i) = palette(idx(i)); i += 1 }
            }
            first = new Frame(fw, fh, px)
          } else {
            // later animation frames: presentation, not content — but
            // their framing must still be intact (fail-closed tail)
            skipSubBlocks(r)
          }
        case _ => throw Malformed
      }
    }
    if (r.pos != bytes.length) throw Malformed // bytes after the trailer
    if (first == null) throw Malformed // no image in the stream
    first
  }

  /** Strict decode to packed 0xRRGGBB (logical top-down) — the
    * transcode tier's input; null on malformation.
    */
  private[functions] def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    if (bytes == null) return null
    try {
      val f = parseImpl(bytes)
      (f.w, f.h, f.px)
    } catch {
      case PngCodec.Malformed | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => null
    }
  }

  val decodeSchema: StructType = PngCodec.decodeSchema

  /** Geometry + channel sums + the position-sensitive rolling px_hash
    * (the [[PngCodec]] moment algebra) in one pass; null fail-closed.
    */
  def decodeFeatures(bytes: Array[Byte]): InternalRow = {
    val d = decodeRgb(bytes)
    if (d == null) return null
    val (w, h, px) = d
    var sr = 0L; var sg = 0L; var sb = 0L
    var hsh = 0L
    var i = 0
    while (i < px.length) {
      val v = px(i)
      val rr = (v >> 16) & 0xff; val gg = (v >> 8) & 0xff; val bb = v & 0xff
      sr += rr; sg += gg; sb += bb
      hsh = (hsh * 31 + rr) % PngCodec.HashMod
      hsh = (hsh * 31 + gg) % PngCodec.HashMod
      hsh = (hsh * 31 + bb) % PngCodec.HashMod
      i += 1
    }
    new GenericInternalRow(Array[Any](w, h, w.toLong * h, sr, sg, sb, hsh))
  }
}

/** `gif_decode(media)` — see [[GifCodec.decodeFeatures]]. */
case class GifDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GifCodec.decodeSchema
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gif_decode needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    GifCodec.decodeFeatures(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifCodec.decodeFeatures($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): GifDecode =
    copy(child = newChild)
  override def prettyName: String = "gif_decode"
}

object GifDecode {
  def gif_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(GifDecode(GraftColumnBridge.expression(c)))
  }
}
