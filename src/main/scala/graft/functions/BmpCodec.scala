package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL (minimal, deterministic) image codec: uncompressed 24-bit
  * BI_RGB Windows BMP — the image sibling of [[WavCodec]]. The two
  * genuinely image-specific codec concerns are both present and both
  * verified: rows are stored BOTTOM-UP (the decoder must flip back to
  * logical top-down order) and every pixel row is padded to a 4-byte
  * boundary (the fixture widths 4–7 cover padding 0/1/2/3 bytes).
  * Plain channel SUMS are order-invariant and would not catch a
  * forgotten flip — the resize query exists precisely because 2-D
  * decimation (keep every k-th row/column of the LOGICAL image) is
  * orientation-sensitive, so its oracle breaks on any flip or padding
  * mistake.
  *
  * Expressions (same native-codegen pattern as [[WavCodec]]):
  *   - `bmp_decode(media)`  → struct(width, height, n_px,
  *                            sum_r, sum_g, sum_b) — parsed header
  *                            geometry + exact integer channel moments.
  *   - `bmp_resample(media, k)` → binary: keep pixels at every k-th
  *                            column of every k-th row (top-down), and
  *                            RE-ENCODE — new width, height, padding.
  * Malformed containers (bad magic, size/offset/format lies) decode to
  * NULL, fail-closed.
  */
object BmpCodec {

  val FileHeaderLen = 14
  val InfoHeaderLen = 40
  val PixelOffset: Int = FileHeaderLen + InfoHeaderLen

  @inline private def rowStride(w: Int): Int = (w * 3 + 3) & ~3

  /** Encode packed 0xRRGGBB pixels (top-down, row-major, length must be
    * `width · height`) as a canonical bottom-up 24-bit BMP.
    */
  def encodeRgb24(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(width > 0, s"width must be > 0, got $width")
    require(pixels.length == width * height,
      s"pixel count ${pixels.length} != $width x $height")
    val stride = rowStride(width)
    val out = new Array[Byte](PixelOffset + stride * height)
    def u32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def u16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    u32(2, out.length.toLong); u32(6, 0L); u32(10, PixelOffset.toLong)
    u32(14, InfoHeaderLen.toLong); u32(18, width.toLong); u32(22, height.toLong)
    u16(26, 1); u16(28, 24); u32(30, 0L); u32(34, (stride * height).toLong)
    u32(38, 2835L); u32(42, 2835L); u32(46, 0L); u32(50, 0L)
    var y = 0
    while (y < height) {
      val rowOff = PixelOffset + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        out(rowOff + 3 * x) = (p & 0xff).toByte             // B
        out(rowOff + 3 * x + 1) = ((p >> 8) & 0xff).toByte  // G
        out(rowOff + 3 * x + 2) = ((p >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  private final class Parsed(val width: Int, val height: Int, val bytes: Array[Byte]) {
    private val stride = rowStride(width)
    /** Packed 0xRRGGBB at LOGICAL top-down (x, y) — undoes the
      * bottom-up storage order.
      */
    @inline def px(x: Int, y: Int): Int = {
      val off = PixelOffset + (height - 1 - y) * stride + 3 * x
      ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 1) & 0xff) << 8) | (bytes(off) & 0xff)
    }
  }

  /** Strict validating parse; null on ANY malformation. */
  private def parse(bytes: Array[Byte]): Parsed = {
    if (bytes == null || bytes.length < PixelOffset) return null
    @inline def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    @inline def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return null
    if (u32(2) != bytes.length.toLong) return null      // declared file size
    if (u32(10) != PixelOffset.toLong) return null      // pixel data offset
    if (u32(14) != InfoHeaderLen.toLong) return null    // BITMAPINFOHEADER
    val w = u32(18); val h = u32(22)
    if (w <= 0 || w > (1L << 20) || h < 0 || h > (1L << 20)) return null
    if (u16(26) != 1 || u16(28) != 24) return null      // planes, 24-bit
    if (u32(30) != 0L) return null                      // BI_RGB only
    val stride = rowStride(w.toInt)
    if (bytes.length.toLong != PixelOffset + stride.toLong * h) return null
    new Parsed(w.toInt, h.toInt, bytes)
  }

  val decodeSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** Parsed (width, height) WITHOUT materializing pixels — the
    * transcode tier's pre-allocation dimension check (BMP validation
    * is per-axis only; the product cap lives with the caller).
    */
  private[functions] def decodeDims(bytes: Array[Byte]): (Int, Int) = {
    val p = parse(bytes)
    if (p == null) null else (p.width, p.height)
  }

  /** Strict decode to packed 0xRRGGBB pixels in LOGICAL top-down
    * order (the transcode tier's input); null on malformation.
    */
  private[functions] def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val p = parse(bytes)
    if (p == null) return null
    val out = new Array[Int](p.width * p.height)
    var y = 0
    while (y < p.height) {
      var x = 0
      while (x < p.width) {
        out(y * p.width + x) = p.px(x, y)
        x += 1
      }
      y += 1
    }
    (p.width, p.height, out)
  }

  /** Parsed geometry + exact per-channel sums in one loop. */
  def decodeFeatures(bytes: Array[Byte]): InternalRow = {
    val p = parse(bytes)
    if (p == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < p.height) {
      var x = 0
      while (x < p.width) {
        val v = p.px(x, y)
        sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](p.width, p.height,
      p.width.toLong * p.height, sr, sg, sb))
  }

  /** 2-D decimation in LOGICAL orientation: keep (x, y) with
    * x % k == 0 and y % k == 0, re-encode (new width/height/padding).
    * This is the query that catches a forgotten bottom-up flip — the
    * kept-row set differs between orientations whenever h % k != 1.
    */
  def resample(bytes: Array[Byte], k: Int): Array[Byte] = {
    val p = parse(bytes)
    if (p == null) return null
    val w2 = (p.width + k - 1) / k
    val h2 = (p.height + k - 1) / k
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) { out(y * w2 + x) = p.px(x * k, y * k); x += 1 }
      y += 1
    }
    encodeRgb24(out, w2, h2)
  }
}

/** `bmp_decode(media)` — see [[BmpCodec.decodeFeatures]]. */
case class BmpDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BmpCodec.decodeSchema
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bmp_decode needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    BmpCodec.decodeFeatures(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpCodec.decodeFeatures($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): BmpDecode =
    copy(child = newChild)
  override def prettyName: String = "bmp_decode"
}

object BmpDecode {
  def bmp_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(BmpDecode(GraftColumnBridge.expression(c)))
  }
}

/** `bmp_resample(media, k)` — see [[BmpCodec.resample]]. */
case class BmpResample(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"decimation factor must be >= 1, got $k")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bmp_resample needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    BmpCodec.resample(input.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpCodec.resample($c, $k);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): BmpResample =
    copy(child = newChild)
  override def prettyName: String = "bmp_resample"
}

object BmpResample {
  def bmp_resample(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(BmpResample(GraftColumnBridge.expression(c), k))
  }
}
