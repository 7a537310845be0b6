package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Image TRANSCODE to the canonical container — the normalization step
  * of a real media pipeline: crawled images arrive as BMP/PNG/JPEG (and
  * worse), and everything downstream (near-dup, feature extraction,
  * training shards) wants ONE format. `image_to_png` try-decodes the
  * payload with each strict image parser (their fail-closed NULLs are
  * the sniffer, the q_media_dispatch discipline), re-encodes the pixel
  * array as 8-bit truecolor PNG, and returns the new container bytes —
  * null for non-image or corrupt payloads, and for degenerate
  * zero-pixel sources a PNG cannot represent (a 0-height BMP).
  *
  * Orientation and pixel values ride through EXACTLY (BMP's bottom-up
  * storage is undone at decode; JPEG's DC-only fixture blocks decode
  * bit-exactly), so a decode of the transcoded container must reproduce
  * the source's geometry, channel sums, and position-sensitive px_hash
  * — which is how the oracle checks the whole composition without ever
  * seeing the intermediate bytes.
  *
  * Per-row map work inside codegen: decode + encode, zero shuffle at
  * any scale.
  */
object TranscodeCodec {

  /** Pixel-product cap for the decode-to-pixels path — PNG and JPEG
    * already enforce it in their parsers, but BMP's validation is
    * per-axis only (2^20 each), so a crafted valid BMP could command
    * multi-GB pixel arrays here and then emit a PNG the canonical
    * decoder itself rejects. One cap, checked BEFORE materializing.
    */
  private val MaxPixels = 1L << 24

  private def decodeAny(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = {
      val b = BmpCodec.decodeDims(bytes)
      if (b != null && b._1.toLong * b._2 > MaxPixels) return null
      if (b != null) BmpCodec.decodeRgb(bytes)
      else {
        val p = PngCodec.decodeRgb(bytes)
        if (p != null) p
        else {
          val g = GifCodec.decodeRgb(bytes)
          if (g != null) g
          else try JpegCodec.decodeRgb(bytes)
          catch {
            case PngCodec.Malformed | _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException => null
          }
        }
      }
    }
    if (d == null) null
    else if (d._1.toLong * d._2 > MaxPixels) null
    else d
  }

  /** Any supported image container → canonical PNG bytes; null when
    * the payload is not a (representable) image.
    */
  def toPng(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null) return null
    val d = decodeAny(bytes)
    if (d == null) return null
    val (w, h, px) = d
    if (w <= 0 || h <= 0) return null // PNG cannot carry a zero axis
    PngCodec.encodeRgb8(px, w, h)
  }

  /** Any supported image container → k-decimated canonical-PNG
    * THUMBNAIL (keep (x, y) with x % k == 0 and y % k == 0, logical
    * top-down orientation — the Bmp/PngResample decimation algebra,
    * now format-agnostic); null for non-images and zero-pixel sources.
    */
  def thumbnail(bytes: Array[Byte], k: Int): Array[Byte] = {
    if (bytes == null) return null
    val d = decodeAny(bytes)
    if (d == null) return null
    val (w, h, px) = d
    if (w <= 0 || h <= 0) return null
    val w2 = (w + k - 1) / k
    val h2 = (h + k - 1) / k
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        out(y * w2 + x) = px((y * k) * w + x * k)
        x += 1
      }
      y += 1
    }
    PngCodec.encodeRgb8(out, w2, h2)
  }
}

/** `image_to_png(bytes)` — canonical-container transcode; see
  * [[TranscodeCodec.toPng]].
  */
case class ImageToPng(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_to_png needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    TranscodeCodec.toPng(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TranscodeCodec.toPng($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): ImageToPng =
    copy(child = newChild)
  override def prettyName: String = "image_to_png"
}

object ImageToPng {
  def image_to_png(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ImageToPng(GraftColumnBridge.expression(c)))
  }
}

/** `image_thumbnail(bytes, k)` — format-agnostic k-decimated thumbnail
  * in the canonical container; see [[TranscodeCodec.thumbnail]].
  */
case class ImageThumbnail(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"decimation factor must be >= 1, got $k")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_thumbnail needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    TranscodeCodec.thumbnail(input.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TranscodeCodec.thumbnail($c, $k);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): ImageThumbnail =
    copy(child = newChild)
  override def prettyName: String = "image_thumbnail"
}

object ImageThumbnail {
  def image_thumbnail(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ImageThumbnail(GraftColumnBridge.expression(c), k))
  }
}
