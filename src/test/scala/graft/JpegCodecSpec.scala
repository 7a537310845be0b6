package graft

import graft.functions.JpegCodec

/** Baseline-JPEG decoder: exactness on the DC-only constant-cell
  * fixture encodings (all sampling/geometry/restart axes), REAL-stream
  * cross-validation against the JDK's ImageIO codec (standard quant
  * tables, nonzero ACs, dynamic Huffman, byte stuffing), and the
  * fail-closed malformation matrix.
  */
class JpegCodecSpec extends SparkSpec {

  private def cells(n: Int): Array[Int] = Array.tabulate(n)(i => (i * 37 + 11) % 256)

  private def expected(b: Int, gray: Boolean): (Int, Int, Int) =
    if (gray) (b, b, b)
    else (JpegCodec.ycc2r(JpegCodec.cellY(b), JpegCodec.cellCr(b)),
      JpegCodec.ycc2g(JpegCodec.cellY(b), JpegCodec.cellCb(b), JpegCodec.cellCr(b)),
      JpegCodec.ycc2b(JpegCodec.cellY(b), JpegCodec.cellCb(b)))

  private def checkExact(cellBytes: Array[Int], wPx: Int, hPx: Int,
                         sub: Boolean, gray: Boolean, rst: Int): Unit = {
    val enc = JpegCodec.encodeCells(cellBytes, wPx, hPx, sub, gray, rst)
    val (w, h, px) = JpegCodec.decodeRgb(enc)
    assert(w == wPx && h == hPx)
    val c = if (!gray && sub) 16 else 8
    val cpr = (wPx + c - 1) / c
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val ci = (y / c) * cpr + (x / c)
        val b = if (ci < cellBytes.length) cellBytes(ci) else 0
        val (er, eg, eb) = expected(b, gray)
        val p = px(y * w + x)
        assert(((p >> 16) & 0xff) == er && ((p >> 8) & 0xff) == eg && (p & 0xff) == eb,
          s"pixel ($x,$y) of ${w}x$h sub=$sub gray=$gray rst=$rst: " +
            s"got ${(p >> 16) & 0xff},${(p >> 8) & 0xff},${p & 0xff} want $er,$eg,$eb")
        x += 1
      }
      y += 1
    }
  }

  test("constant-cell encodings decode EXACTLY on every axis combination") {
    for {
      sub <- Seq(false, true)
      gray <- Seq(false, true)
      clipR <- Seq(0, 3)
      clipB <- Seq(0, 5)
      rst <- Seq(0, 2)
    } {
      val c = if (!gray && sub) 16 else 8
      val cpr = 3
      val rows = 4
      checkExact(cells(cpr * rows), cpr * c - clipR, rows * c - clipB, sub, gray, rst)
    }
  }

  test("DC prediction walks negative and positive differences across blocks") {
    // sawtooth cells force large alternating DC diffs (categories up to 11)
    val saw = Array.tabulate(12)(i => if (i % 2 == 0) 255 else 0)
    checkExact(saw, 24, 32, sub = false, gray = true, rst = 0)
    checkExact(saw, 24, 32, sub = false, gray = false, rst = 3)
  }

  test("restart markers reset the DC predictor (encoder/decoder agree at every interval)") {
    for (rst <- 1 to 5) checkExact(cells(12), 30, 28, sub = true, gray = false, rst = rst)
  }

  private def imageIoJpeg(img: java.awt.image.BufferedImage,
                          quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  test("cross-validation: JDK ImageIO grayscale stream (real tables, nonzero ACs) within ±1") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5 + y * 3 + ((x * y) % 7) * 11) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val bytes = imageIoJpeg(img, 0.95f)
    val (dw, dh, px) = JpegCodec.decodeRgb(bytes)
    assert(dw == w && dh == h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val got = px(y * w + x) & 0xff
      val want = ref.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(got - want))
    }
    assert(maxDiff <= 1, s"grayscale IDCT drift vs ImageIO: max |diff| = $maxDiff")
  }

  private def colorDrift(img: java.awt.image.BufferedImage): Int = {
    val bytes = imageIoJpeg(img, 0.97f)
    val (dw, dh, px) = JpegCodec.decodeRgb(bytes)
    assert(dw == img.getWidth && dh == img.getHeight)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until dh; x <- 0 until dw; c <- 0 until 3) {
      val got = (px(y * dw + x) >> (8 * (2 - c))) & 0xff
      val want = (ref.getRGB(x, y) >> (8 * (2 - c))) & 0xff
      maxDiff = math.max(maxDiff, math.abs(got - want))
    }
    maxDiff
  }

  test("cross-validation: JDK ImageIO color streams decode with bounded drift") {
    val w = 32; val h = 16
    // neutral-chroma image (r=g=b): Cb=Cr=128 constant, so chroma
    // subsampling is filter-invariant — drift is pure Y IDCT rounding
    val neutral = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5 + y * 9) % 250
      neutral.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(colorDrift(neutral) <= 1)
    // colored gradient: the JDK writer subsamples chroma, and its
    // triangular upsampling differs from our box replication by up to
    // the chroma slope per sample — bound the drift, don't equate it
    val colored = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      colored.setRGB(x, y, ((x * 8) << 16) | ((y * 16) << 8) | ((x * 4 + y * 4) & 0xff))
    assert(colorDrift(colored) <= 12)
  }

  test("fail-closed malformation matrix") {
    val good = JpegCodec.encodeCells(cells(6), 24, 16, subsample420 = false,
      gray = false, restartInterval = 0)
    assert(JpegCodec.decodeFeatures(good) != null)
    // wrong magic
    assert(JpegCodec.decodeFeatures("notajpeg".getBytes("US-ASCII")) == null)
    // truncated entropy stream
    assert(JpegCodec.decodeFeatures(java.util.Arrays.copyOf(good, good.length - 8)) == null)
    // trailing garbage after EOI (dispatch discipline)
    assert(JpegCodec.decodeFeatures(good ++ Array[Byte](0)) == null)
    // progressive SOF: flip SOF0 marker to SOF2
    val prog = good.clone()
    val sofAt = prog.indexOfSlice(Array[Byte](0xff.toByte, 0xc0.toByte))
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decodeFeatures(prog) == null)
    // foreign containers route to null (the sniffer contract)
    assert(JpegCodec.decodeFeatures(graft.functions.PngCodec.encodeRgb8(
      Array.fill(16)(0xff8040), 4, 4)) == null)
    // dimension bomb: a crafted SOF0 declaring 24000x24000 must fail
    // the product cap BEFORE any plane allocation, not OOM the task
    val bomb = good.clone()
    val sofAt2 = bomb.indexOfSlice(Array[Byte](0xff.toByte, 0xc0.toByte))
    // SOF payload: len(2) precision(1) height(2) width(2)
    bomb(sofAt2 + 5) = 0x5d; bomb(sofAt2 + 6) = 0xc0.toByte // height 24000
    bomb(sofAt2 + 7) = 0x5d; bomb(sofAt2 + 8) = 0xc0.toByte // width 24000
    assert(JpegCodec.decodeFeatures(bomb) == null)
  }

  test("image_to_png transcode is pixel-transparent from every source container") {
    import graft.functions.{BmpCodec, PngCodec, TranscodeCodec}
    val px = Array.tabulate(35)(i => ((i * 2654435761L) & 0xffffff).toInt)
    val bmp = BmpCodec.encodeRgb24(px, 7, 5)
    val png = PngCodec.encodeRgb8(px, 7, 5)
    val jpg = JpegCodec.encodeCells(cells(6), 24, 16, subsample420 = false,
      gray = false, restartInterval = 0)
    for ((label, src) <- Seq("bmp" -> bmp, "png" -> png, "jpeg" -> jpg)) {
      val out = TranscodeCodec.toPng(src)
      assert(out != null, s"$label transcode nulled")
      // the transcoded container is a PNG whose decode equals the
      // SOURCE's decode (geometry + pixels, orientation included)
      val a = PngCodec.decodeFeatures(out)
      assert(a != null, s"$label transcode produced an undecodable PNG")
      if (label == "jpeg") {
        val b = JpegCodec.decodeFeatures(src)
        assert((0 until 7).forall(i => a.get(i, null) == b.get(i, null)))
      } else if (label == "png") {
        val b = PngCodec.decodeFeatures(src)
        assert((0 until 7).forall(i => a.get(i, null) == b.get(i, null)))
      } else {
        val b = BmpCodec.decodeFeatures(src)
        assert((0 until 6).forall(i => a.get(i, null) == b.get(i, null)))
      }
    }
    // non-images and zero-pixel sources null
    assert(TranscodeCodec.toPng("just text".getBytes("UTF-8")) == null)
    assert(TranscodeCodec.toPng(BmpCodec.encodeRgb24(Array.emptyByteArray
      .map(_.toInt), 4, 0)) == null) // 0-height BMP: no PNG can carry it
  }

  test("image_thumbnail keeps exactly the (x%k, y%k)=0 pixels in logical orientation") {
    import graft.functions.{BmpCodec, PngCodec, TranscodeCodec}
    val w = 7; val h = 5; val k = 2
    val px = Array.tabulate(w * h)(i => ((i * 2654435761L) & 0xffffff).toInt)
    for ((label, src) <- Seq(
        "bmp" -> BmpCodec.encodeRgb24(px, w, h),
        "png" -> PngCodec.encodeRgb8(px, w, h))) {
      val out = TranscodeCodec.thumbnail(src, k)
      assert(out != null, s"$label thumbnail nulled")
      val row = PngCodec.decodeFeatures(out)
      assert(row.getInt(0) == 4 && row.getInt(1) == 3, s"$label dims")
      // expected kept pixels, row-major logical order
      val kept = for (y <- 0 until h by k; x <- 0 until w by k) yield px(y * w + x)
      var sr = 0L; var hsh = 0L
      kept.foreach { p =>
        sr += (p >> 16) & 0xff
        hsh = (hsh * 31 + ((p >> 16) & 0xff)) % PngCodec.HashMod
        hsh = (hsh * 31 + ((p >> 8) & 0xff)) % PngCodec.HashMod
        hsh = (hsh * 31 + (p & 0xff)) % PngCodec.HashMod
      }
      assert(row.getLong(3) == sr && row.getLong(6) == hsh,
        s"$label decimation content drift")
    }
    // k=1 thumbnail ≡ plain transcode
    val src = BmpCodec.encodeRgb24(px, w, h)
    assert(java.util.Arrays.equals(TranscodeCodec.thumbnail(src, 1),
      TranscodeCodec.toPng(src)))
  }

  test("decode features match a direct pixel-walk (sums + position hash)") {
    val enc = JpegCodec.encodeCells(cells(9), 22, 21, subsample420 = true,
      gray = false, restartInterval = 2)
    val row = JpegCodec.decodeFeatures(enc)
    assert(row != null)
    val (w, h, px) = JpegCodec.decodeRgb(enc)
    var sr = 0L; var sg = 0L; var sb = 0L; var hsh = 0L
    px.foreach { p =>
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      hsh = (hsh * 31 + ((p >> 16) & 0xff)) % JpegCodec.HashMod
      hsh = (hsh * 31 + ((p >> 8) & 0xff)) % JpegCodec.HashMod
      hsh = (hsh * 31 + (p & 0xff)) % JpegCodec.HashMod
    }
    assert(row.getInt(0) == w && row.getInt(1) == h)
    assert(row.getLong(2) == w.toLong * h)
    assert(row.getLong(3) == sr && row.getLong(4) == sg && row.getLong(5) == sb)
    assert(row.getLong(6) == hsh)
  }
}
