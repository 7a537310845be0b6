package graft

import graft.functions._
import graft.operators.Warc

/** Adversarial-bytes hardening: every decoder in the ingest surface
  * faces UNTRUSTED crawl bytes per row, so the contract is null (or a
  * counted skip), NEVER an exception that kills the task. Random
  * buffers probe the cold paths; single-byte mutations of VALID
  * containers probe the parsing state machines one transition at a
  * time — the class of damage bit-rot and truncated fetches actually
  * produce.
  */
class FuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260815L)

  private def randomBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  private def decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "gzip" -> (b => GzipCodec.gunzip(b)),
    "zlib" -> (b => GzipCodec.zlibInflate(b)),
    "raw-deflate" -> (b => GzipCodec.inflateRaw(b)),
    "warc-strict" -> (b => WarcCodec.parse(b)),
    "warc-lenient" -> (b => WarcCodec.parseLenient(b)),
    "http" -> (b => HttpCodec.parse(b)),
    "wav" -> (b => WavCodec.decodeFeatures(b)),
    "bmp" -> (b => BmpCodec.decodeFeatures(b)),
    "png" -> (b => PngCodec.decodeFeatures(b)),
    "jpeg" -> (b => JpegCodec.decodeFeatures(b)),
    "gif" -> (b => GifCodec.decodeFeatures(b)),
    "pdf" -> (b => PdfCodec.extract(b)),
    "transcode" -> (b => TranscodeCodec.toPng(b)),
    "thumbnail" -> (b => TranscodeCodec.thumbnail(b, 2)))

  test("no decoder throws on random buffers (sizes 0..4KB, 200 per decoder)") {
    for ((label, f) <- decoders; trial <- 0 until 200) {
      val n = trial match {
        case 0 => 0
        case t if t < 50 => t
        case _ => rnd.nextInt(4096)
      }
      val b = randomBytes(n)
      try f(b)
      catch { case e: Throwable =>
        fail(s"$label threw ${e.getClass.getSimpleName} on random $n bytes (trial $trial)")
      }
    }
  }

  test("no decoder throws on single-byte mutations of valid containers") {
    val px = Array.tabulate(60)(i => ((i * 2654435761L) & 0xffffff).toInt)
    val docText = "the quick brown fox jumps over the lazy dog."
    val valids: Seq[(String, Array[Byte], Seq[(String, Array[Byte] => Any)])] = Seq(
      ("warc-shard", GzipCodec.gunzip(Warc.renderShard(0,
        Seq((0L, docText), (1L, docText), (7L, docText)))),
        decoders.filter(d => d._1.startsWith("warc"))),
      ("gzip-member", Warc.gzipMember("hello crawl world".getBytes("UTF-8")),
        decoders.filter(_._1 == "gzip")),
      ("http-chunked-gzip", ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n").getBytes("US-ASCII") ++
        Warc.chunkedEncode(Warc.gzipMember("body".getBytes("UTF-8"))),
        decoders.filter(_._1 == "http")),
      ("png", PngCodec.encodeRgb8(px, 6, 10),
        decoders.filter(d => Set("png", "transcode", "thumbnail")(d._1))),
      ("bmp", BmpCodec.encodeRgb24(px, 6, 10),
        decoders.filter(d => Set("bmp", "transcode")(d._1))),
      ("jpeg", JpegCodec.encodeCells(Array.tabulate(6)(i => (i * 37) % 256),
        24, 16, subsample420 = true, gray = false, restartInterval = 2),
        decoders.filter(d => Set("jpeg", "transcode")(d._1))),
      ("gif", GifCodec.encodeIndexed(Array.tabulate(60)(i => (i * 37) % 256),
        6, 10, interlaced = true, secondFrame = true, comment = true),
        decoders.filter(d => Set("gif", "transcode", "thumbnail")(d._1))),
      ("pdf", PdfCodec.render("fuzz target (with) \\escapes\\ and text", flate = true),
        decoders.filter(_._1 == "pdf")),
      // the /Prev incremental-update chain walker + indirect /Length
      // resolver under mutation (cycle caps, offset validation)
      ("pdf-updated", PdfCodec.renderWithUpdate("updated target text here", flate = true),
        decoders.filter(_._1 == "pdf")),
      // the ToUnicode CMap parser + hex-string CID decode under mutation
      ("pdf-cjk", PdfCodec.renderCjk("漢字 と かな mixed ascii.", flate = true),
        decoders.filter(_._1 == "pdf")))
    for ((cLabel, valid, ds) <- valids; (dLabel, f) <- ds) {
      // every position would be O(n^2-ish); sample ~200 positions + all
      // of the first 64 (headers are where the state machines live)
      val positions = (0 until math.min(64, valid.length)) ++
        Seq.fill(200)(rnd.nextInt(valid.length))
      for (pos <- positions.distinct; flip <- Seq(0x01, 0x80, 0xff)) {
        val m = valid.clone()
        m(pos) = (m(pos) ^ flip).toByte
        try f(m)
        catch { case e: Throwable =>
          fail(s"$dLabel threw ${e.getClass.getSimpleName} on $cLabel with " +
            s"byte $pos ^ 0x${flip.toHexString}")
        }
      }
    }
  }

  test("truncations of valid containers never throw") {
    val shard = Warc.renderShard(0, Seq((0L, "alpha beta gamma."), (3L, "delta.")))
    val full = GzipCodec.gunzip(shard) // decompress ONCE; sweep both layers
    val png = PngCodec.encodeRgb8(Array.tabulate(40)(_ * 7), 5, 8)
    for (cut <- 0 until shard.length by 7)
      GzipCodec.gunzip(java.util.Arrays.copyOf(shard, cut))
    // the decompressed buffer is LONGER than the compressed shard —
    // sweep its own length so the record-terminator tail is covered
    for (cut <- 0 until full.length by 7)
      WarcCodec.parseLenient(java.util.Arrays.copyOf(full, cut))
    for (cut <- 0 until png.length by 3)
      PngCodec.decodeFeatures(java.util.Arrays.copyOf(png, cut))
  }
}
