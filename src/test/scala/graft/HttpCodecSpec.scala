package graft

import graft.functions.{GzipCodec, HttpCodec}
import graft.operators.Warc

/** The HTTP/1.x response-envelope decoder behind the WARC front door:
  * the behaviors the (pure-ASCII, stored-block) oracle fixture cannot
  * distinguish — real non-UTF-8 charsets, JDK dynamic-Huffman gzip and
  * zlib/raw deflate bodies, chunk extensions and trailers, obs-fold
  * headers — plus the fail-closed malformation matrix.
  */
class HttpCodecSpec extends SparkSpec {
  import java.nio.charset.StandardCharsets.{ISO_8859_1, US_ASCII, UTF_8}

  private def msg(head: String, body: Array[Byte]): Array[Byte] =
    head.getBytes(US_ASCII) ++ body

  private def row(bytes: Array[Byte]) = HttpCodec.parse(bytes)
  private def textOf(r: org.apache.spark.sql.catalyst.expressions.GenericInternalRow) =
    r.getUTF8String(4).toString
  private def bodyOf(r: org.apache.spark.sql.catalyst.expressions.GenericInternalRow) =
    r.getBinary(3)

  private def jdkGzip(b: Array[Byte]): Array[Byte] = Warc.gzipMember(b)

  private def jdkZlib(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private def jdkRawDeflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  // --- status line + headers -------------------------------------------

  test("parses HTTP/1.0 and HTTP/1.1 status lines; status is surfaced, not gated") {
    for (v <- Seq("HTTP/1.0", "HTTP/1.1")) {
      val r = row(msg(s"$v 200 OK\r\nContent-Type: text/html\r\n\r\n", "x".getBytes(UTF_8)))
      assert(r != null && r.getInt(0) == 200)
    }
    val nf = row(msg("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n",
      "gone".getBytes(UTF_8)))
    assert(nf != null && nf.getInt(0) == 404 && textOf(nf) == "gone")
  }

  test("header names and charset labels are case-insensitive; obs-fold lines unfold") {
    val r = row(msg(
      "HTTP/1.1 200 OK\r\ncOnTeNt-TyPe: Text/HTML;\r\n \tCharset=UTF-8\r\n\r\n",
      "ok".getBytes(UTF_8)))
    assert(r != null)
    assert(r.getUTF8String(1).toString == "text/html")
    assert(r.getUTF8String(2).toString == "utf-8")
    assert(textOf(r) == "ok")
  }

  test("missing Content-Type leaves mime/charset null, utf-8 default decode") {
    val r = row(msg("HTTP/1.1 200 OK\r\nServer: x\r\n\r\n", "défault".getBytes(UTF_8)))
    assert(r != null && r.isNullAt(1) && r.isNullAt(2) && textOf(r) == "défault")
  }

  // --- charsets (real non-ASCII bytes) ---------------------------------

  test("declared iso-8859-1 decodes high bytes; utf-8 would mojibake them") {
    val body = "café crème".getBytes(ISO_8859_1) // 0xE9, 0xE8 single bytes
    val latin = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n", body))
    assert(textOf(latin) == "café crème")
    val utf = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n", body))
    // lenient: malformed utf-8 becomes U+FFFD, never a null record
    assert(utf != null && textOf(utf).contains('�'))
  }

  test("windows-1252 maps the 0x80-0x9F smart-punctuation range") {
    val body = Array[Byte](0x93.toByte, 'h', 'i', 0x94.toByte) // curly quotes
    val r = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=windows-1252\r\n\r\n", body))
    assert(textOf(r) == "“hi”")
  }

  test("unknown charset label falls back to utf-8") {
    val r = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=x-klingon\r\n\r\n",
      "plain".getBytes(UTF_8)))
    assert(r != null && r.getUTF8String(2).toString == "x-klingon" && textOf(r) == "plain")
  }

  test("redirect captures surface status + Location verbatim") {
    val r = row(msg(
      "HTTP/1.1 301 Moved Permanently\r\nLocation: https://site3.com/Articles/7\r\n\r\n",
      Array.emptyByteArray))
    assert(r != null && r.getInt(0) == 301)
    assert(r.getUTF8String(5).toString == "https://site3.com/Articles/7")
    // absent Location stays null
    val ok = row(msg("HTTP/1.1 200 OK\r\n\r\n", "x".getBytes(UTF_8)))
    assert(ok.isNullAt(5))
  }

  // --- content codings -------------------------------------------------

  test("Content-Encoding: gzip with a real JDK (dynamic-Huffman) stream") {
    val html = ("<p>" + "dynamic huffman body " * 200 + "</p>")
    val r = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\nContent-Encoding: gzip\r\n\r\n",
      jdkGzip(html.getBytes(UTF_8))))
    assert(textOf(r) == html)
  }

  test("Content-Encoding: deflate accepts both zlib-wrapped and raw streams") {
    val html = "deflate body " * 50
    for (enc <- Seq(jdkZlib _, jdkRawDeflate _)) {
      val r = row(msg(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Encoding: deflate\r\n\r\n",
        enc(html.getBytes(UTF_8))))
      assert(r != null && textOf(r) == html)
    }
  }

  test("x-gzip alias and identity coding are accepted; unknown coding fails closed") {
    val body = "aliased".getBytes(UTF_8)
    val xg = row(msg("HTTP/1.1 200 OK\r\nContent-Encoding: x-gzip\r\n\r\n", jdkGzip(body)))
    assert(textOf(xg) == "aliased")
    val id = row(msg("HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\n\r\n", body))
    assert(textOf(id) == "aliased")
    assert(row(msg("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n", body)) == null)
  }

  // --- chunked transfer ------------------------------------------------

  test("chunked framing: multi-chunk, uppercase hex, extensions, trailers") {
    val body = "A" * 300 // forces a 0x100 chunk + a 0x2C remainder via fixture encoder
    val wire = Warc.chunkedEncode(body.getBytes(UTF_8))
    val r = row(msg(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n", wire))
    assert(textOf(r) == body)
    // hand-built: uppercase hex size, chunk extension, trailer header
    val fancy = ("5;ext=1\r\nhello\r\nC\r\n brave world\r\n0\r\n" +
      "X-Trailer: t\r\n\r\n").getBytes(US_ASCII)
    val r2 = row(msg("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n", fancy))
    assert(textOf(r2) == "hello brave world")
  }

  test("gzip-then-chunked composes (the real-wire combination)") {
    val html = "<p>combined encodings</p>" * 40
    val wire = Warc.chunkedEncode(jdkGzip(html.getBytes(UTF_8)))
    val r = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n\r\n",
      wire))
    assert(textOf(r) == html)
  }

  test("chunked malformations fail closed") {
    val h = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    assert(row(msg(h, "zz\r\nhello\r\n0\r\n\r\n".getBytes(US_ASCII))) == null) // bad hex
    assert(row(msg(h, "6\r\nhello\r\n0\r\n\r\n".getBytes(US_ASCII))) == null) // size/CRLF drift
    assert(row(msg(h, "5\r\nhello\r\n".getBytes(US_ASCII))) == null) // no terminator
    assert(row(msg(h, "5\r\nhello\r\n0\r\n\r\nextra".getBytes(US_ASCII))) == null) // garbage
    // adversarial sizes: 8 hex digits wrap a 32-bit accumulator — must
    // null, never throw (the size can also never exceed the buffer)
    assert(row(msg(h, "ffffffff\r\nxx\r\n0\r\n\r\n".getBytes(US_ASCII))) == null)
    assert(row(msg(h, "7fffffff\r\nxx\r\n0\r\n\r\n".getBytes(US_ASCII))) == null)
    assert(row(msg(h, "10000\r\nxx\r\n0\r\n\r\n".getBytes(US_ASCII))) == null)
  }

  // --- envelope malformations ------------------------------------------

  test("malformed envelopes fail closed") {
    assert(row("no status line\r\n\r\nbody".getBytes(US_ASCII)) == null)
    assert(row("HTTP/1.1 200 OK\r\nno-header-end".getBytes(US_ASCII)) == null)
    assert(row(msg("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n",
      "not gzip".getBytes(US_ASCII))) == null)
    // fold with no preceding header line
    assert(row(" folded: x\r\n\r\n".getBytes(US_ASCII)) == null)
  }

  // --- fixture length formula ------------------------------------------

  test("responsePayload self-check: rendered length equals the oracle formula on all axes") {
    // ids covering every (enc, status, ct) combination incl. id%6==5
    for (id <- 0L until 60L) {
      val html = "<p>" + ("word " * (id.toInt % 97 + 1)) + "</p>"
      val p = Warc.responsePayload(id, html) // internal require() is the assert
      assert(p.length ==
        Warc.responsePayloadLen(id, html.getBytes(UTF_8).length.toLong))
      // and the engine decodes it back to the exact html
      val r = row(p)
      assert(r != null && r.getInt(0) == 200 && textOf(r) == html)
    }
  }

  test("stored-block gzip encoder output is valid for the engine inflate at >64KiB") {
    val big = Array.tabulate(200000)(i => (i % 251).toByte) // 4 stored blocks
    val enc = Warc.gzipStored(big)
    assert(java.util.Arrays.equals(GzipCodec.gunzip(enc), big))
  }
}
