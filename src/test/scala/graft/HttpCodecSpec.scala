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

  // --- WHATWG sniff order: BOM → header → meta → default ---------------

  private def usedOf(r: org.apache.spark.sql.catalyst.expressions.GenericInternalRow) =
    r.getUTF8String(6).toString
  private def sourceOf(r: org.apache.spark.sql.catalyst.expressions.GenericInternalRow) =
    r.getUTF8String(7).toString
  private def fffdOf(r: org.apache.spark.sql.catalyst.expressions.GenericInternalRow) =
    r.getLong(8)

  test("every registry charset decodes its script under a header declaration") {
    for (((label, _, text), slot) <- graft.operators.Charsets.Slots.zipWithIndex) {
      val id = slot.toLong * 4 // mode 0 of that slot
      val r = row(graft.operators.Charsets.responsePayload(id))
      assert(r != null, s"$label parse")
      assert(usedOf(r) == label && sourceOf(r) == "header", s"$label sniff")
      assert(textOf(r).contains(text), s"$label text survived the legacy round trip")
      assert(fffdOf(r) == 0L, s"$label clean decode")
    }
  }

  test("meta prescan: bare text/html header, charset only in <meta>") {
    val html = "<html><head><meta charset=\"shift_jis\"></head><body>" +
      "コンピュータ</body></html>"
    val r = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
      html.getBytes(java.nio.charset.Charset.forName("Shift_JIS"))))
    assert(usedOf(r) == "shift_jis" && sourceOf(r) == "meta")
    assert(textOf(r) == html)
    // http-equiv form resolves too
    val h2 = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1251\"></head><body>да</body></html>"
    val r2 = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
      h2.getBytes(java.nio.charset.Charset.forName("windows-1251"))))
    assert(usedOf(r2) == "windows-1251" && sourceOf(r2) == "meta" && textOf(r2) == h2)
  }

  test("meta prescan is HTML-only: a binary payload cannot steer its own decode") {
    // a declared-binary body containing the BYTES `<meta charset=..>`
    // (e.g. inside a PDF string) must not reach the prescan tier
    val body = "%PDF-1.4 <meta charset=\"shift_jis\"> junk".getBytes(US_ASCII)
    val r = row(msg("HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n", body))
    assert(usedOf(r) == "utf-8" && sourceOf(r) == "default")
    // while the same bytes under text/html DO prescan
    val r2 = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n", body))
    assert(usedOf(r2) == "shift_jis" && sourceOf(r2) == "meta")
  }

  test("meta prescan is attribute-aware and skips comment spans (WHATWG)") {
    def sniff(html: String) = {
      val r = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
        html.getBytes(UTF_8)))
      (usedOf(r), sourceOf(r))
    }
    // a commented-out meta must NOT steer the decode
    assert(sniff("<!-- <meta charset=\"big5\"> --><p>x</p>") == ("utf-8", "default"))
    // an UNTERMINATED comment swallows the rest of the window
    assert(sniff("<!-- oops <meta charset=\"big5\"><p>x</p>") == ("utf-8", "default"))
    // 'charset=' inside an unrelated attribute VALUE is not a declaration
    assert(sniff("<meta name=\"desc\" content=\"charset=big5 is common\">") ==
      ("utf-8", "default"))
    assert(sniff("<meta data-x=\"charset=big5\">") == ("utf-8", "default"))
    // content='…charset=…' counts ONLY under http-equiv Content-Type
    assert(sniff("<meta http-equiv='Content-Type' content='text/html; charset=big5'>") ==
      ("big5", "meta"))
    // attribute order is free
    assert(sniff("<meta content=\"text/html; charset=big5\" http-equiv=\"content-type\">") ==
      ("big5", "meta"))
    // a comment BEFORE a real declaration: the real one still wins
    assert(sniff("<!-- nav --><meta charset=\"big5\"><p>x</p>") == ("big5", "meta"))
    // unquoted attribute value form
    assert(sniff("<meta charset=big5>") == ("big5", "meta"))
  }

  test("meta prescan window is 1024 bytes — a tag beyond it is ignored") {
    val pad = "<!-- " + ("x" * 1100) + " -->"
    val html = pad + "<meta charset=\"windows-1251\">ok"
    val r = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
      html.getBytes(UTF_8)))
    assert(usedOf(r) == "utf-8" && sourceOf(r) == "default")
  }

  test("BOM-less UTF-16 first-bytes sniff: <\\0 → LE, \\0< → BE; header still outranks it") {
    val html = "<html><body>넓은 세계 wide</body></html>"
    for ((cs, label) <- Seq(
        java.nio.charset.StandardCharsets.UTF_16LE -> "utf-16le",
        java.nio.charset.StandardCharsets.UTF_16BE -> "utf-16be")) {
      val r = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
        html.getBytes(cs)))
      assert(usedOf(r) == label && sourceOf(r) == "sniff16", label)
      assert(textOf(r) == html)
      assert(fffdOf(r) == 0L)
    }
    // a meta tag in BOM-less UTF-16 is NUL-interleaved — the ASCII
    // prescan cannot see it, and sniff16 must still decode the page
    val metaHtml = "<html><head><meta charset=\"utf-16le\"></head><body>넓은</body></html>"
    val rm = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
      metaHtml.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)))
    assert(usedOf(rm) == "utf-16le" && sourceOf(rm) == "sniff16" && textOf(rm) == metaHtml)
    // a DECLARED header outranks the first-bytes sniff (WHATWG order)
    val rh = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-16le\r\n\r\n",
      html.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)))
    assert(usedOf(rh) == "utf-16le" && sourceOf(rh) == "header" && textOf(rh) == html)
    // binary payloads never reach the sniff (htmlish gate)
    val rb = row(msg("HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n",
      html.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)))
    assert(sourceOf(rb) == "default")
  }

  test("ISO-2022-JP escape-sequence pages decode under header and meta declarations") {
    val cs = java.nio.charset.Charset.forName("ISO-2022-JP")
    val ja = graft.operators.TextOps.UnicodeFixture.toMap.apply("ja")
    val html = s"<html><body>$ja</body></html>"
    assert(new String(html.getBytes(cs), cs) == html, "fixture text must round-trip ISO-2022-JP")
    val r = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-2022-jp\r\n\r\n",
      html.getBytes(cs)))
    assert(usedOf(r) == "iso-2022-jp" && sourceOf(r) == "header" && textOf(r) == html)
    val metaHtml = s"<html><head><meta charset=\"iso-2022-jp\"></head><body>$ja</body></html>"
    val rm = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
      metaHtml.getBytes(cs)))
    assert(usedOf(rm) == "iso-2022-jp" && sourceOf(rm) == "meta" && textOf(rm) == metaHtml)
  }

  test("BOM wins over a lying header; the BOM is stripped from the text") {
    val body = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "plain é".getBytes(UTF_8)
    val r = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=shift_jis\r\n\r\n", body))
    assert(usedOf(r) == "utf-8" && sourceOf(r) == "bom")
    assert(textOf(r) == "plain é") // no U+FEFF
    // and the declared label is still surfaced verbatim
    assert(r.getUTF8String(2).toString == "shift_jis")
    for ((le, label) <- Seq(true -> "utf-16le", false -> "utf-16be")) {
      val cs = if (le) java.nio.charset.StandardCharsets.UTF_16LE
               else java.nio.charset.StandardCharsets.UTF_16BE
      val bom: Array[Byte] = if (le) Array(0xff.toByte, 0xfe.toByte)
                             else Array(0xfe.toByte, 0xff.toByte)
      val r16 = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
        bom ++ "wide 世界".getBytes(cs)))
      assert(usedOf(r16) == label && sourceOf(r16) == "bom" && textOf(r16) == "wide 世界")
    }
  }

  test("unknown header label falls through to the meta tier, browser-style") {
    val html = "<meta charset=\"gb2312\">中文"
    val r = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=x-klingon\r\n\r\n",
      html.getBytes(java.nio.charset.Charset.forName("GBK"))))
    // gb2312 resolves to its WHATWG superset GBK
    assert(usedOf(r) == "gbk" && sourceOf(r) == "meta" && textOf(r) == html)
  }

  test("n_fffd counts every replacement the lenient decode emitted") {
    val body = "ok ".getBytes(US_ASCII) ++
      Array(0xff.toByte, 0xfe.toByte, 0x41.toByte) // 2 bad bytes mid-body + 'A'
    val r = row(msg("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n",
      "see: ".getBytes(US_ASCII) ++ body))
    assert(sourceOf(r) == "default" && fffdOf(r) == 2L)
    val clean = row(msg("HTTP/1.1 200 OK\r\n\r\n", "fine".getBytes(UTF_8)))
    assert(fffdOf(clean) == 0L)
    // a page whose SOURCE legitimately contains U+FFFD (upstream
    // mojibake re-served verbatim — common on the real web) decodes
    // with ZERO replacement events: n_fffd counts decode errors, not
    // replacement characters in the output (review finding)
    val served = row(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n",
      "already � damaged � upstream".getBytes(UTF_8)))
    assert(fffdOf(served) == 0L)
    assert(textOf(served) == "already � damaged � upstream")
  }

  test("charset fixture: every mode decodes to its predicted text") {
    import graft.operators.Charsets
    val nIds = 4 * Charsets.Slots.size * 3 // modes × slots × bom/k values
    for (id <- 0L until nIds.toLong) {
      val r = row(Charsets.responsePayload(id))
      assert(r != null, s"doc $id")
      val slot = Charsets.slotOf(id)
      val (label, _, text) = Charsets.Slots(slot)
      Charsets.modeOf(id) match {
        case 0 =>
          assert(textOf(r) == Charsets.htmlNoMeta(id, text) &&
            usedOf(r) == label && sourceOf(r) == "header")
        case 1 =>
          // the BOM-less UTF-16 slot's meta tag is invisible to the
          // ASCII prescan; the first-bytes sniff decides instead
          val expectSource = if (slot == Charsets.Utf16Slot) "sniff16" else "meta"
          assert(textOf(r) == Charsets.htmlMeta(id, label, text) &&
            usedOf(r) == label && sourceOf(r) == expectSource, s"doc $id")
        case 2 =>
          assert(textOf(r) == Charsets.htmlNoMeta(id, text) &&
            usedOf(r) == Charsets.BomLabels(Charsets.bomEncOf(id)) &&
            sourceOf(r) == "bom")
        case _ =>
          assert(fffdOf(r) == Charsets.fffdOf(id).toLong &&
            sourceOf(r) == "default" &&
            textOf(r) == Charsets.mojibakeBase(id) + ("�" * Charsets.fffdOf(id)))
      }
    }
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
