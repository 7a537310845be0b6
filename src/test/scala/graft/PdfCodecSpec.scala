package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PdfCodec

/** The hand-rolled PDF text extractor: round trips (escapes, kerned TJ
  * splits, FlateDecode), documented-cut behavior (indirect /Length
  * fails closed), and the malformation matrix.
  */
class PdfCodecSpec extends AnyFunSuite {

  private def textOf(b: Array[Byte]): String = {
    val r = PdfCodec.extract(b)
    assert(r != null, "extract returned null")
    r.getUTF8String(0).toString
  }

  test("round trip: plain and FlateDecoded content streams, escapes, parens, backslashes") {
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog.",
      "parens (nested (deep)) and \\ backslash and ) stray",
      "tab\tand ... punctuation; digits 123, symbols #%&*",
      "a", "ab", "abc", // tiny split edge cases
      "x" * 5000) // multi-hundred-byte stream
    for (t <- cases; flate <- Seq(false, true)) {
      val pdf = PdfCodec.render(t, flate)
      assert(textOf(pdf) == t, s"flate=$flate text='${t.take(30)}...'")
      val r = PdfCodec.extract(pdf)
      assert(r.getInt(1) == 5 && r.getInt(2) == 1) // 5 objects, 1 stream
    }
  }

  test("octal escapes decode per spec") {
    // patch a rendered (uncompressed) PDF's first Tj literal with an
    // EQUAL-LENGTH octal form so every offset and /Length stays valid:
    // "(AAAAA)" (7 chars) → "(\101A)" (7 chars) which decodes to "AA"
    val base = "A" * 10 // Tj carries the first half: "AAAAA"
    val pdf = new String(PdfCodec.render(base, flate = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val patched = pdf.replaceFirst("\\(AAAAA\\)", "(\\\\101A)")
    assert(patched != pdf)
    val out = PdfCodec.extract(patched.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    // decoded first half "AA" + untouched second half "AAAAA"
    assert(out != null && out.getUTF8String(0).toString == "A" * 7)
  }

  test("PDF 1.5 layout round-trips: xref STREAM + object stream, 7 objects, 1 text stream") {
    val cases = Seq(
      "modern layout document text with GET and ET words",
      "short", "x" * 3000)
    for (t <- cases; flate <- Seq(false, true)) {
      val pdf = PdfCodec.render15(t, flate)
      val r = PdfCodec.extract(pdf)
      assert(r != null, s"flate=$flate '${t.take(20)}'")
      assert(r.getUTF8String(0).toString == t)
      assert(r.getInt(1) == 7, "3 direct + 4 compressed objects")
      assert(r.getInt(2) == 1, "only the content stream is op-scanned")
    }
    // malformations specific to the 1.5 path fail closed
    val good = PdfCodec.render15("valid document", flate = true)
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    def mut(pat: String, repl: String): Any = {
      val b = s.replaceFirst(pat, java.util.regex.Matcher.quoteReplacement(repl))
      assert(b != s, s"pattern $pat did not match")
      PdfCodec.extract(b.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }
    // corrupt the xref stream's W widths
    assert(mut("/W \\[1 4 2\\]", "/W [1 9 2]") == null)
    // truncate the xref stream body
    assert(PdfCodec.extract(good.dropRight(30)) == null)
    // crafted overflow classes must NULL, never crash or garble-open
    // (review findings: uncaught NumberFormatException / Int wrap)
    assert(mut("/W \\[1 4 2\\]", "/W [1 99999999999 2]") == null)
    assert(mut("/Size 8", "/Size 99999999999") == null)
    assert(mut("/Size 8", "/Size 8 /Index [0 2000000000 0 2000000000]") == null)
    // a type-2 container that is NOT a real ObjStm in the table must
    // fail (counted-and-framing-validated, actually enforced): point
    // the ObjStm type elsewhere so containers reference a non-ObjStm
    assert(mut("/Type /ObjStm", "/Type /Other1") == null)
    // and an /N that disagrees with the type-2 entry count must fail
    assert(mut("/N 4 /First", "/N 3 /First") == null)
  }

  test("operator tokens inside literals do not truncate: 'GET/SET/BT/ET' text round-trips") {
    // regression (review finding): a raw indexOf("ET") scan cut the
    // BT..ET segment at the 'ET' inside '(GET ...)' and nulled the doc
    val cases = Seq(
      "GET data from the server and SET the flag",
      "the BITSET and BT and ET tokens appear in prose",
      "Tj TJ BT ET all as words inside the literal")
    for (t <- cases; flate <- Seq(false, true))
      assert(textOf(PdfCodec.render(t, flate)) == t, s"flate=$flate '$t'")
  }

  test("only Tj/TJ-consumed literals contribute; stray literals do not") {
    // hand-patch: replace the '72 720' Td coordinates with a same-
    // length '(qq) 0' — a literal consumed by Td (not Tj/TJ) must add
    // nothing (the old scanner appended every literal in sight)
    val pdf = new String(PdfCodec.render("abcdefgh", flate = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val patched = pdf.replaceFirst("72 720", "(qq) 0")
    assert(patched != pdf)
    val out = PdfCodec.extract(patched.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(out != null && out.getUTF8String(0).toString == "abcdefgh")
  }

  test("UNRESOLVABLE indirect /Length fails closed (no backtracking mis-parse)") {
    // regression (review finding): (\d+)(?!\s+0\s+R) backtracked
    // '/Length 10 0 R' into len=1 instead of failing; with the
    // resolver, a reference to an object ABSENT from the xref table
    // must still fail closed, never mis-parse
    val s = new String(PdfCodec.render("some document text", flate = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    for (ind <- Seq("10 0 R", "123 0 R")) {
      val bad = s.replaceFirst("/Length \\d+", s"/Length $ind")
      assert(PdfCodec.extract(bad.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)) == null, ind)
    }
  }

  test("incremental update: newest xref wins, decoy never extracted, indirect /Length resolves") {
    for (t <- Seq("the updated page text.", "x" * 500); flate <- Seq(false, true)) {
      val pdf = PdfCodec.renderWithUpdate(t, flate)
      val r = PdfCodec.extract(pdf)
      assert(r != null, s"flate=$flate")
      val text = r.getUTF8String(0).toString
      assert(text == t, s"flate=$flate got '$text'")
      assert(!text.contains("STALE"), "decoy text leaked from the shadowed base")
      // 4 surviving base objects + the update's content stream + its
      // indirect-length integer object; exactly ONE live text stream
      assert(r.getInt(1) == 6 && r.getInt(2) == 1)
    }
  }

  test("/Prev cycle and self-reference fail closed (chain walk is capped)") {
    val s = new String(PdfCodec.renderWithUpdate("cycle test text", flate = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // point the update's /Prev at the update's OWN xref section (the
    // offset its startxref names): the visited-offset set must trip,
    // not loop
    val sxAt = s.lastIndexOf("startxref")
    val selfOff = s.substring(sxAt + 9, s.lastIndexOf("%%EOF")).trim.toInt
    val cyc = s.replaceFirst("/Prev \\d+", s"/Prev $selfOff")
    assert(cyc != s)
    assert(PdfCodec.extract(cyc.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)) == null)
    // /Prev into the middle of nowhere
    val junk = s.replaceFirst("/Prev \\d+", "/Prev 3")
    assert(PdfCodec.extract(junk.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)) == null)
  }

  test("xref claims are validated against object headers: one offset cannot serve two numbers") {
    // patch the base table's entry for object 5 to point at object 4's
    // offset: the duplicate-offset amplification vector — the header
    // at that offset says '4 0 obj', so the claim for 5 must fail the
    // file closed (review finding)
    val pdf = PdfCodec.render("amplification guard text", flate = false)
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xrefAt = s.indexOf("\nxref\n") + 1 // NOT lastIndexOf: 'startxref' contains 'xref'
    val table = s.substring(xrefAt)
    // entries are fixed-width lines: header 'xref\n0 6\n' then 6 rows
    val rows = table.split("\n", -1)
    val obj4row = rows(6) // 0=xref,1='0 6',2..7 entries for obj 0..5
    val patched = s.substring(0, xrefAt) +
      (rows.take(7) ++ Array(obj4row.take(18) + rows(7).drop(18)) ++ rows.drop(8))
        .mkString("\n")
    assert(patched != s)
    assert(PdfCodec.extract(patched.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)) == null)
  }

  test("unescaped CR / CRLF inside literal strings read as LF (§7.3.4.2)") {
    // equal-length patches keep every offset and /Length valid
    val base = "A" * 10 // first-half Tj literal: "(AAAAA)"
    val pdf = new String(PdfCodec.render(base, flate = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val cr = pdf.replaceFirst("\\(AAAAA\\)", "(AA\rAA)")
    assert(cr != pdf)
    val r1 = PdfCodec.extract(cr.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(r1 != null && r1.getUTF8String(0).toString == "AA\nAA" + "AAAAA")
    val crlf = pdf.replaceFirst("\\(AAAAA\\)", "(A\r\nAA)")
    val r2 = PdfCodec.extract(crlf.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(r2 != null && r2.getUTF8String(0).toString == "A\nAA" + "AAAAA")
    // the \r ESCAPE still yields a real CR (escapes are not EOLs)
    val esc = pdf.replaceFirst("\\(AAAAA\\)", "(A\\\\rAA)")
    val r3 = PdfCodec.extract(esc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(r3 != null && r3.getUTF8String(0).toString == "A\rAA" + "AAAAA")
  }

  test("CID/Type0 text round-trips through the ToUnicode CMap (bfchar + bfrange)") {
    val cases = Seq(
      "漢字 と かな mixed with ascii.",          // scattered CJK → bfchars
      "abcdefgh ijkl mnop.",                     // ASCII run → one long bfrange
      "고양이 는 따뜻한 방 에서 조용히 잠 을 잡니다 .",
      "Компьютеры быстро обрабатывают данные.",
      "電腦 在 網路 上 快速 處理 大量 資料 。")
    for (t <- cases; flate <- Seq(false, true)) {
      val pdf = PdfCodec.renderCjk(t, flate)
      val r = PdfCodec.extract(pdf)
      assert(r != null, s"flate=$flate '$t'")
      assert(r.getUTF8String(0).toString == t, s"flate=$flate")
      // catalog, pages, page, content, font, CMap — CMap never op-scanned
      assert(r.getInt(1) == 6 && r.getInt(2) == 1)
    }
    // every Charsets slot text must survive the CID round trip (the
    // q_pdf_cjk fixture contract)
    for ((label, _, text) <- graft.operators.Charsets.Slots) {
      val r = PdfCodec.extract(PdfCodec.renderCjk(text, flate = true))
      assert(r != null && r.getUTF8String(0).toString == text, label)
    }
  }

  test("CMap failure modes: unmapped CID, array-form bfrange, odd hex all fail closed") {
    val pdf = new String(PdfCodec.renderCjk("abcd efgh.", flate = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // point a content hex string at a CID the CMap does not carry:
    // 'FFFF' is unmapped (only ~10 CIDs assigned)
    val iTj = pdf.indexOf("> Tj")
    val unmapped = pdf.substring(0, iTj - 4) + "FFFF" + pdf.substring(iTj)
    assert(PdfCodec.extract(unmapped.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)) == null, "unmapped CID")
    // array-form bfrange: documented cut, must fail closed (the patch
    // keeps length by replacing an equal-length span)
    val iRange = pdf.indexOf("beginbfrange")
    if (iRange >= 0) {
      val iFirst = pdf.indexOf('<', iRange)
      val arr = pdf.substring(0, iFirst) + "[" + pdf.substring(iFirst + 1)
      assert(PdfCodec.extract(arr.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)) == null, "array bfrange")
    }
    // odd nibble count in a content hex string
    val odd = pdf.substring(0, iTj) + "0" + pdf.substring(iTj + 1)
    assert(PdfCodec.extract(odd.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)) == null, "odd hex")
  }

  test("malformed PDFs fail closed, never throw") {
    val good = PdfCodec.render("valid document text here", flate = true)
    assert(PdfCodec.extract(null) == null)
    assert(PdfCodec.extract(Array.emptyByteArray) == null)
    assert(PdfCodec.extract("not a pdf at all".getBytes("US-ASCII")) == null)
    assert(PdfCodec.extract(good.dropRight(6)) == null) // no %%EOF
    // corrupt the startxref offset digits
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val bad1 = s.replaceAll("startxref\n\\d+", "startxref\n999999999")
    assert(PdfCodec.extract(bad1.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)) == null)
    // corrupt the zlib stream body
    val idx = s.indexOf("stream\n") + 8
    val c = good.clone(); c(idx) = (c(idx) ^ 0x55).toByte
    assert(PdfCodec.extract(c) == null)
    // indirect /Length is a documented cut: must null, not misparse
    val bad2 = s.replaceFirst("/Length \\d+", "/Length 9 0 R")
    assert(PdfCodec.extract(bad2.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)) == null)
  }
}
