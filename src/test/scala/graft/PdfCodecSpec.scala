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

  test("multi-digit indirect /Length fails closed (no backtracking mis-parse)") {
    // regression (review finding): (\d+)(?!\s+0\s+R) backtracked
    // '/Length 10 0 R' into len=1 instead of failing
    val s = new String(PdfCodec.render("some document text", flate = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    for (ind <- Seq("10 0 R", "123 0 R")) {
      val bad = s.replaceFirst("/Length \\d+", s"/Length $ind")
      assert(PdfCodec.extract(bad.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)) == null, ind)
    }
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
