package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal-but-real PDF TEXT extractor — the non-HTML document tier a
  * crawl corpus can't skip (the PDF fraction of a real crawl is
  * material training text). Hand-rolled from the public PDF 1.x
  * spec (ISO 32000) under the repo codec discipline: strict
  * fail-closed parse, bomb caps, fixture encoder on the staging side,
  * the hand-rolled inflate ([[GzipCodec.zlibInflate]]) doing
  * FlateDecode.
  *
  * Supported (the subset that covers text-bearing crawl documents):
  * header/%%EOF framing, `startxref` + BOTH cross-reference forms —
  * the classic xref TABLE and the PDF 1.5+ xref STREAM (W-width
  * big-endian binary entries, /Index subsections, FlateDecoded) with
  * type-2 entries into OBJECT STREAMS (compressed objects carry
  * dictionaries, never page text, so they are counted and framing-
  * validated through their container, not dereferenced) — /Prev
  * INCREMENTAL-UPDATE chains (newest entry wins per object number,
  * cycle-capped; every Acrobat-style "save" appends one) —
  * `obj…endobj` object framing, dictionary scan, `stream…endstream`
  * payloads with direct OR one-hop indirect /Length (`N G R` to a
  * plain integer object, as generators that write the stream before
  * its length emit), /FlateDecode content streams, and the text
  * operators inside BT…ET — `(…) Tj`, `[(…) kern (…)] TJ` (kerning
  * numbers skipped), with full literal-string escape handling
  * (\\ \( \) \n \r \t \b \f, octal, line continuations, EOL-in-string
  * normalization per §7.3.4.2) — plus CID/Type0 (Identity-H) text:
  * HEX strings are decoded as 2-byte CIDs through the font's
  * /ToUnicode CMap (bfchar + contiguous bfrange), the layout CJK
  * documents essentially always use. Metadata/binary streams (/XRef,
  * /ObjStm, /Subtype /Image, ToUnicode CMaps) are never op-scanned.
  * Documented cuts: encryption, array-form bfrange destinations, and
  * 1-byte CID codespaces — each a further tier, not a correctness
  * risk: files using them fail CLOSED, never garbled-open.
  *
  * Reference cell: the byte-chunk source boundary
  * (/root/reference/src/Data/Conduino/Combinators.hs:280-297) — like
  * WARC/HTTP/gzip, PDF is one more framing layer between crawl bytes
  * and text.
  */
object PdfCodec {

  private val MaxObjects = 1 << 16
  private val MaxTextOut = 16 << 20

  // ---------------------------------------------------------------------
  // Fixture-side renderer
  // ---------------------------------------------------------------------

  /** Escape a string for a PDF literal string `(...)`. */
  private[functions] def escapeString(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      // raw CR/LF inside a literal would be READ as LF (§7.3.4.2 EOL
      // normalization, honored by decodeLiteral) — escape both so the
      // fixture round-trips texts containing either verbatim
      case '\r' => "\\r"
      case '\n' => "\\n"
      case c => c.toString
    }

  private def zlib(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** The shared content stream of both fixture layouts: the doc text
    * split across a Tj and a kerned TJ, optionally real-zlib'd.
    * Latin-1 only — PDF literal strings are byte strings; non-latin-1
    * needs font/encoding machinery out of this tier's scope, so
    * staging fails LOUDLY rather than silently mangling to '?'
    * (review finding).
    */
  private def contentStream(text: String, flate: Boolean): (Array[Byte], String) = {
    require(text.forall(_ <= '\u00ff'),
      "PdfCodec fixture: text contains non-latin-1 characters the fixture cannot carry")
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val a = text.substring(0, text.length / 2)
    val rest = text.substring(text.length / 2)
    val b1 = rest.substring(0, rest.length / 2)
    val b2 = rest.substring(rest.length / 2)
    val content = ("BT /F1 12 Tf 72 720 Td (" + escapeString(a) + ") Tj [(" +
      escapeString(b1) + ") -250 (" + escapeString(b2) + ")] TJ ET")
      .getBytes(ascii)
    (if (flate) zlib(content) else content,
      if (flate) " /Filter /FlateDecode" else "")
  }

  /** Render a complete classic (1.4) single-page PDF whose content
    * stream carries `text` split across a Tj and a kerned TJ (so
    * extraction must CONCATENATE operators in order and skip the kern
    * numbers); `flate` compresses the content stream with real zlib.
    * The doc text must round-trip the extractor exactly.
    */
  def render(text: String, flate: Boolean): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val (data, filter) = contentStream(text, flate)
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
      null, // the stream object, rendered specially
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bos = new java.io.ByteArrayOutputStream(data.length + 1024)
    def w(s: String): Unit = bos.write(s.getBytes(ascii), 0, s.length)
    w("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = bos.size()
      w(s"${i + 1} 0 obj\n")
      if (body != null) w(body + "\n")
      else {
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        bos.write(data, 0, data.length)
        w("\nendstream\n")
      }
      w("endobj\n")
    }
    val xrefOff = bos.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    (1 to objs.length).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF")
    bos.toByteArray
  }

  /** Render a classic PDF then APPEND an Acrobat-style incremental
    * update that REPLACES the page's content stream: the base document
    * carries a decoy text ("STALE …"), the update a new object 4 with
    * the REAL text — using an INDIRECT /Length (object 6, written
    * after the stream, as generators do) — plus an xref section whose
    * trailer /Prev chains to the base table. Extraction must walk the
    * chain newest-first and take the update's object 4 (newest wins);
    * any decoy text in the output proves the chain walk wrong.
    * Merged live objects: 1,2,3,5 (base) + 4,6 (update) = 6; still
    * exactly one live text stream.
    */
  def renderWithUpdate(text: String, flate: Boolean): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val base = render("STALE " + text.reverse, flate)
    // the base's startxref offset (for /Prev)
    val baseStr = new String(base, ascii)
    val sxAt = baseStr.lastIndexOf("startxref")
    val baseXref = baseStr.substring(sxAt + 9, baseStr.lastIndexOf("%%EOF")).trim.toInt
    val (data, filter) = contentStream(text, flate)
    val bos = new java.io.ByteArrayOutputStream(base.length + data.length + 512)
    bos.write(base, 0, base.length)
    def w(s: String): Unit = bos.write(s.getBytes(ascii), 0, s.length)
    w("\n")
    val off4 = bos.size()
    w(s"4 0 obj\n<< /Length 6 0 R$filter >>\nstream\n")
    bos.write(data, 0, data.length)
    w("\nendstream\nendobj\n")
    val off6 = bos.size()
    w(s"6 0 obj\n${data.length}\nendobj\n")
    val xrefOff = bos.size()
    w("xref\n")
    w(f"4 1\n$off4%010d 00000 n \n")
    w(f"6 1\n$off6%010d 00000 n \n")
    w(s"trailer\n<< /Size 7 /Root 1 0 R /Prev $baseXref >>\n")
    w(s"startxref\n$xrefOff\n%%EOF")
    bos.toByteArray
  }

  /** Hex-string form of `text` as 2-byte CIDs under `cids`. */
  private def hexOf(text: String, cids: Map[Int, Int]): String = {
    val sb = new StringBuilder(text.length * 4)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      sb.append(f"${cids(cp)}%04X")
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Render a CID/Type0 (Identity-H) single-page PDF — the layout CJK
    * documents essentially always use: the content stream's strings
    * are 2-byte-CID HEX strings, and the text is recoverable only
    * through the font's /ToUnicode CMap (object 6). CIDs are assigned
    * 1..n over the text's distinct code points in code-point order, so
    * consecutive code points become contiguous bfrange rows and the
    * rest bfchar rows — both forms exercised on any real CJK text. The
    * text is split across a Tj and a kerned TJ exactly like
    * [[render]], so concatenation order is covered too.
    */
  def renderCjk(text: String, flate: Boolean): Array[Byte] = {
    require(text.nonEmpty, "renderCjk: empty text")
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val cps = {
      val b = scala.collection.mutable.SortedSet.empty[Int]
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i); b += cp; i += Character.charCount(cp)
      }
      b.toIndexedSeq
    }
    require(cps.forall(_ <= 0xffff),
      "renderCjk fixture: supplementary-plane text needs surrogate bfranges")
    val cids: Map[Int, Int] = cps.zipWithIndex.map { case (cp, i) => cp -> (i + 1) }.toMap
    // bfchar/bfrange rows: contiguous code-point runs → one bfrange
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (startIdx, len)
    var i = 0
    while (i < cps.length) {
      var j = i + 1
      while (j < cps.length && cps(j) == cps(j - 1) + 1) j += 1
      runs += ((i, j - i)); i = j
    }
    val bfchars = runs.filter(_._2 == 1)
      .map { case (s0, _) => f"<${s0 + 1}%04X> <${cps(s0)}%04X>" }
    val bfranges = runs.filter(_._2 > 1)
      .map { case (s0, l) => f"<${s0 + 1}%04X> <${s0 + l}%04X> <${cps(s0)}%04X>" }
    val cmapBody = new StringBuilder()
      .append("/CIDInit /ProcSet findresource begin 12 dict begin begincmap\n")
    if (bfchars.nonEmpty)
      cmapBody.append(s"${bfchars.length} beginbfchar\n")
        .append(bfchars.mkString("\n")).append("\nendbfchar\n")
    if (bfranges.nonEmpty)
      cmapBody.append(s"${bfranges.length} beginbfrange\n")
        .append(bfranges.mkString("\n")).append("\nendbfrange\n")
    cmapBody.append("endcmap end end\n")
    val cmapRaw = cmapBody.toString.getBytes(ascii)
    val cmapData = if (flate) zlib(cmapRaw) else cmapRaw
    val cmapFilter = if (flate) " /Filter /FlateDecode" else ""
    // content stream: same Tj + kerned-TJ split as contentStream, hex
    val a = text.substring(0, text.length / 2)
    val rest = text.substring(text.length / 2)
    val b1 = rest.substring(0, rest.length / 2)
    val b2 = rest.substring(rest.length / 2)
    val contentRaw = (s"BT /F1 12 Tf 72 720 Td <${hexOf(a, cids)}> Tj [<" +
      hexOf(b1, cids) + "> -250 <" + hexOf(b2, cids) + ">] TJ ET").getBytes(ascii)
    val cData = if (flate) zlib(contentRaw) else contentRaw
    val cFilter = if (flate) " /Filter /FlateDecode" else ""
    val bos = new java.io.ByteArrayOutputStream(cData.length + cmapData.length + 1024)
    def w(s: String): Unit = bos.write(s.getBytes(ascii), 0, s.length)
    w("%PDF-1.4\n")
    val offsets = new Array[Int](7)
    def obj(n: Int)(body: => Unit): Unit = {
      offsets(n) = bos.size()
      w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2)(w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"))
    obj(3)(w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\n"))
    obj(4) {
      w(s"<< /Length ${cData.length}$cFilter >>\nstream\n")
      bos.write(cData, 0, cData.length)
      w("\nendstream\n")
    }
    obj(5)(w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftCJK " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>\n"))
    obj(6) {
      w(s"<< /Length ${cmapData.length}$cmapFilter >>\nstream\n")
      bos.write(cmapData, 0, cmapData.length)
      w("\nendstream\n")
    }
    val xrefOff = bos.size()
    w("xref\n0 7\n")
    w("0000000000 65535 f \n")
    (1 to 6).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF")
    bos.toByteArray
  }

  /** Render the SAME document in the PDF 1.5+ layout real crawls are
    * full of: the catalog/pages/page/font dictionaries live in an
    * OBJECT STREAM (ObjStm), the cross-reference table is a binary
    * XREF STREAM (W-width big-endian entries, FlateDecoded) whose
    * type-2 entries point into the ObjStm — only the content stream,
    * the ObjStm, and the xref stream remain classic `obj` frames.
    * Extraction output contract: same text, 7 objects (3 direct +
    * 4 compressed), 1 text stream.
    */
  def render15(text: String, flate: Boolean): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val (cData, cFilter) = contentStream(text, flate)
    // ObjStm body: pair header (objnum offset-in-body), then bodies
    val bodies = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
      5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodyText = bodies.map(_._2).mkString(" ")
    val bodyOffsets = bodies.map(_._2).scanLeft(0)(_ + _.length + 1).init
    val header = bodies.map(_._1).zip(bodyOffsets)
      .map { case (num, o) => s"$num $o" }.mkString(" ") + " "
    val objStm = zlib((header + bodyText).getBytes(ascii))
    val bos = new java.io.ByteArrayOutputStream(cData.length + objStm.length + 1024)
    def w(str: String): Unit = bos.write(str.getBytes(ascii), 0, str.length)
    w("%PDF-1.5\n")
    val off4 = bos.size()
    w(s"4 0 obj\n<< /Length ${cData.length}$cFilter >>\nstream\n")
    bos.write(cData, 0, cData.length)
    w("\nendstream\nendobj\n")
    val off6 = bos.size()
    w(s"6 0 obj\n<< /Type /ObjStm /N ${bodies.size} /First ${header.length} " +
      s"/Length ${objStm.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(objStm, 0, objStm.length)
    w("\nendstream\nendobj\n")
    val off7 = bos.size()
    // entries for ids 0..7, W = [1 4 2], big-endian
    val rows = Seq[(Int, Long, Int)](
      (0, 0L, 65535),  // 0: free
      (2, 6L, 0),      // 1..3, 5: compressed in ObjStm 6
      (2, 6L, 1),
      (2, 6L, 2),
      (1, off4.toLong, 0),
      (2, 6L, 3),
      (1, off6.toLong, 0),
      (1, off7.toLong, 0))
    val table = new Array[Byte](rows.size * 7)
    rows.zipWithIndex.foreach { case ((t, f2, f3), i) =>
      val p = i * 7
      table(p) = t.toByte
      table(p + 1) = ((f2 >> 24) & 0xff).toByte
      table(p + 2) = ((f2 >> 16) & 0xff).toByte
      table(p + 3) = ((f2 >> 8) & 0xff).toByte
      table(p + 4) = (f2 & 0xff).toByte
      table(p + 5) = ((f3 >> 8) & 0xff).toByte
      table(p + 6) = (f3 & 0xff).toByte
    }
    val xrefData = zlib(table)
    w(s"7 0 obj\n<< /Type /XRef /Size ${rows.size} /W [1 4 2] /Root 1 0 R " +
      s"/Length ${xrefData.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(xrefData, 0, xrefData.length)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$off7\n%%EOF")
    bos.toByteArray
  }

  // ---------------------------------------------------------------------
  // Engine-side strict extractor
  // ---------------------------------------------------------------------

  private def Malformed = PngCodec.Malformed
  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  // hoisted: these run per OBJECT inside the per-record hot path — a
  // per-call Pattern.compile would recompile millions of times at
  // crawl scale (review finding)
  private val ObjHeadPattern =
    java.util.regex.Pattern.compile("^(\\d+)\\s+(\\d+)\\s+obj\\b")
  // direct /Length only: the number must be followed by '/' or '>'
  // (next dict key or dict close) — a lookahead-free anchor that
  // backtracking cannot defeat (the old (?!\\s+0\\s+R) form matched
  // '/Length 10 0 R' as len=1 by backtracking into the digits)
  private val LengthPattern =
    java.util.regex.Pattern.compile("/Length\\s+(\\d+)\\s*(?=[/>])")

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == 12

  // xref entry types, per object number, across the /Prev chain
  private final val TFree = 0
  private final val TUsed = 1
  private final val TStm = 2

  /** /Prev-chain depth cap — real files rarely exceed a handful of
    * incremental saves; a crafted chain must terminate the walk.
    */
  private val MaxXrefSections = 32

  private val PrevPattern = java.util.regex.Pattern.compile("/Prev\\s+(\\d+)")

  /** Parse the classic xref table at `off`; appends (objNum, type,
    * value) rows in section order and returns the trailer's /Prev
    * offset (-1 when the section is the chain root).
    */
  private def parseXref(s: String, off: Int,
      out: scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]): Int = {
    if (off < 0 || off >= s.length) throw Malformed
    var p = off
    if (!s.startsWith("xref", p)) throw Malformed
    p += 4
    while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n' ||
      s.charAt(p) == ' ')) p += 1
    var done = false
    while (!done) {
      // subsection header: "<start> <count>" or the trailer keyword
      if (s.startsWith("trailer", p)) done = true
      else {
        val eol = s.indexOf('\n', p)
        if (eol < 0) throw Malformed
        val hdr = s.substring(p, eol).trim.split("\\s+")
        if (hdr.length != 2) throw Malformed
        val (start, count) =
          try (hdr(0).toInt, hdr(1).toInt)
          catch { case _: NumberFormatException => throw Malformed }
        if (start < 0) throw Malformed
        if (count < 0 || count > MaxObjects || start > MaxObjects) throw Malformed
        p = eol + 1
        var i = 0
        while (i < count) {
          if (p + 18 > s.length) throw Malformed
          val entry = s.substring(p, p + 18)
          val typ = entry.charAt(17)
          if (typ == 'n') {
            val o =
              try entry.substring(0, 10).toInt
              catch { case _: NumberFormatException => throw Malformed }
            out += ((start + i, TUsed, o))
          } else if (typ == 'f') {
            out += ((start + i, TFree, 0))
          } else throw Malformed
          p += 20 // 10 + 1 + 5 + 1 + 1 + 2-byte EOL
          i += 1
        }
      }
    }
    // trailer dict window: up to this section's own startxref keyword
    val sx = s.indexOf("startxref", p)
    val window = s.substring(p, if (sx < 0) math.min(s.length, p + 2048) else sx)
    val pm = PrevPattern.matcher(window)
    if (pm.find()) toIntStrict(pm.group(1)) else -1
  }

  /** Decode a PDF literal string body (between the outer parens,
    * escapes unresolved) into text.
    */
  private def decodeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r') {
        // ISO 32000 §7.3.4.2: an UNESCAPED end-of-line marker inside a
        // literal string is read as LF (CR and CRLF both normalize);
        // the \r ESCAPE below still yields a real CR
        sb.append('\n'); i += 1
        if (i < s.length && s.charAt(i) == '\n') i += 1
      } else if (c != '\\') { sb.append(c); i += 1 }
      else {
        if (i + 1 >= s.length) throw Malformed
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2
            if (i < s.length && s.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < s.length &&
              s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
            }
            sb.append((v & 0xff).toChar)
          case _ => throw Malformed // unknown escape: fail closed
        }
      }
    }
    sb.toString
  }

  /** Pull the text out of one decoded content stream with a real
    * TOKENIZER (a naive indexOf("ET") scan truncated on the 'ET'
    * inside literals like `(GET data)` — review finding): literal
    * strings are consumed as whole tokens (escapes/nesting honored),
    * operator words are matched as standalone tokens, and a literal
    * contributes text ONLY when a `Tj` consumes it (or a `TJ` consumes
    * its enclosing array) inside a BT…ET block — matching the operator
    * semantics instead of appending every string in sight.
    */
  // -------------------------------------------------------------------
  // ToUnicode CMaps (CID/Type0 fonts) — the CJK text tier. A Type0
  // font's strings are 2-byte CIDs; the /ToUnicode CMap (bfchar +
  // contiguous bfrange entries) maps each CID to UTF-16 text.
  // -------------------------------------------------------------------

  private val MaxCMapEntries = 1 << 16
  private val HexTokenPattern =
    java.util.regex.Pattern.compile("<([0-9a-fA-F]+)>")

  /** Parse dst hex (UTF-16BE code units, 1-2 units) into a String. */
  private def cmapDst(hex: String): String = {
    if (hex.length % 4 != 0 || hex.isEmpty || hex.length > 8) throw Malformed
    val sb = new StringBuilder(hex.length / 4)
    var i = 0
    while (i < hex.length) {
      sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar)
      i += 4
    }
    sb.toString
  }

  /** Parse every bfchar/bfrange block in a decoded ToUnicode CMap into
    * `into` (first mapping wins across multiple CMaps). Supported: the
    * 2-byte source codespace Identity-H fonts use, contiguous bfrange
    * destinations (last UTF-16 unit incremented, per the spec's
    * examples); the ARRAY destination form fails closed — garbled CJK
    * is worse than a dropped file.
    */
  private def parseCMap(t: String,
      into: java.util.HashMap[Int, String]): Unit = {
    def blocks(begin: String, end: String): Iterator[String] = {
      var from = 0
      Iterator.continually {
        val b = t.indexOf(begin, from)
        if (b < 0) null
        else {
          val e = t.indexOf(end, b)
          if (e < 0) throw Malformed
          from = e + end.length
          t.substring(b + begin.length, e)
        }
      }.takeWhile(_ != null)
    }
    def srcCode(hex: String): Int = {
      if (hex.length != 4) throw Malformed // 2-byte codespace only
      Integer.parseInt(hex, 16)
    }
    def put(code: Int, dst: String): Unit = {
      if (into.size >= MaxCMapEntries) throw Malformed
      into.putIfAbsent(code, dst)
    }
    for (block <- blocks("beginbfchar", "endbfchar")) {
      if (block.indexOf('[') >= 0) throw Malformed
      val m = HexTokenPattern.matcher(block)
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) toks += m.group(1)
      if (toks.length % 2 != 0) throw Malformed
      var i = 0
      while (i < toks.length) {
        put(srcCode(toks(i)), cmapDst(toks(i + 1)))
        i += 2
      }
    }
    for (block <- blocks("beginbfrange", "endbfrange")) {
      // array destinations carry one dst PER code — a further tier;
      // fail closed rather than mis-map (documented cut)
      if (block.indexOf('[') >= 0) throw Malformed
      val m = HexTokenPattern.matcher(block)
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) toks += m.group(1)
      if (toks.length % 3 != 0) throw Malformed
      var i = 0
      while (i < toks.length) {
        val lo = srcCode(toks(i))
        val hi = srcCode(toks(i + 1))
        val dst = cmapDst(toks(i + 2))
        if (hi < lo || hi - lo >= MaxCMapEntries) throw Malformed
        var c = lo
        while (c <= hi) {
          // increment the LAST UTF-16 unit (spec §9.10.3 example form)
          val d = dst.toCharArray
          val bump = d(d.length - 1) + (c - lo)
          if (bump > 0xffff) throw Malformed
          d(d.length - 1) = bump.toChar
          put(c, new String(d))
          c += 1
        }
        i += 3
      }
    }
  }

  /** Decode a content-stream HEX string's body through the CMap:
    * 2-byte big-endian codes, every code must map (a missing mapping
    * fails the file closed — silent '?' would poison the corpus).
    */
  private def decodeHexCMap(body: String,
      cmap: java.util.HashMap[Int, String]): String = {
    val sb = new StringBuilder(body.length / 4)
    var code = 0
    var nNibbles = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (!(c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0)) {
        val v = Character.digit(c, 16)
        if (v < 0) throw Malformed
        code = (code << 4) | v
        nNibbles += 1
        if (nNibbles == 4) {
          val t = cmap.get(code)
          if (t == null) throw Malformed
          sb.append(t)
          code = 0; nNibbles = 0
        }
      }
      i += 1
    }
    // odd trailing nibbles: spec pads with 0 — but a partial 2-byte
    // CODE cannot be mapped; fail closed
    if (nNibbles != 0) throw Malformed
    sb.toString
  }

  private def extractOps(cs: String, out: StringBuilder,
      cmap: java.util.HashMap[Int, String]): Unit = {
    var i = 0
    var inText = false
    // pending literal(s): the operand stack the next operator consumes
    var pendingSingle: String = null
    val pendingArray = new StringBuilder
    var inArray = false
    def emit(s: String): Unit = {
      out.append(s)
      if (out.length > MaxTextOut) throw Malformed
    }
    def readLiteral(): String = {
      // cs(i) == '(' on entry; returns the decoded body, i past ')'
      var depth = 1
      var j = i + 1
      val sb = new StringBuilder
      while (depth > 0) {
        if (j >= cs.length) throw Malformed
        val cj = cs.charAt(j)
        if (cj == '\\') {
          if (j + 1 >= cs.length) throw Malformed
          sb.append(cj).append(cs.charAt(j + 1)); j += 2
        } else {
          if (cj == '(') depth += 1
          else if (cj == ')') depth -= 1
          if (depth > 0) sb.append(cj)
          j += 1
        }
      }
      i = j
      decodeLiteral(sb.toString)
    }
    @inline def isRegular(c: Char): Boolean =
      !c.isWhitespace && c != '(' && c != ')' && c != '[' && c != ']' &&
        c != '<' && c != '>' && c != '/' && c != '%'
    while (i < cs.length) {
      val c = cs.charAt(i)
      if (c == '(') {
        val lit = readLiteral()
        if (inText) {
          if (inArray) pendingArray.append(lit)
          else pendingSingle = lit
        }
      } else if (c == '[') { inArray = true; pendingArray.setLength(0); i += 1 }
      else if (c == ']') { i += 1 } // the array value is now the pending operand
      else if (c == '<') {
        if (i + 1 < cs.length && cs.charAt(i + 1) == '<') i += 2 // dict open: contents tokenize as before
        else {
          // HEX string. With a ToUnicode CMap in scope these carry the
          // document's CID-encoded (CJK) text; without one, a raw byte
          // string has no Unicode meaning and contributes nothing
          // (pre-CMap behavior, preserved).
          val end = cs.indexOf('>', i + 1)
          if (end < 0) throw Malformed
          val body = cs.substring(i + 1, end)
          i = end + 1
          if (inText && cmap != null) {
            val t = decodeHexCMap(body, cmap)
            if (inArray) pendingArray.append(t)
            else pendingSingle = t
          }
        }
      }
      else if (c == '/') { // name token: skip
        i += 1
        while (i < cs.length && isRegular(cs.charAt(i))) i += 1
      } else if (isRegular(c)) {
        val start = i
        while (i < cs.length && isRegular(cs.charAt(i))) i += 1
        cs.substring(start, i) match {
          case "BT" => inText = true
          case "ET" =>
            inText = false; inArray = false
            pendingSingle = null; pendingArray.setLength(0)
          case "Tj" | "'" | "\"" =>
            if (inText && pendingSingle != null) emit(pendingSingle)
            pendingSingle = null
          case "TJ" =>
            if (inText) emit(pendingArray.toString)
            pendingArray.setLength(0); inArray = false
          case _ => // numbers / other operators: operands stay pending
        }
      } else i += 1
    }
  }

  /** Strict whole-file text extraction; throws Malformed internally,
    * surfaced as null by [[extract]].
    */
  // xref-STREAM dict fields (PDF 1.5+): entry field widths, table
  // size, optional subsection index
  private val WPattern = java.util.regex.Pattern
    .compile("/W\\s*\\[\\s*(\\d+)\\s+(\\d+)\\s+(\\d+)\\s*\\]")
  private val SizePattern = java.util.regex.Pattern
    .compile("/Size\\s+(\\d+)")
  private val IndexPattern = java.util.regex.Pattern
    .compile("/Index\\s*\\[([0-9\\s]*)\\]")
  // typed-stream detection with ANY legal whitespace between the name
  // tokens (a one-key-per-line dict is conforming — review finding)
  private val ObjStmPattern = java.util.regex.Pattern
    .compile("/Type\\s*/ObjStm")
  private val XRefTypePattern = java.util.regex.Pattern
    .compile("/Type\\s*/XRef")
  private val ImageTypePattern = java.util.regex.Pattern
    .compile("/Subtype\\s*/Image")
  private val ObjStmNPattern = java.util.regex.Pattern
    .compile("/N\\s+(\\d+)")

  // indirect /Length reference: `/Length N G R` — resolved ONE hop via
  // the xref table (common in generated PDFs, which write the stream
  // before its length is known)
  private val IndirectLengthPattern =
    java.util.regex.Pattern.compile("/Length\\s+(\\d+)\\s+\\d+\\s+R")

  /** Resolve a plain INTEGER object (`N 0 obj 1234 endobj`) at `off`
    * — the one-hop target of an indirect /Length. The header object
    * number must match the xref claim, and the body must be bare
    * digits (an indirect length pointing at anything else fails
    * closed; no recursion).
    */
  private def resolveIntObject(s: String, off: Int, expectNum: Int): Int = {
    if (off < 0 || off >= s.length) throw Malformed
    val m = ObjHeadPattern.matcher(s.substring(off, math.min(s.length, off + 48)))
    if (!m.find() || toIntStrict(m.group(1)) != expectNum) throw Malformed
    val endObj = s.indexOf("endobj", off)
    // a length object is tiny; a distant endobj means this is not one
    if (endObj < 0 || endObj - off > 64) throw Malformed
    val body = s.substring(off + m.end(), endObj).trim
    if (body.isEmpty || !body.forall(c => c >= '0' && c <= '9')) throw Malformed
    toIntStrict(body)
  }

  /** One `obj … endobj` framing parse at `off`: (object number, dict
    * text, decoded stream data or null). Shared by the object walk and
    * the xref-stream reader. `xrefUsed` (objNum → offset of in-use
    * objects) enables one-hop indirect /Length resolution; when null
    * (the xref stream itself — spec-required to carry a DIRECT
    * /Length) an indirect length fails closed.
    */
  private def parseObjectAt(s: String, bytes: Array[Byte], off: Int,
      xrefUsed: scala.collection.Map[Int, Int] = null): (Int, String, Array[Byte]) = {
    if (off < 0 || off >= s.length) throw Malformed
    val m = ObjHeadPattern.matcher(s.substring(off, math.min(s.length, off + 48)))
    if (!m.find()) throw Malformed
    val objNum = toIntStrict(m.group(1))
    val endObj = s.indexOf("endobj", off)
    if (endObj < 0) throw Malformed
    val streamKw = s.indexOf("stream", off)
    if (streamKw >= 0 && streamKw < endObj) {
      val dict = s.substring(off, streamKw)
      val lm = LengthPattern.matcher(dict)
      val len =
        if (lm.find()) toIntStrict(lm.group(1))
        else if (xrefUsed != null) {
          val im = IndirectLengthPattern.matcher(dict)
          if (!im.find()) throw Malformed
          val lenNum = toIntStrict(im.group(1))
          xrefUsed.get(lenNum) match {
            case Some(lenOff) => resolveIntObject(s, lenOff, lenNum)
            case None => throw Malformed // unresolvable reference
          }
        } else throw Malformed
      var dataStart = streamKw + 6
      if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
      // LONG arithmetic: a crafted /Length near Int.MaxValue must fail
      // the bounds check, not wrap it (review finding)
      if (dataStart.toLong + len > bytes.length) throw Malformed
      if (!s.startsWith("endstream", {
        var q = dataStart + len
        while (q < s.length && (s.charAt(q) == '\r' || s.charAt(q) == '\n')) q += 1
        q
      })) throw Malformed
      val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + len)
      val data =
        if (dict.contains("/FlateDecode")) {
          val inf = GzipCodec.zlibInflate(raw)
          if (inf == null) throw Malformed
          inf
        } else raw
      (objNum, dict, data)
    } else (objNum, s.substring(off, endObj), null)
  }

  /** Digits → Int, Malformed (never NumberFormatException — the
    * fail-closed catch list does not include it) on overflow.
    */
  private def toIntStrict(digits: String): Int = {
    if (digits.length > 9) throw Malformed
    digits.toInt
  }

  /** PDF 1.5+ cross-reference STREAM at `off`: W-width binary entries
    * (big-endian) with /Index subsections assigning object NUMBERS.
    * Appends (objNum, type, value) rows in section order and returns
    * the dict's /Prev offset (-1 at the chain root). Text never lives
    * in an object stream (streams cannot nest in ObjStm), so type-2
    * entries are counted and validated-by-framing via their container,
    * never dereferenced.
    */
  private def parseXrefStream(s: String, bytes: Array[Byte], off: Int,
      out: scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]): Int = {
    val (_, dict, data) = parseObjectAt(s, bytes, off)
    if (data == null || !dict.contains("/XRef")) throw Malformed
    val wm = WPattern.matcher(dict)
    if (!wm.find()) throw Malformed
    val (w1, w2, w3) =
      (toIntStrict(wm.group(1)), toIntStrict(wm.group(2)), toIntStrict(wm.group(3)))
    if (w1 > 8 || w2 > 8 || w3 > 8 || w2 == 0) throw Malformed
    val sm = SizePattern.matcher(dict)
    if (!sm.find()) throw Malformed
    val size = toIntStrict(sm.group(1))
    if (size < 0 || size > MaxObjects) throw Malformed
    val im = IndexPattern.matcher(dict)
    val index: Array[Int] =
      if (im.find()) {
        val nums = im.group(1).trim.split("\\s+").filter(_.nonEmpty).map(toIntStrict)
        if (nums.length % 2 != 0 || nums.length < 2) throw Malformed
        nums
      } else Array(0, size)
    val row = w1 + w2 + w3
    // LONG sum with a per-total cap: two near-MaxInt /Index counts must
    // not wrap past both guards into an empty "success" (review finding)
    val nEntriesL = index.grouped(2).map(_(1).toLong).sum
    if (nEntriesL < 0 || nEntriesL > MaxObjects) throw Malformed
    if (index.exists(n => n < 0 || n > MaxObjects)) throw Malformed
    val nEntries = nEntriesL.toInt
    if (data.length < nEntries.toLong * row) throw Malformed
    @inline def field(base: Int, width: Int): Long = {
      var v = 0L
      var i = 0
      while (i < width) { v = (v << 8) | (data(base + i) & 0xffL); i += 1 }
      v
    }
    var e = 0
    var p = 0
    var sub = 0          // /Index subsection cursor
    var subLeft = index(1)
    var objNum = index(0)
    while (e < nEntries) {
      while (subLeft == 0 && sub + 2 < index.length) {
        sub += 2; objNum = index(sub); subLeft = index(sub + 1)
      }
      if (subLeft == 0) throw Malformed
      val t = if (w1 == 0) 1L else field(p, w1)
      val f2 = field(p + w1, w2)
      t match {
        case 0L => out += ((objNum, TFree, 0))
        case 1L =>
          if (f2 > Int.MaxValue) throw Malformed
          out += ((objNum, TUsed, f2.toInt))
        case 2L =>
          if (f2 > MaxObjects) throw Malformed
          out += ((objNum, TStm, f2.toInt))
        case _ => throw Malformed
      }
      objNum += 1; subLeft -= 1
      p += row
      e += 1
    }
    val pm = PrevPattern.matcher(dict)
    if (pm.find()) toIntStrict(pm.group(1)) else -1
  }

  /** Walk the /Prev chain from the startxref offset, newest section
    * first, merging entries with NEWEST-WINS per object number — the
    * incremental-update rule (ISO 32000 §7.5.6): an Acrobat-style
    * "save" appends objects plus an xref section whose entries shadow
    * the original's. Cycle-capped (visited-offset set + depth bound).
    * Returns (merged objNum → (type, value), xref-STREAM section
    * offsets — already parsed, never re-inflated).
    */
  private def loadXref(s: String, bytes: Array[Byte],
      startOff: Int): (scala.collection.Map[Int, (Int, Int)], Set[Int]) = {
    val merged = scala.collection.mutable.HashMap.empty[Int, (Int, Int)]
    val streamOffs = scala.collection.mutable.HashSet.empty[Int]
    val seen = scala.collection.mutable.HashSet.empty[Int]
    var off = startOff
    var sections = 0
    while (off >= 0) {
      if (off >= s.length || !seen.add(off)) throw Malformed // cycle: fail closed
      sections += 1
      if (sections > MaxXrefSections) throw Malformed
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      val prev =
        if (s.startsWith("xref", off)) parseXref(s, off, rows)
        else { streamOffs += off; parseXrefStream(s, bytes, off, rows) }
      rows.foreach { case (n, t, v) =>
        if (!merged.contains(n)) merged.put(n, (t, v))
      }
      if (merged.size > MaxObjects) throw Malformed
      off = prev
    }
    (merged, streamOffs.toSet)
  }

  // font-dict reference to a ToUnicode CMap stream object
  private val ToUnicodePattern = java.util.regex.Pattern
    .compile("/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R")
  // decoded stream bytes held simultaneously across the two passes —
  // the per-file inflate budget (each stream is separately bounded by
  // GzipCodec.MaxOutput; this bounds their SUM)
  private val MaxTotalStream = 64 << 20

  private def extractImpl(bytes: Array[Byte]): (String, Int, Int) = {
    if (bytes.length < 32) throw Malformed
    val s = new String(bytes, Ascii)
    if (!s.startsWith("%PDF-")) throw Malformed
    val eof = s.lastIndexOf("%%EOF")
    if (eof < 0) throw Malformed
    val sx = s.lastIndexOf("startxref", eof)
    if (sx < 0) throw Malformed
    val xrefOff =
      try s.substring(sx + 9, eof).trim.toInt
      catch { case _: NumberFormatException => throw Malformed }
    if (xrefOff < 0 || xrefOff >= s.length) throw Malformed
    // /Prev incremental-update chain, newest-wins per object number;
    // each section dispatches on what sits at its offset (classic
    // "xref" keyword vs a 1.5+ cross-reference stream object)
    val (xref, xrefStreamOffs) = loadXref(s, bytes, xrefOff)
    val used = xref.iterator
      .collect { case (n, (TUsed, off)) => (n, off) }.toArray
    val usedMap: scala.collection.Map[Int, Int] =
      scala.collection.mutable.HashMap(used.toIndexedSeq: _*)
    val type2Containers = xref.valuesIterator
      .collect { case (TStm, c) => c }.toArray
    var nObjects = type2Containers.length // compressed objects carry no text
    val objStmCapacity = scala.collection.mutable.Map.empty[Int, Int]
    // objects in ascending offset order = document order for the
    // fixture and for every writer that appends objects sequentially
    val ordered = used.sortBy(_._2)
    // PASS 1: parse every in-use object once (framing + inflate), with
    // the xref CLAIM validated against the object header — a crafted
    // table listing one offset under many numbers extracts at most the
    // one whose header matches, killing the duplicate-offset
    // amplification vector (review finding)
    val dicts = new Array[String](ordered.length)
    val datas = new Array[Array[Byte]](ordered.length)
    var totalStream = 0L
    var k = 0
    while (k < ordered.length) {
      val (n, off) = ordered(k)
      nObjects += 1
      if (!xrefStreamOffs.contains(off)) {
        // (xref streams were already parsed + inflated by the chain
        // walk; don't pay the inflate twice per record)
        val (objNum, dict, data) = parseObjectAt(s, bytes, off, usedMap)
        if (objNum != n) throw Malformed
        dicts(k) = dict
        datas(k) = data
        if (data != null) {
          totalStream += data.length
          if (totalStream > MaxTotalStream) throw Malformed
        }
      }
      k += 1
    }
    // collect ToUnicode CMap references from every object dict, then
    // parse the referenced CMap streams (spec-true detection: a CMap
    // is whatever a font's /ToUnicode points at — never content-text
    // sniffing, which a page containing the WORD 'begincmap' defeats)
    val toUniNums = scala.collection.mutable.HashSet.empty[Int]
    k = 0
    while (k < ordered.length) {
      if (dicts(k) != null) {
        val tm = ToUnicodePattern.matcher(dicts(k))
        while (tm.find()) toUniNums += toIntStrict(tm.group(1))
      }
      k += 1
    }
    val cmap = new java.util.HashMap[Int, String]()
    k = 0
    while (k < ordered.length) {
      if (toUniNums.contains(ordered(k)._1)) {
        if (datas(k) == null) throw Malformed // /ToUnicode must be a stream
        parseCMap(new String(datas(k), Ascii), cmap)
      }
      k += 1
    }
    // PASS 2: op-scan content streams in document order. Metadata /
    // binary streams carry no page text: xref streams, object streams,
    // images, and ToUnicode CMaps are never op-scanned.
    val out = new StringBuilder
    var nStreams = 0
    k = 0
    while (k < ordered.length) {
      val dict = dicts(k)
      val data = datas(k)
      if (data != null) {
        if (ObjStmPattern.matcher(dict).find()) {
          val nm = ObjStmNPattern.matcher(dict)
          if (!nm.find()) throw Malformed
          objStmCapacity(ordered(k)._1) = toIntStrict(nm.group(1))
        } else if (!XRefTypePattern.matcher(dict).find() &&
            !ImageTypePattern.matcher(dict).find() &&
            !toUniNums.contains(ordered(k)._1)) {
          nStreams += 1
          extractOps(new String(data, Ascii), out,
            if (cmap.isEmpty) null else cmap)
        }
      }
      k += 1
    }
    // type-2 entries must resolve: every container is a real ObjStm in
    // this table, and the entry count matches the containers' declared
    // /N total — "counted and framing-validated", actually enforced
    // (review finding)
    if (type2Containers.nonEmpty) {
      if (!type2Containers.forall(objStmCapacity.contains)) throw Malformed
      if (objStmCapacity.values.map(_.toLong).sum != type2Containers.length)
        throw Malformed
    }
    (out.toString, nObjects, nStreams)
  }

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_objects", IntegerType, nullable = false),
    StructField("n_streams", IntegerType, nullable = false)))

  /** Null-on-malformation wrapper (the codec fail-closed contract). */
  def extract(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    try {
      val (t, o, st) = extractImpl(bytes)
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), o, st))
    } catch {
      case PngCodec.Malformed | _: StringIndexOutOfBoundsException |
           _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => null
    }
  }
}

/** `pdf_text(bytes)` — see [[PdfCodec.extract]]. */
case class PdfText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PdfCodec.schema
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pdf_text needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    PdfCodec.extract(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PdfCodec.extract($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): PdfText =
    copy(child = newChild)
  override def prettyName: String = "pdf_text"
}

object PdfText {
  def pdf_text(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PdfText(GraftColumnBridge.expression(c)))
  }
}
