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
  * validated through their container, not dereferenced) —
  * `obj…endobj` object framing, dictionary scan, `stream…endstream`
  * payloads with direct /Length, /FlateDecode content streams, and
  * the text operators inside BT…ET — `(…) Tj`, `[(…) kern (…)] TJ`
  * (kerning numbers skipped), with full literal-string escape
  * handling (\\ \( \) \n \r \t \b \f, octal, line continuations).
  * Metadata/binary streams (/XRef, /ObjStm, /Subtype /Image) are
  * never op-scanned. Documented cuts: /Prev incremental-update
  * chains, indirect /Length, encryption, and CID/Type0 font decoding
  * — each a further tier, not a correctness risk: files using them
  * fail CLOSED, never garbled-open.
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

  /** Parse the classic xref table at `off`; returns in-use object
    * offsets.
    */
  private def parseXref(s: String, off: Int): Array[Int] = {
    if (off < 0 || off >= s.length) throw Malformed
    var p = off
    if (!s.startsWith("xref", p)) throw Malformed
    p += 4
    while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n' ||
      s.charAt(p) == ' ')) p += 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var done = false
    while (!done) {
      // subsection header: "<start> <count>" or the trailer keyword
      if (s.startsWith("trailer", p)) done = true
      else {
        val eol = s.indexOf('\n', p)
        if (eol < 0) throw Malformed
        val hdr = s.substring(p, eol).trim.split("\\s+")
        if (hdr.length != 2) throw Malformed
        val count =
          try hdr(1).toInt
          catch { case _: NumberFormatException => throw Malformed }
        if (count < 0 || count > MaxObjects) throw Malformed
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
            out += o
          } else if (typ != 'f') throw Malformed
          p += 20 // 10 + 1 + 5 + 1 + 1 + 2-byte EOL
          i += 1
        }
      }
    }
    out.toArray
  }

  /** Decode a PDF literal string body (between the outer parens,
    * escapes unresolved) into text.
    */
  private def decodeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\') { sb.append(c); i += 1 }
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
  private def extractOps(cs: String, out: StringBuilder): Unit = {
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

  /** One `obj … endobj` framing parse at `off`: (object number, dict
    * text, decoded stream data or null). Shared by the object walk and
    * the xref-stream reader.
    */
  private def parseObjectAt(s: String, bytes: Array[Byte],
      off: Int): (Int, String, Array[Byte]) = {
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
      if (!lm.find()) throw Malformed // indirect /Length: documented cut
      val len = toIntStrict(lm.group(1))
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
    * (big-endian), /Index subsections, single section (no /Prev chain
    * — the incremental-update tail remains a documented cut). Returns
    * (type-1 offsets, count of type-2 compressed-object entries).
    * Text never lives in an object stream (streams cannot nest in
    * ObjStm), so type-2 entries are counted and validated-by-framing
    * via their container, never dereferenced.
    */
  private def parseXrefStream(s: String, bytes: Array[Byte],
      off: Int): (Array[Int], Array[Int]) = {
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
        if (nums.length % 2 != 0) throw Malformed
        nums
      } else Array(0, size)
    val row = w1 + w2 + w3
    // LONG sum with a per-total cap: two near-MaxInt /Index counts must
    // not wrap past both guards into an empty "success" (review finding)
    val nEntriesL = index.grouped(2).map(_(1).toLong).sum
    if (nEntriesL < 0 || nEntriesL > MaxObjects) throw Malformed
    val nEntries = nEntriesL.toInt
    if (data.length < nEntries.toLong * row) throw Malformed
    @inline def field(base: Int, width: Int): Long = {
      var v = 0L
      var i = 0
      while (i < width) { v = (v << 8) | (data(base + i) & 0xffL); i += 1 }
      v
    }
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    val containers = scala.collection.mutable.ArrayBuffer.empty[Int]
    var e = 0
    var p = 0
    while (e < nEntries) {
      val t = if (w1 == 0) 1L else field(p, w1)
      val f2 = field(p + w1, w2)
      t match {
        case 0L => // free entry
        case 1L =>
          if (f2 > Int.MaxValue) throw Malformed
          offsets += f2.toInt
        case 2L =>
          if (f2 > MaxObjects) throw Malformed
          containers += f2.toInt
        case _ => throw Malformed
      }
      p += row
      e += 1
    }
    (offsets.toArray, containers.toArray)
  }

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
    // classic table ("xref" keyword) or a 1.5+ cross-reference stream
    // (an object) — dispatch on what actually sits at the offset
    val (offsets, type2Containers) =
      if (s.startsWith("xref", xrefOff)) (parseXref(s, xrefOff), Array.empty[Int])
      else parseXrefStream(s, bytes, xrefOff)
    if (offsets.length > MaxObjects) throw Malformed
    val out = new StringBuilder
    var nStreams = 0
    var nObjects = type2Containers.length // compressed objects carry no text
    val objStmCapacity = scala.collection.mutable.Map.empty[Int, Int]
    // objects in ascending offset order = document order for the
    // fixture and for every writer that appends objects sequentially
    offsets.sorted.foreach { off =>
      nObjects += 1
      if (off == xrefOff) {
        // the xref stream lists itself type-1; it was already parsed
        // and inflated above — don't pay the inflate twice per record
        // (review finding)
      } else {
        val (objNum, dict, data) = parseObjectAt(s, bytes, off)
        if (data != null) {
          // metadata/binary streams carry no page text: the xref stream
          // itself, object streams, and images are never op-scanned
          // (whitespace-robust: dict keys separate with ANY whitespace)
          if (ObjStmPattern.matcher(dict).find()) {
            val nm = ObjStmNPattern.matcher(dict)
            if (!nm.find()) throw Malformed
            objStmCapacity(objNum) = toIntStrict(nm.group(1))
          } else if (!XRefTypePattern.matcher(dict).find() &&
              !ImageTypePattern.matcher(dict).find()) {
            nStreams += 1
            extractOps(new String(data, Ascii), out)
          }
        }
      }
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
