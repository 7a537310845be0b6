package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP/1.x response-message decoder — the envelope layer between a
  * WARC `response` record's payload and the page bytes. Real crawl
  * archives (Common Crawl) carry the response verbatim off the wire,
  * so the body arrives behind any combination of
  * `Transfer-Encoding: chunked` framing, `Content-Encoding:
  * gzip`/`deflate` compression, and a `charset=` declaration that is
  * frequently not UTF-8 — every record passes through this step, which
  * is why it is a custom Catalyst expression (the SURVEY §2 preference
  * order: byte-level framing + per-row charset selection are exactly
  * what built-ins cannot express; `decode(col, cs)` takes only a
  * literal charset). Everything before (gzip members, WARC framing)
  * and after (markup extraction) stays the existing codegen'd chain,
  * so the whole front door remains a map-only zero-shuffle pass.
  *
  * Decoding steps, in wire order:
  *  1. status line: `HTTP/<1.x> <code> [reason]` (1.0 and 1.1 both
  *     live in archives);
  *  2. headers: case-insensitive names, obs-fold continuation lines
  *     (leading SP/HT) unfolded per RFC 9112 §5.2;
  *  3. transfer decoding: `chunked` (hex size line with optional
  *     extensions, per-chunk CRLF, optional trailer section) —
  *     strict, fail-closed on any framing error;
  *  4. content decoding: `gzip`/`x-gzip` ([[GzipCodec.gunzip]] — the
  *     hand-rolled inflate, full dynamic-Huffman), `deflate` (zlib
  *     per RFC 9110, with the raw-DEFLATE fallback real servers
  *     ship), `identity`; an UNKNOWN coding fails closed (null) —
  *     passing compressed bytes downstream as if they were text would
  *     silently poison extraction;
  *  5. charset decoding in WHATWG sniff order — BOM (utf-8 /
  *     utf-16le / utf-16be, stripped from the text) → the `charset=`
  *     parameter of Content-Type → a `<meta charset>` /
  *     `http-equiv` prescan over the first 1024 decoded-body bytes →
  *     the BOM-less UTF-16 first-bytes sniff (`<\0` / `\0<` — the
  *     prescan cannot read NUL-interleaved markup) → utf-8 default.
  *     The label registry covers the crawl-era legacy charsets the
  *     JDK ships natively (shift_jis, euc-jp, iso-2022-jp — the
  *     escape-sequence family — euc-kr, gbk — which also absorbs
  *     gb2312 per WHATWG — big5, windows-1251, koi8-r,
  *     iso-8859-2/-7, windows-1253, beside the latin-1/cp1252
  *     originals); an unknown or absent label at one
  *     tier falls through to the next, exactly like a browser.
  *     Malformed sequences are replaced with U+FFFD — the lenient
  *     posture a crawl pipeline needs (strict-null here would drop
  *     every mojibake page instead of extracting what survives) —
  *     and the replacement COUNT is surfaced (`n_fffd`) so silent
  *     mojibake is observable downstream (the charset-audit ppm
  *     metric), not just tolerated.
  *
  * Content-Length is NOT enforced against the body: WARC payloads are
  * already length-framed by the record, and real captures routinely
  * disagree with their Content-Length header (truncated fetches).
  *
  * Reference cell: the byte-chunk source + line framing
  * (`/root/reference/src/Data/Conduino/Combinators.hs:245-288`); the
  * HTTP envelope is the protocol-framed sibling at the same boundary.
  */
object HttpCodec {

  val schema: StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    // lowercased media type before ';' (null when absent)
    StructField("mime", StringType),
    // lowercased charset= parameter, verbatim label (null when absent)
    StructField("charset", StringType),
    // body bytes AFTER transfer + content decoding
    StructField("body", BinaryType, nullable = false),
    // body decoded via the declared charset (utf-8 fallback, U+FFFD
    // replacement)
    StructField("text", StringType, nullable = false),
    // Location header verbatim (null when absent) — the redirect
    // target a crawl frontier follows on 3xx captures
    StructField("location", StringType),
    // canonical label of the charset the decode actually used (the
    // sniff RESULT — `charset` above stays the raw declared header
    // label, which may be absent, unknown, or overruled by a BOM)
    StructField("charset_used", StringType, nullable = false),
    // which sniff tier decided:
    // 'bom' | 'header' | 'meta' | 'sniff16' | 'default'
    StructField("charset_source", StringType, nullable = false),
    // U+FFFD replacements the lenient decode emitted — the mojibake
    // observability counter (0 on a clean page)
    StructField("n_fffd", LongType, nullable = false)))

  private val Crlf = Array[Byte]('\r', '\n')

  private def indexOfCrlf(a: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    while (i + 1 < until) {
      if (a(i) == '\r' && a(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** De-chunk a `Transfer-Encoding: chunked` body; null on any framing
    * malformation (bad size line, missing per-chunk CRLF, truncation,
    * bytes after the terminating trailer section).
    */
  private[functions] def dechunk(a: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(a.length)
    var p = 0
    while (true) {
      val e = indexOfCrlf(a, p, a.length)
      if (e < 0) return null
      var sizeStr = new String(a, p, e - p, java.nio.charset.StandardCharsets.US_ASCII)
      val ext = sizeStr.indexOf(';') // chunk extensions are legal; ignored
      if (ext >= 0) sizeStr = sizeStr.substring(0, ext)
      sizeStr = sizeStr.trim
      if (sizeStr.isEmpty || sizeStr.length > 8) return null
      // accumulate in Long: 8 hex digits reach 0xffffffff, which wraps
      // an Int negative and would bypass the bounds guard below — a
      // crafted chunk size must fail closed, not crash the task
      var sizeL = 0L
      var i = 0
      while (i < sizeStr.length) {
        val d = Character.digit(sizeStr.charAt(i), 16)
        if (d < 0) return null
        sizeL = sizeL * 16 + d
        i += 1
      }
      if (sizeL > a.length.toLong) return null // cannot exceed the buffer
      val size = sizeL.toInt
      p = e + 2
      if (size == 0) {
        // trailer section: zero or more header lines, then a blank line
        var done = false
        while (!done) {
          val t = indexOfCrlf(a, p, a.length)
          if (t < 0) return null
          if (t == p) done = true
          p = t + 2
        }
        if (p != a.length) return null // trailing garbage
        return out.toByteArray
      }
      if (p + size + 2 > a.length) return null
      out.write(a, p, size)
      if (a(p + size) != '\r' || a(p + size + 1) != '\n') return null
      p += size + 2
    }
    null // unreachable
  }

  /** Charset label → (JDK charset, canonical label); None for labels
    * outside the registry (the caller falls through to the next sniff
    * tier, browser-style). Labels and alias folding per the WHATWG
    * encoding registry's crawl-era entries; every target charset is
    * JDK-native (java.base + jdk.charsets), so the decode needs no
    * tables of our own. Note `gb2312` resolves to GBK (its superset)
    * exactly as WHATWG prescribes — real pages labeled gb2312
    * routinely use GBK-only code points.
    */
  private val CharsetRegistry: Map[String, (java.nio.charset.Charset, String)] = {
    def e(jdk: String, canonical: String, labels: String*) = {
      val cs = java.nio.charset.Charset.forName(jdk)
      labels.map(_ -> (cs, canonical))
    }
    (e("UTF-8", "utf-8", "utf-8", "utf8", "us-ascii", "ascii", "csutf8") ++
      e("ISO-8859-1", "iso-8859-1",
        "iso-8859-1", "latin-1", "latin1", "l1", "iso_8859-1", "iso8859-1") ++
      e("windows-1252", "windows-1252", "windows-1252", "cp1252", "x-cp1252") ++
      e("Shift_JIS", "shift_jis",
        "shift_jis", "shift-jis", "sjis", "x-sjis", "ms_kanji", "csshiftjis",
        "windows-31j") ++
      e("EUC-JP", "euc-jp", "euc-jp", "x-euc-jp", "cseucpkdfmtjapanese") ++
      e("ISO-2022-JP", "iso-2022-jp", "iso-2022-jp", "csiso2022jp") ++
      e("EUC-KR", "euc-kr",
        "euc-kr", "ks_c_5601-1987", "korean", "csksc56011987", "cseuckr") ++
      e("GBK", "gbk",
        "gbk", "x-gbk", "gb2312", "gb_2312", "gb_2312-80", "csgb2312",
        "chinese", "csiso58gb231280") ++
      e("Big5", "big5", "big5", "big-5", "csbig5", "x-x-big5") ++
      e("windows-1251", "windows-1251", "windows-1251", "cp1251", "x-cp1251") ++
      e("KOI8-R", "koi8-r", "koi8-r", "koi8", "cskoi8r") ++
      e("ISO-8859-2", "iso-8859-2",
        "iso-8859-2", "latin2", "l2", "iso_8859-2", "iso8859-2") ++
      e("ISO-8859-7", "iso-8859-7",
        "iso-8859-7", "greek", "greek8", "iso_8859-7", "ecma-118") ++
      e("windows-1253", "windows-1253", "windows-1253", "cp1253") ++
      // WHATWG maps the bare utf-16 label to LE (the overwhelmingly
      // common byte order on the web)
      e("UTF-16LE", "utf-16le", "utf-16le", "utf-16") ++
      e("UTF-16BE", "utf-16be", "utf-16be")).toMap
  }

  /** `<meta charset=...>` / `http-equiv Content-Type` prescan over the
    * first 1024 bytes of the decoded body (the WHATWG prescan window),
    * read as latin-1 so every byte maps to a char — the tag and its
    * label are ASCII in every ASCII-compatible encoding, which is all
    * the registry contains. Returns the lowercased label or null.
    */
  private val MetaTagPattern = java.util.regex.Pattern.compile("(?i)<meta[\\s/]")
  // one attribute: name = "v" | 'v' | bare-v  (valueless attributes
  // are skipped — neither charset nor http-equiv is useful bare)
  private val MetaAttrPattern = java.util.regex.Pattern.compile(
    "([a-zA-Z-]+)\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>\"']+))")

  private def metaPrescan(body: Array[Byte]): String = {
    val raw = new String(body, 0, math.min(body.length, 1024),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // the WHATWG prescan skips comment spans before looking at tags —
    // a commented-out <meta charset> must not steer the decode; an
    // UNTERMINATED comment opener swallows the rest of the window
    // (the spec's skip-to--> with no --> found)
    val window = raw.replaceAll("(?s)<!--.*?(-->|$)", " ")
    val tm = MetaTagPattern.matcher(window)
    while (tm.find()) {
      // attribute run of THIS tag only (bounded, as before, at 300
      // chars — a runaway unclosed tag must not scan the whole window)
      val gt = window.indexOf('>', tm.end())
      val tagEnd = math.min(if (gt < 0) window.length else gt, tm.end() + 300)
      val tag = window.substring(tm.end() - 1, tagEnd)
      val am = MetaAttrPattern.matcher(tag)
      var content: String = null
      var httpEquivCt = false
      var label: String = null
      while (am.find() && label == null) {
        val name = am.group(1).toLowerCase(java.util.Locale.ROOT)
        val v = if (am.group(2) != null) am.group(2)
          else if (am.group(3) != null) am.group(3) else am.group(4)
        // charset as an ATTRIBUTE NAME — a 'charset=' inside some other
        // attribute's quoted value is consumed by that attribute's
        // match and can never be the label (review finding)
        if (name == "charset" && v.trim.nonEmpty) label = v.trim
        else if (name == "http-equiv" && v.trim.equalsIgnoreCase("content-type"))
          httpEquivCt = true
        else if (name == "content") content = v
      }
      if (label == null && httpEquivCt && content != null) {
        val pm = CharsetPattern.matcher(content)
        if (pm.find()) label = pm.group(1)
      }
      if (label != null) return label.toLowerCase(java.util.Locale.ROOT)
    }
    null
  }

  /** Lenient decode that COUNTS replacement events: REPORT-mode
    * decoder, one U+FFFD appended per malformed/unmappable sequence —
    * byte-identical output to CodingErrorAction.REPLACE, but n counts
    * the decode ERRORS, not U+FFFD occurrences, so a clean page that
    * legitimately contains U+FFFD in its source bytes (upstream
    * mojibake re-served verbatim — common on the real web) reports 0
    * (review finding: the old output-scan counted those as damage).
    */
  private def decodeCounting(body: Array[Byte],
      cs: java.nio.charset.Charset): (String, Long) = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val in = java.nio.ByteBuffer.wrap(body)
    val out = java.nio.CharBuffer.allocate(8192)
    val sb = new java.lang.StringBuilder(body.length + 16)
    var n = 0L
    def drain(): Unit = {
      out.flip()
      sb.append(out, 0, out.limit())
      out.clear()
    }
    var done = false
    while (!done) {
      val r = dec.decode(in, out, true)
      drain()
      if (r.isUnderflow) {
        var fl = dec.flush(out)
        drain()
        while (fl.isOverflow) { fl = dec.flush(out); drain() }
        done = true
      } else if (r.isError) {
        n += 1
        sb.append('\uFFFD')
        in.position(in.position() + r.length())
      } // overflow: already drained, loop
    }
    (sb.toString, n)
  }

  private val StatusLinePattern = java.util.regex.Pattern
    .compile("^HTTP/\\d(?:\\.\\d)?[ \\t]+(\\d{3})(?:[ \\t].*)?$")
  private val CharsetPattern = java.util.regex.Pattern
    .compile("(?i)charset\\s*=\\s*\"?([^\";\\s]+)\"?")

  /** Parse a full HTTP/1.x response message; null on malformation
    * (no status line, no header/body split, chunked framing error,
    * content-coding error or unknown coding). Defensive catch on
    * index errors: this runs per record on untrusted crawl bytes, and
    * a parser slip must null the record, never kill the task.
    */
  def parse(bytes: Array[Byte]): GenericInternalRow =
    try parseImpl(bytes)
    catch { case _: IndexOutOfBoundsException | _: NegativeArraySizeException => null }

  private def parseImpl(bytes: Array[Byte]): GenericInternalRow = {
    if (bytes == null) return null
    // header/body split: first CRLFCRLF
    var split = -1
    var i = 0
    while (split < 0 && i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return null
    val head = new String(bytes, 0, split, java.nio.charset.StandardCharsets.ISO_8859_1)
    val rawLines = head.split("\r\n", -1)
    if (rawLines.isEmpty) return null
    // status line
    val st = rawLines(0)
    val m = StatusLinePattern.matcher(st)
    if (!m.matches()) return null
    val status = m.group(1).toInt
    // unfold + collect headers; repeated headers append comma-joined
    // (the RFC 9110 list-merge rule — what Transfer-/Content-Encoding
    // token scans expect)
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    var li = 1
    while (li < rawLines.length) {
      val line = rawLines(li)
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (last == null) return null // fold with no previous header
        headers(last) = headers(last) + " " + line.trim
      } else {
        val c = line.indexOf(':')
        if (c <= 0) return null
        val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        headers(name) = headers.get(name).map(_ + ", " + value).getOrElse(value)
        last = name
      }
      li += 1
    }
    var body = java.util.Arrays.copyOfRange(bytes, split + 4, bytes.length)
    // transfer decoding
    val te = headers.getOrElse("transfer-encoding", "")
    val teTokens = te.split(',').iterator.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).toSeq
    if (teTokens.exists(t => t != "chunked" && t != "identity")) return null
    if (teTokens.contains("chunked")) {
      body = dechunk(body)
      if (body == null) return null
    }
    // content decoding, reverse of application order
    val ce = headers.getOrElse("content-encoding", "")
    val ceTokens = ce.split(',').iterator.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).toSeq
    var ti = ceTokens.length - 1
    while (ti >= 0) {
      ceTokens(ti) match {
        case "gzip" | "x-gzip" =>
          body = GzipCodec.gunzip(body)
        case "deflate" =>
          val z = GzipCodec.zlibInflate(body)
          body = if (z != null) z else GzipCodec.inflateRaw(body)
        case "identity" => // no-op
        case _ => return null // unknown coding: fail closed
      }
      if (body == null) return null
      ti -= 1
    }
    // charset
    val ct = headers.getOrElse("content-type", null)
    var mime: String = null
    var charset: String = null
    if (ct != null) {
      val semi = ct.indexOf(';')
      mime = (if (semi >= 0) ct.substring(0, semi) else ct)
        .trim.toLowerCase(java.util.Locale.ROOT)
      if (semi >= 0) {
        val pm = CharsetPattern.matcher(ct.substring(semi + 1))
        if (pm.find()) charset = pm.group(1).toLowerCase(java.util.Locale.ROOT)
      }
    }
    // WHATWG sniff order: BOM → header label → meta prescan → utf-8.
    // An unknown label at one tier falls THROUGH to the next (a browser
    // treats an unrecognized declaration as no declaration).
    var cs: java.nio.charset.Charset = null
    var used: String = null
    var source: String = null
    var bomSkip = 0
    if (body.length >= 3 && body(0) == 0xef.toByte &&
        body(1) == 0xbb.toByte && body(2) == 0xbf.toByte) {
      cs = java.nio.charset.StandardCharsets.UTF_8
      used = "utf-8"; source = "bom"; bomSkip = 3
    } else if (body.length >= 2 && body(0) == 0xff.toByte && body(1) == 0xfe.toByte) {
      cs = java.nio.charset.StandardCharsets.UTF_16LE
      used = "utf-16le"; source = "bom"; bomSkip = 2
    } else if (body.length >= 2 && body(0) == 0xfe.toByte && body(1) == 0xff.toByte) {
      cs = java.nio.charset.StandardCharsets.UTF_16BE
      used = "utf-16be"; source = "bom"; bomSkip = 2
    }
    if (cs == null && charset != null) CharsetRegistry.get(charset) match {
      case Some((c, canon)) => cs = c; used = canon; source = "header"
      case None =>
    }
    // the meta prescan is an HTML mechanism (WHATWG): apply it only
    // when the payload is declared text-ish or undeclared — a crafted
    // BINARY body (pdf/image) containing the bytes `<meta charset=`
    // must not steer its own decode
    val htmlish = mime == null || mime.startsWith("text/") ||
      mime == "application/xhtml+xml"
    if (cs == null && htmlish) {
      val metaLabel = metaPrescan(body)
      if (metaLabel != null) CharsetRegistry.get(metaLabel) match {
        case Some((c, canon)) => cs = c; used = canon; source = "meta"
        case None =>
      }
    }
    // BOM-less UTF-16 first-bytes sniff (the WHATWG pseudo-UTF-16
    // path): markup necessarily begins with an ASCII '<', which in
    // UTF-16 arrives as `3C 00` (LE) or `00 3C` (BE) — bytes the
    // prescan above can never read (every ASCII char in the page is
    // NUL-interleaved, so a meta declaration is invisible). No legacy
    // byte-oriented page can start with either pair ('<' then NUL /
    // NUL then '<'), so there are no false positives on the registry's
    // other encodings.
    if (cs == null && htmlish && body.length >= 2) {
      if (body(0) == 0x3c.toByte && body(1) == 0.toByte) {
        cs = java.nio.charset.StandardCharsets.UTF_16LE
        used = "utf-16le"; source = "sniff16"
      } else if (body(0) == 0.toByte && body(1) == 0x3c.toByte) {
        cs = java.nio.charset.StandardCharsets.UTF_16BE
        used = "utf-16be"; source = "sniff16"
      }
    }
    if (cs == null) {
      cs = java.nio.charset.StandardCharsets.UTF_8
      used = "utf-8"; source = "default"
    }
    val (text, nFffd) = decodeCounting(
      if (bomSkip == 0) body
      else java.util.Arrays.copyOfRange(body, bomSkip, body.length), cs)
    val location = headers.getOrElse("location", null)
    new GenericInternalRow(Array[Any](
      status,
      if (mime == null) null else UTF8String.fromString(mime),
      if (charset == null) null else UTF8String.fromString(charset),
      body,
      UTF8String.fromString(text),
      if (location == null) null else UTF8String.fromString(location),
      UTF8String.fromString(used),
      UTF8String.fromString(source),
      nFffd))
  }
}

/** `http_response(bytes)` — HTTP/1.x response envelope decoder; see
  * [[HttpCodec.parse]].
  */
case class HttpResponse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HttpCodec.schema
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"http_response needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    HttpCodec.parse(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HttpCodec.parse($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): HttpResponse =
    copy(child = newChild)
  override def prettyName: String = "http_response"
}

object HttpResponse {
  def http_response(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HttpResponse(GraftColumnBridge.expression(c)))
  }
}
