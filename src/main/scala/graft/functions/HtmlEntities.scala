package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoder — the WHATWG layer between markup
  * stripping and clean corpus text. Real multilingual pages NCR-encode
  * exactly the non-ASCII text the charset tier rescues one layer down
  * (`caf&#233;`, `&#x4E2D;&#x6587;`, `&eacute;`, `&mdash;` …); without
  * this pass those references flow into the corpus, vocab, lang-id and
  * quality scoring as literal markup junk.
  *
  * ONE left-to-right pass (never re-scanned — `&amp;lt;` decodes to
  * the literal `&lt;`, exactly like a browser's tokenizer):
  *
  *   - numeric references `&#NNN;` / `&#xHHHH;` with the WHATWG
  *     numeric-character-reference-end rules: 0x00, surrogates and
  *     > 0x10FFFF become U+FFFD; the C1 range 0x80-0x9F remaps through
  *     the windows-1252 table (a page that writes `&#150;` means
  *     EN DASH, and browsers agree);
  *   - named references from the high-frequency table below: the core
  *     five, the full Latin-1 block (`&eacute;` `&uuml;` `&copy;` …)
  *     and the General-Punctuation/Latin-Extended set real prose uses
  *     (`&mdash;` `&hellip;` `&lsquo;` `&euro;` `&trade;` …).
  *     SPACE-family entities (`&nbsp;` `&ensp;` `&emsp;` `&thinsp;`)
  *     normalize to a plain ASCII space — the corpus-normalization
  *     posture this repo's extraction has always taken (an NBSP that
  *     survived would dodge the whitespace collapse and glue words
  *     invisibly); everything else gets its true Unicode value.
  *
  * The terminating `;` is REQUIRED for both forms — the conservative
  * cut of WHATWG's legacy without-semicolon tolerance, which would
  * mangle crawl-typical query strings (`?a=1&copy=2`) in text runs.
  * An unrecognized or unterminated reference passes through verbatim
  * (extraction must never destroy text it cannot interpret).
  *
  * Reference cell: the byte→text boundary of `sourceHandleLines`
  * (/root/reference/src/Data/Conduino/Combinators.hs:245-275) — this
  * tier is the markup-unescape step that boundary needs once the lines
  * are crawled HTML instead of trusted local text.
  */
object HtmlEntities {

  /** windows-1252 remap for numeric references in 0x80-0x9F (WHATWG
    * numeric-character-reference-end state); 0 = keep the code point.
    */
  private val C1Remap: Array[Int] = {
    val a = new Array[Int](32)
    val m = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    m.foreach { case (k, v) => a(k - 0x80) = v }
    a
  }

  /** Named references (semicolon-terminated), name → replacement. */
  val Named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](512)
    def e(name: String, cp: Int): Unit = m.put(name, new String(Character.toChars(cp)))
    def s(name: String, v: String): Unit = m.put(name, v)
    // the core five + legacy uppercase variants (WHATWG carries them)
    s("amp", "&"); s("AMP", "&"); e("lt", '<'); e("LT", '<')
    e("gt", '>'); e("GT", '>'); e("quot", '"'); e("QUOT", '"')
    e("apos", '\'')
    // space family: normalized to plain space (corpus posture, above)
    s("nbsp", " "); s("ensp", " "); s("emsp", " "); s("thinsp", " ")
    // Latin-1 block 0xA1-0xFF in code-point order
    val latin1 = Seq(
      "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect", "uml",
      "copy", "ordf", "laquo", "not", "shy", "reg", "macr", "deg",
      "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
      "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34",
      "iquest",
      "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig",
      "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute",
      "Icirc", "Iuml", "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc",
      "Otilde", "Ouml", "times", "Oslash", "Ugrave", "Uacute", "Ucirc",
      "Uuml", "Yacute", "THORN", "szlig",
      "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig",
      "ccedil", "egrave", "eacute", "ecirc", "euml", "igrave", "iacute",
      "icirc", "iuml", "eth", "ntilde", "ograve", "oacute", "ocirc",
      "otilde", "ouml", "divide", "oslash", "ugrave", "uacute", "ucirc",
      "uuml", "yacute", "thorn", "yuml")
    latin1.zipWithIndex.foreach { case (n, i) => e(n, 0xA1 + i) }
    // Latin Extended / spacing modifiers real pages use
    e("OElig", 0x152); e("oelig", 0x153); e("Scaron", 0x160)
    e("scaron", 0x161); e("Yuml", 0x178); e("fnof", 0x192)
    e("circ", 0x2C6); e("tilde", 0x2DC)
    // General Punctuation + currency + letterlike + math
    e("zwnj", 0x200C); e("zwj", 0x200D); e("lrm", 0x200E); e("rlm", 0x200F)
    e("ndash", 0x2013); e("mdash", 0x2014)
    e("lsquo", 0x2018); e("rsquo", 0x2019); e("sbquo", 0x201A)
    e("ldquo", 0x201C); e("rdquo", 0x201D); e("bdquo", 0x201E)
    e("dagger", 0x2020); e("Dagger", 0x2021); e("bull", 0x2022)
    e("hellip", 0x2026); e("permil", 0x2030); e("prime", 0x2032)
    e("Prime", 0x2033); e("lsaquo", 0x2039); e("rsaquo", 0x203A)
    e("oline", 0x203E); e("frasl", 0x2044); e("euro", 0x20AC)
    e("trade", 0x2122); e("minus", 0x2212); e("ne", 0x2260)
    e("le", 0x2264); e("ge", 0x2265)
    m
  }

  /** Longest name in [[Named]] (scan bound). */
  private val MaxNameLen: Int = {
    var n = 0
    Named.keySet.forEach(k => n = math.max(n, k.length))
    n
  }

  /** Map a parsed numeric code point per WHATWG. */
  private def mapNumeric(cp: Int): String = {
    if (cp == 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) "�"
    else if (cp >= 0x80 && cp <= 0x9F) {
      val r = C1Remap(cp - 0x80)
      new String(Character.toChars(if (r == 0) cp else r))
    } else new String(Character.toChars(cp))
  }

  /** Decode every character reference in `s`, single pass. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    val n = s.length
    while (i >= 0) {
      var rep: String = null
      var end = -1
      if (i + 2 < n && s.charAt(i + 1) == '#') {
        // numeric: &#NNN; or &#xHHHH; (≤ 7 digits — enough for 0x10FFFF
        // and 1114111; longer runs are treated as text, not references)
        var p = i + 2
        val hex = p < n && (s.charAt(p) == 'x' || s.charAt(p) == 'X')
        if (hex) p += 1
        val dStart = p
        var v = 0L
        var ok = true
        while (ok && p < n && p - dStart < 8) {
          val c = s.charAt(p)
          val d = if (hex) Character.digit(c, 16)
                  else if (c >= '0' && c <= '9') c - '0' else -1
          if (d < 0) ok = false
          else { v = v * (if (hex) 16 else 10) + d; p += 1 }
        }
        if (p > dStart && p - dStart <= 7 && p < n && s.charAt(p) == ';') {
          rep = mapNumeric(if (v > 0x10FFFF) 0x110000 else v.toInt)
          end = p + 1
        }
      } else {
        // named: scan alphanumerics up to the table's longest name
        var p = i + 1
        while (p < n && p - i - 1 < MaxNameLen &&
          Character.isLetterOrDigit(s.charAt(p))) p += 1
        if (p < n && p > i + 1 && s.charAt(p) == ';') {
          val cand = Named.get(s.substring(i + 1, p))
          if (cand != null) { rep = cand; end = p + 1 }
        }
      }
      if (rep != null) {
        sb.append(s, last, i).append(rep)
        last = end
        i = s.indexOf('&', end)
      } else i = s.indexOf('&', i + 1)
    }
    sb.append(s, last, n)
    sb.toString
  }

  /** Codegen entry point. */
  def decodeUtf8(u: UTF8String): UTF8String = {
    val s = u.toString
    val d = decode(s)
    if (d eq s) u else UTF8String.fromString(d)
  }

  // ---------------------------------------------------------------------
  // Fixture-side NCR encoder — the inverse staging path: every
  // non-ASCII char (and the three markup chars) becomes a reference,
  // alternating decimal/hex by code-point parity so both forms face
  // the decoder on any real text. decode(ncrEncode(s)) == s for every
  // string without unpaired surrogates (spec-pinned).
  // ---------------------------------------------------------------------

  def ncrEncode(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == '&') sb.append("&amp;")
      else if (cp == '<') sb.append("&lt;")
      else if (cp == '>') sb.append("&gt;")
      else if (cp < 0x80) sb.append(cp.toChar)
      else if ((cp & 1) == 0) sb.append("&#").append(cp).append(';')
      else sb.append("&#x").append(Integer.toHexString(cp)).append(';')
      i += Character.charCount(cp)
    }
    sb.toString
  }
}

/** `html_entity_decode(str)` — single-pass WHATWG character-reference
  * decode; see [[HtmlEntities.decode]]. Codegen'd, map-only: one more
  * per-row string pass in the extraction chain, zero shuffle.
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"html_entity_decode needs a string column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    HtmlEntities.decodeUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEntities.decodeUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
  override def prettyName: String = "html_entity_decode"
}

object HtmlEntityDecode {
  def html_entity_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HtmlEntityDecode(GraftColumnBridge.expression(c)))
  }
}
