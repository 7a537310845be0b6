package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** HTML/markup text extraction — the FIRST operator a real training-data
  * pipeline runs: raw crawled HTML → clean line-filtered text that the
  * [[TextOps]] quality battery can consume. The reference has no cell
  * for this (closest is line-oriented `sourceHandleLines`,
  * `/root/reference/src/Data/Conduino/Combinators.hs:245-257`, already
  * ported); the operator fills the conspicuous first-step hole in the
  * LLM-pipeline tier.
  *
  * Extraction semantics (C4-shaped, documented so both engines agree):
  *   1. remove `<script…>…</script>` and `<style…>…</style>` blocks
  *      (case-insensitive, dot-matches-newline, non-greedy);
  *   2. remove HTML comments `<!-- … -->` (which may CONTAIN tags —
  *      removal runs before tag stripping);
  *   3. replace every remaining tag with a LINE BREAK (a closed `</p>`
  *      and an inline `<b>` both end the current text run; inline-tag
  *      fragments produce short runs that the line rules then drop);
  *   4. decode the five standard entities `&lt; &gt; &quot; &#39;
  *      &nbsp;` and — LAST, so `&amp;lt;` decodes to the literal
  *      `&lt;` — `&amp;`;
  *   5. per line: collapse space/tab runs, trim;
  *   6. C4-style line rules — keep a line iff it ends in terminal
  *      punctuation `. ! ? "`, has ≥ [[TextOps.MinWords]] words, and
  *      contains no `{`/`}` (the code/JSON filter).
  * Output per doc: kept lines joined by newline, plus kept/dropped
  * line counts (the auditable remainder, same discipline as
  * [[TextOps.qualityFilter]]'s reason column).
  *
  * Everything is a pure per-row chain of codegen'd built-ins
  * (`regexp_replace`/`split`/`filter`/`array_join`) — no UDF, no
  * shuffle; at 100 TB this is a map-only pass whose cost is the scan,
  * exactly like the quality battery it feeds.
  */
object Html {

  /** Terminal-punctuation line rule (Java and RE2 agree on this regex). */
  val TerminalPunct = "[.!?\"]$"

  /** ORACLE-side entity decode table in APPLICATION ORDER (`&amp;`
    * last — so `&amp;lt;` yields the literal `&lt;`). The ENGINE runs
    * the full single-pass WHATWG decoder
    * ([[graft.functions.HtmlEntities]]: every numeric reference + the
    * high-frequency named set); DuckDB cannot express that pass, so
    * the oracle mirrors it as a replace() fold over exactly the
    * references the fixture can contain — the five originals plus the
    * template's entity-battery line (named, decimal, hex, C1-remap,
    * surrogate/NUL/out-of-range → U+FFFD). The two chains agree on
    * every stageable input because the fixture escapes `&` first
    * (any entity-like run in raw doc text reaches both chains as
    * `&amp;…`, which both leave as literal text after one decode —
    * the no-rescan rule, pinned by the battery's `&amp;#38;`).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ",
    // battery references (Spark side decodes these via the FULL pass;
    // the oracle needs one fold entry per distinct reference staged)
    "&#233;" -> "é", "&egrave;" -> "è", "&mdash;" -> "—",
    "&#x20AC;" -> "€", "&hellip;" -> "…",
    "&#150;" -> "–", // C1 remap: browsers read &#150; as EN DASH
    "&#xD800;" -> "�", "&#0;" -> "�", "&#1114112;" -> "�",
    "&amp;" -> "&")

  // ---------------------------------------------------------------------
  // Shared fixture template: ONE definition renders BOTH the staged raw
  // HTML file (Scala) and the oracle's in-SQL reconstruction (DuckDB
  // concat), so the two strip chains face byte-identical input. The
  // wrapper exercises every extraction rule: a script whose BODY
  // contains braces + a quoted tag, a style block, a comment hiding a
  // <p>, nav link fragments, a <br> mid-paragraph, all five entities,
  // and a brace-bearing <pre>.
  // ---------------------------------------------------------------------

  private sealed trait Tok
  private case class Lit(s: String) extends Tok
  private case object DocId extends Tok
  private case object DocText extends Tok
  /** Absolute cross-site outlink (href-escaped): the page for doc d
    * links to the page whose id is [[outlinkTarget]](d) — the axis the
    * host-level link graph (q_link_graph) is built on.
    */
  private case object LinkHref extends Tok

  /** Outlink target id (mirrored in SQL as `7*doc_id + 13`). */
  def outlinkTarget(docId: Long): Long = 7L * docId + 13L
  val OutlinkTargetSql = "(7 * doc_id + 13)"

  private val template: Seq[Tok] = Seq(
    Lit("<html data-doc=\""), DocId, Lit("\"><head><title>Doc "), DocId,
    Lit("</title><script type=\"text/javascript\">var cfg = {id: "), DocId,
    Lit(", nav: \"<b>x</b>\"};</script><style>.nav { color: red; }</style>" +
      "</head><body><!-- boilerplate <p>hidden</p> --><h1>Doc "), DocId,
    Lit("</h1><div class=\"nav\"><a href=\"/\">Home</a> | " +
      "<a href=\"/about\">About</a> | <a href=\""), LinkHref,
    Lit("\">Next</a></div><p>"), DocText,
    // the body paragraph ends with a period (as crawled prose does), so
    // the kept/dropped decision AND the extracted content of this line
    // are doc-dependent — the oracle hash covers the real text path,
    // not just the fixed template lines
    Lit(".</p><p>First half words here now.<br>second bit</p><p>Short stub" +
      "</p><p>It&#39;s &quot;qu0ted&quot; &lt;fine&gt; &amp; nbsp&nbsp;done." +
      // the character-reference battery: named + decimal + hex NCRs,
      // a C1-remap case, the no-rescan pin (&amp;#38; stays literal
      // &#38;), and the three U+FFFD classes (surrogate / NUL /
      // out-of-range) — decoded by the engine's full WHATWG pass and
      // mirrored entity-by-entity in the oracle fold
      "</p><p>The caf&#233; cr&egrave;me &mdash; 20 &#x20AC; &hellip; " +
      "fish &amp;#38; chips here &#150; dash &#xD800; bad &#0; nul " +
      "&#1114112; over.</p><pre>function f() { return "), DocId,
    Lit("; }</pre></body></html>"))

  /** Escape raw doc text for embedding in the wrapper (`&` first), and
    * sanitize newlines to spaces — the q_text_lines one-doc-per-line
    * staging convention.
    */
  private def escapeText(raw: String): String =
    raw.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\n", " ")

  /** Render one doc as a single-line raw-HTML string (fixture staging). */
  def wrapLine(docId: Long, rawText: String): String =
    template.map {
      case Lit(s) => s
      case DocId => docId.toString
      case DocText => escapeText(rawText)
      // attribute-escape the url's query separator (crawled markup that
      // is actually well-formed does this; the outlink extractor decodes)
      case LinkHref => Urls.urlOf(outlinkTarget(docId)).replace("&", "&amp;")
    }.mkString

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The SAME wrapper as a DuckDB concat expression over a `documents`
    * row (columns `doc_id`, `text`) — the oracle rebuilds the staged
    * bytes in SQL and then strips them with its own regexp chain.
    */
  def wrapSqlExpr: String =
    template.map {
      case Lit(s) => sqlQuote(s)
      case DocId => "CAST(doc_id AS VARCHAR)"
      case DocText =>
        "replace(replace(replace(replace(text, '&', '&amp;'), '<', '&lt;')," +
          " '>', '&gt;'), chr(10), ' ')"
      case LinkHref =>
        s"replace(${Urls.urlSqlInline(OutlinkTargetSql)}, '&', '&amp;')"
    }.mkString(" || ")

  // ---------------------------------------------------------------------
  // Spark side
  // ---------------------------------------------------------------------

  /** Steps 1-3: remove comment / script / style BLOCKS, tags intact.
    * Comments BEFORE script/style: a commented-out <script> (common in
    * crawled markup) must never open a block run — with the old order
    * the non-greedy .*?</script> swallowed all real content up to the
    * next </script> elsewhere on the page.
    * Residual edge, documented: an UNPAIRED '<!--' inside a script
    * body (e.g. a JS string literal) with a genuine comment later on
    * the page now comment-strips across the gap. The legacy
    * hide-from-old-browsers pattern (<script><!-- … //--></script>)
    * is NOT affected — its opener and closer pair inside one script,
    * so the comment strip stays local (spec-pinned). Fixing both
    * directions needs a boundary-aware match (negative lookahead),
    * which RE2 — the oracle's engine — does not support; a regex
    * chain shared verbatim by both engines picks the order that
    * protects against the commoner malformation.
    */
  def stripBlocks(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
  }

  /** Steps 1-4: raw html → entity-decoded text with one line per tag
    * boundary. The entity step is the FULL single-pass WHATWG decoder
    * (numeric references incl. C1 remap + the high-frequency named
    * set, [[graft.functions.HtmlEntities]]) — one codegen'd map pass,
    * replacing the old six-entity replace() fold (which survives as
    * the oracle's mirror, see [[Entities]]).
    */
  def stripTags(html: Column): Column =
    graft.functions.HtmlEntityDecode.html_entity_decode(
      regexp_replace(stripBlocks(html), "<[^>]*>", "\n"))

  /** Steps 5-6: normalized lines, then the kept subset. */
  private def normLines(html: Column): Column =
    transform(split(stripTags(html), "\n"),
      l => trim(regexp_replace(l, "[ \\t]+", " ")))

  private def keepRule(l: Column): Column =
    l.rlike(TerminalPunct) &&
      size(split(l, " ")) >= lit(TextOps.MinWords) &&
      !l.contains("{") && !l.contains("}")

  /** html column → extracted clean text (kept lines joined by `\n`). */
  def extractText(html: Column): Column =
    array_join(filter(normLines(html), l => keepRule(l)), "\n")

  /** Absolute outlinks of a raw-html column: every ANCHOR-TAG `href`
    * attribute value, attribute-unescaped (`&amp;` → `&`), kept only
    * when absolute (`http...`) — relative navigation (`/`, `/about`)
    * is site-internal and not a graph edge. Two containment rules keep
    * the scan honest: comment/script/style blocks are stripped first
    * (a commented-out or script-quoted anchor is not a link the page
    * serves), and the match REQUIRES the `<a …>` tag context — bare
    * `href="…"` text in document CONTENT can never mint an edge
    * (escaped text cannot form a tag). The attribute run admits `>`
    * INSIDE quoted values (legal HTML: onclick="if(a>b)…") via the
    * non-quote-or-quoted-string alternation, and `href` must follow
    * whitespace so attribute-NAME confusion (data-href, ng-href)
    * cannot match. Pure per-row work.
    */
  def outlinks(html: Column): Column =
    filter(
      transform(regexp_extract_all(stripBlocks(html),
          lit("(?i)<a\\b(?:[^>\"]|\"[^\"]*\")*?\\shref=\"([^\"]*)\""), lit(1)),
        // attribute values carry the SAME character references as text
        // (real markup NCR-encodes query separators and non-ASCII path
        // chars) — the full single-pass decode, not just &amp;
        h => graft.functions.HtmlEntityDecode.html_entity_decode(h)),
      // scheme match is case-insensitive (crawled markup mixes case)
      h => lower(h).startsWith("http"))

  /** Full extraction over a dataframe: (id, extracted, n_kept,
    * n_dropped) where n_dropped counts NONEMPTY lines the rules
    * rejected (empty runs between adjacent tags are template plumbing,
    * not content — counting them would make the audit number
    * meaningless).
    */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val lines = normLines(col(htmlCol))
    val kept = filter(lines, l => keepRule(l))
    val nonEmpty = size(filter(lines, l => l =!= ""))
    df.select(col(idCol),
      array_join(kept, "\n").as("extracted"),
      size(kept).cast("long").as("n_kept"),
      (nonEmpty - size(kept)).cast("long").as("n_dropped"))
  }

  // ---------------------------------------------------------------------
  // DuckDB mirror
  // ---------------------------------------------------------------------

  /** The strip chain (steps 1-4) over a SQL expression. */
  private def stripSql(htmlExpr: String): String = {
    // order mirrors stripTags exactly: comments, then script, then
    // style, then tags — the two engines must strip byte-identically
    val noBlocks =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($htmlExpr,
          '(?s)<!--.*?-->', ' ', 'g'),
          '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
          '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
          '<[^>]*>', chr(10), 'g')"""
    Entities.foldLeft(noBlocks) { case (acc, (e, r)) =>
      s"replace($acc, ${sqlQuote(e)}, ${sqlQuote(r)})"
    }
  }

  private val keepRuleSql: String =
    s"""regexp_matches(l, '[.!?"]$$') AND len(string_split(l, ' ')) >= ${TextOps.MinWords}
        AND NOT contains(l, '{') AND NOT contains(l, '}')"""

  /** Complete oracle SQL for the extraction query: rebuild the staged
    * HTML from `documents`, strip with the mirrored chain, apply the
    * mirrored line rules. Emits (doc_id, extracted, n_kept, n_dropped).
    */
  def extractOracleSql: String =
    s"""WITH raw AS (SELECT doc_id, $wrapSqlExpr AS html FROM documents),
        lines AS (SELECT doc_id,
          list_transform(string_split(${stripSql("html")}, chr(10)),
            l -> trim(regexp_replace(l, '[ \\t]+', ' ', 'g'))) AS ls
          FROM raw),
        k AS (SELECT doc_id,
          list_filter(ls, l -> $keepRuleSql) AS kept,
          list_filter(ls, l -> l <> '') AS nonempty
          FROM lines)
        SELECT doc_id, array_to_string(kept, chr(10)) AS extracted,
          len(kept)::BIGINT AS n_kept,
          (len(nonempty) - len(kept))::BIGINT AS n_dropped
        FROM k"""

  /** Corpus-level extraction HEALTH audit — the over-stripping guard:
    * stripBlocks' documented comment-first ordering can silently eat
    * body text on adversarial real-world pages (an unpaired `<!--`
    * inside a script plus a later genuine comment), and the per-doc
    * extraction output gives no corpus-wide signal. One aggregate row:
    * doc count, EMPTY-extraction count (the spike metric a pipeline
    * alerts on), totals and the exact ppm drop rate — integer
    * arithmetic so the row is hash-stable. Map-only + single 1-row
    * aggregate at any scale.
    */
  def extractAudit(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    extract(df, idCol, htmlCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("extracted") === "", 1L).otherwise(0L)).as("n_empty"),
        sum(col("n_kept")).as("total_kept"),
        sum(col("n_dropped")).as("total_dropped"),
        expr("""CASE WHEN sum(n_kept) + sum(n_dropped) > 0
                THEN (sum(n_dropped) * 1000000) div (sum(n_kept) + sum(n_dropped))
                ELSE 0 END""").as("drop_ppm"))

  /** DuckDB mirror of [[extractAudit]] over the staged fixture. */
  def extractAuditOracleSql: String =
    s"""WITH ex AS ($extractOracleSql)
        SELECT COUNT(*)::BIGINT AS n_docs,
          CAST(SUM(CASE WHEN extracted = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
          CAST(SUM(n_kept) AS BIGINT) AS total_kept,
          CAST(SUM(n_dropped) AS BIGINT) AS total_dropped,
          CAST(CASE WHEN SUM(n_kept) + SUM(n_dropped) > 0
               THEN (SUM(n_dropped) * 1000000) // (SUM(n_kept) + SUM(n_dropped))
               ELSE 0 END AS BIGINT) AS drop_ppm
        FROM ex"""

  /** Oracle CTE yielding (doc_id, text) = the extracted text with
    * newlines re-flattened to spaces — the shape the quality battery
    * consumes (its word split is single-space).
    */
  def extractedDocsSqlCte: String = extractedDocsSqlCteFrom("documents")

  /** Same CTE over an arbitrary (doc_id, text) relation — e.g. the
    * frontier-curated subset of `documents`.
    */
  def extractedDocsSqlCteFrom(docsRel: String): String =
    s"""raw AS (SELECT doc_id, $wrapSqlExpr AS html FROM $docsRel),
        extracted AS (SELECT doc_id,
          array_to_string(list_filter(
            list_transform(string_split(${stripSql("html")}, chr(10)),
              l -> trim(regexp_replace(l, '[ \\t]+', ' ', 'g'))),
            l -> $keepRuleSql), ' ') AS text
          FROM raw)"""
}
