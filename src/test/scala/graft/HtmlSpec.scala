package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** HTML/markup extraction — the crawl-ingest front door of the corpus
  * pipeline (Html.scala). The oracle-hash rows (q_html_extract /
  * q_html_quality) pin engine agreement on the full fixture; this spec
  * pins the EDGE semantics the fixture can't isolate per-rule.
  */
class HtmlSpec extends SparkSpec {

  private def extractOne(html: String): (String, Long, Long) = {
    import spark.implicits._
    val r = Html.extract(Seq((1L, html)).toDF("id", "html"), "id", "html").head()
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("script/style bodies vanish even when they contain quoted tags and braces") {
    val html = "<p>Keep these five words here.</p>" +
      "<SCRIPT>var a = \"</p><p>fake\"; if (a) { b(); }</SCRIPT>" +
      "<style media=\"all\">p { color: red }</style>"
    val (txt, kept, dropped) = extractOne(html)
    assert(txt == "Keep these five words here.")
    assert(kept == 1L && dropped == 0L, s"kept=$kept dropped=$dropped")
  }

  test("comments are removed BEFORE tag stripping, so a <p> hidden in a comment never yields a line") {
    val (txt, kept, _) = extractOne(
      "<!-- <p>hidden paragraph would pass all the rules.</p> -->" +
        "<p>Visible paragraph passes all the rules.</p>")
    assert(txt == "Visible paragraph passes all the rules.")
    assert(kept == 1L)
  }

  test("a commented-out <script> never opens a block run that swallows real content") {
    // comments strip BEFORE script blocks: with the reverse order the
    // non-greedy .*?</script> would start at the commented-out opener
    // and eat the visible paragraph up to the real script's closer
    val (txt, kept, _) = extractOne(
      "<!-- disabled: <script src=\"a.js\"> -->" +
        "<p>Visible paragraph passes all the rules.</p>" +
        "<script>var x = 1;</script>")
    assert(txt == "Visible paragraph passes all the rules.")
    assert(kept == 1L)
  }

  test("legacy hide-from-old-browsers script pattern strips cleanly (comment pairs inside the script)") {
    // <script><!-- … //--></script>: the comment opener and closer pair
    // INSIDE one script block, so comments-first stripping stays local
    // and the following paragraph survives intact
    val (txt, kept, _) = extractOne(
      "<script type=\"text/javascript\"><!--\nvar x = 1;\n//--></script>" +
        "<p>Visible paragraph passes all the rules.</p>")
    assert(txt == "Visible paragraph passes all the rules.")
    assert(kept == 1L)
  }

  test("entity decode order: &amp;lt; yields the LITERAL string &lt;, not <") {
    val (txt, _, _) = extractOne("<p>Escaped &amp;lt; stays literal text here.</p>")
    assert(txt == "Escaped &lt; stays literal text here.")
  }

  test("all five entities decode; nbsp counts as a word separator") {
    val (txt, kept, _) = extractOne(
      "<p>It&#39;s &quot;a&quot; &lt;b&gt;&nbsp;c &amp; d.</p>")
    assert(txt == "It's \"a\" <b> c & d.")
    assert(kept == 1L)
  }

  test("C4 line rules: no terminal punct, <5 words, and braces each reject; inline tags split runs") {
    val html = "<p>ends with no punctuation at all</p>" + // no terminal punct
      "<p>Too few words.</p>" + // 3 words
      "<p>Braces { reject this whole line }.</p>" + // brace filter
      "<p>An <b>inline</b> tag splits the run.</p>" // every fragment short
    val (txt, kept, dropped) = extractOne(html)
    assert(txt == "" && kept == 0L, s"got '$txt'")
    assert(dropped == 6L, s"dropped=$dropped") // 3 lines + 3 fragments
  }

  test("wrapLine round-trips hostile doc text: markup chars in the SOURCE text survive as text") {
    val nasty = "a <script> in text & an &amp; entity plus 5 words."
    val line = Html.wrapLine(7L, nasty)
    assert(!line.contains("<script> in"), "raw text must be escaped in the wrapper")
    val (txt, _, _) = extractOne(line)
    // the body paragraph = nasty + the template's terminal period
    assert(txt.startsWith(nasty + "."), s"got '${txt.linesIterator.next()}'")
  }

  test("wrapLine stays single-line for multi-line doc text (the one-doc-per-line staging contract)") {
    assert(!Html.wrapLine(3L, "line one\nline two").contains("\n"))
  }

  test("outlinks: absolute hrefs only, attribute-unescaped, scheme case-insensitive") {
    import spark.implicits._
    val html = "<a href=\"/\">Home</a><a href=\"/about\">x</a>" +
      "<a href=\"https://a.com/x?p=1&amp;q=2\">y</a>" +
      "<a href=\"HTTPS://B.ORG/z\">z</a>"
    val links = Seq(Tuple1(html)).toDF("html")
      .select(Html.outlinks(col("html")).as("ls")).head().getSeq[String](0)
    assert(links == Seq("https://a.com/x?p=1&q=2", "HTTPS://B.ORG/z"))
  }

  test("outlinks containment: text-borne href, commented anchors, and script-quoted anchors mint no edges") {
    import spark.implicits._
    val html = "<p>see href=\"https://evil.com/\" in prose</p>" +
      "<!-- <a href=\"https://commented.com/\">x</a> -->" +
      "<script>var a = '<a href=\"https://scripted.com/\">';</script>" +
      "<a data-href=\"https://tracker.com/\" class=\"lazy\">no real href</a>" +
      "<a href=\"https://real.com/\">ok</a>"
    val links = Seq(Tuple1(html)).toDF("html")
      .select(Html.outlinks(col("html")).as("ls")).head().getSeq[String](0)
    assert(links == Seq("https://real.com/"))
  }

  test("outlinks: a '>' inside a quoted attribute value does not break the anchor match") {
    import spark.implicits._
    val html = "<a onclick=\"if(a>b)track()\" href=\"https://real.com/x\">y</a>"
    val links = Seq(Tuple1(html)).toDF("html")
      .select(Html.outlinks(col("html")).as("ls")).head().getSeq[String](0)
    assert(links == Seq("https://real.com/x"))
  }

  test("the template's outlink round-trips: extract from wrapLine equals urlOf(outlinkTarget)") {
    import spark.implicits._
    val links = Seq(Tuple1(Html.wrapLine(9L, "some words here."))).toDF("html")
      .select(Html.outlinks(col("html")).as("ls")).head().getSeq[String](0)
    assert(links == Seq(Urls.urlOf(Html.outlinkTarget(9L))))
  }

  test("extraction feeds qualityFilter: flattened extracted text flows through the battery") {
    import spark.implicits._
    val pages = Seq((5L, Html.wrapLine(5L, "the a is and the a is and word word."))).toDF("id", "html")
    val flat = pages.select(col("id"),
      call_function("replace", Html.extractText(col("html")), lit("\n"), lit(" ")).as("text"))
    val qf = TextOps.qualityFilter(flat, "id", "text").head()
    assert(qf.getAs[Boolean]("ok_len"), "flattened extraction must clear MinWords")
  }
}
