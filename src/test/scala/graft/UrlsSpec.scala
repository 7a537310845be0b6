package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** URL curation semantics (Urls.scala). The oracle-hash rows
  * (q_url_parse / q_url_normalize / q_url_dedup / q_domain_stats /
  * q_domain_cap) pin engine agreement over the full fixture; this spec
  * pins each canonicalization rule and the parse edges in isolation.
  */
class UrlsSpec extends SparkSpec {

  private def canonOf(url: String): String = {
    import spark.implicits._
    Urls.normalize(Seq((1L, url)).toDF("id", "url"), "id", "url")
      .head().getString(2)
  }

  private def parseOne(url: String) = {
    import spark.implicits._
    Urls.parse(Seq((1L, url)).toDF("id", "url"), "id", "url").head()
  }

  test("parse splits scheme/host/port/path/query/fragment, case preserved") {
    val r = parseOne("HTTPS://WWW.Site3.co.uk:8080/Articles/7?page=3&x=1#sec-2")
    assert(r.getString(2) == "HTTPS")
    assert(r.getString(3) == "WWW.Site3.co.uk")
    assert(r.getLong(4) == 8080L)
    assert(r.getString(5) == "/Articles/7")
    assert(r.getString(6) == "page=3&x=1")
    assert(r.getString(7) == "sec-2")
  }

  test("port is NULL when absent; query/fragment empty when absent") {
    val r = parseOne("http://a.com/x")
    assert(r.isNullAt(4))
    assert(r.getString(6) == "" && r.getString(7) == "")
  }

  test("registered domain: eTLD+1 keeps three labels under co.uk-style suffixes, two otherwise, bare host unchanged") {
    val r1 = parseOne("https://news.site3.co.uk/x")
    assert(r1.getString(8) == "site3.co.uk")
    val r2 = parseOne("https://a.b.site4.io/x")
    assert(r2.getString(8) == "site4.io")
    val r3 = parseOne("https://localhost/x")
    assert(r3.getString(8) == "localhost")
  }

  test("canonical: lowercases scheme+host, strips www and the DEFAULT port only") {
    assert(canonOf("HTTPS://WWW.Site3.COM:443/A") == "https://site3.com/A")
    assert(canonOf("http://www.site3.com:80/A") == "http://site3.com/A")
    // non-default port survives; path case survives
    assert(canonOf("https://site3.com:8080/A") == "https://site3.com:8080/A")
    // 443 is only default for https
    assert(canonOf("http://site3.com:443/A") == "http://site3.com:443/A")
  }

  test("canonical: strips /index.html and the trailing slash, but keeps the root path") {
    assert(canonOf("https://a.com/Articles/7/index.html") == "https://a.com/Articles/7")
    assert(canonOf("https://a.com/Articles/7/") == "https://a.com/Articles/7")
    assert(canonOf("https://a.com/") == "https://a.com/")
    // no path at all canonicalizes to root
    assert(canonOf("https://a.com") == "https://a.com/")
    // /index.html at root collapses to root, not empty
    assert(canonOf("https://a.com/index.html") == "https://a.com/")
  }

  test("canonical: drops utm_* params, sorts survivors, drops ? when none survive, drops fragment") {
    assert(canonOf("https://a.com/x?utm_source=feed&page=3") == "https://a.com/x?page=3")
    assert(canonOf("https://a.com/x?page=3&utm_campaign=mail") == "https://a.com/x?page=3")
    // param ORDER is transport noise: sorted survivors agree
    assert(canonOf("https://a.com/x?b=2&a=1") == canonOf("https://a.com/x?a=1&b=2"))
    assert(canonOf("https://a.com/x?utm_source=f") == "https://a.com/x")
    assert(canonOf("https://a.com/x#frag") == "https://a.com/x")
    // a non-utm param that merely CONTAINS utm survives
    assert(canonOf("https://a.com/x?xutm_k=1") == "https://a.com/x?xutm_k=1")
  }

  test("the fixture's re-crawl variants collapse: same page key, different noise") {
    import spark.implicits._
    // doc ids congruent mod 150 share page identity; pick ids whose
    // decorations are pure NOISE (scheme case, www, host case, DEFAULT
    // port, utm side, /index.html, trailing slash, fragment) — i.e.
    // avoid %7==1 (a real :8080 endpoint) and %13==0 (no query at all),
    // which are semantic differences canonicalization must PRESERVE
    val df = Seq(12L, 462L, 612L, 762L).toDF("doc_id")
      .select(col("doc_id"), Urls.urlCol(col("doc_id")).as("url"))
    val urls = df.orderBy("doc_id").collect().map(_.getString(1))
    assert(urls.distinct.length == urls.length, "fixture noise should differ per crawl")
    val canons = Urls.normalize(df, "doc_id", "url")
      .select("canonical").distinct().collect().map(_.getString(0))
    assert(canons.length == 1, s"variants did not collapse: ${canons.mkString(" | ")}")
  }

  test("dedupCanonical keeps the FIRST id and counts the group") {
    import spark.implicits._
    val df = Seq(612L, 12L, 462L).toDF("doc_id")
      .select(col("doc_id"), Urls.urlCol(col("doc_id")).as("url"))
    val r = Urls.dedupCanonical(df, "doc_id", "url").head()
    assert(r.getLong(1) == 12L && r.getLong(2) == 3L)
  }

  test("the JVM renderer urlOf is in LOCKSTEP with the in-plan column urlCol") {
    import spark.implicits._
    val ids = (0L until 1200L)
    val fromPlan = ids.toDF("doc_id")
      .select(col("doc_id"), Urls.urlCol(col("doc_id")).as("url"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val fromJvm = ids.map(Urls.urlOf).toArray
    assert(fromPlan.sameElements(fromJvm),
      ids.zip(fromPlan.zip(fromJvm)).find { case (_, (a, b)) => a != b }
        .map { case (i, (a, b)) => s"diverged at $i: plan=$a jvm=$b" }
        .getOrElse(""))
  }

  test("the WARC shard carries the fixture URL as WARC-Target-URI, byte-exact through gzip + framing") {
    import spark.implicits._
    val shard = Warc.renderShard(0, Seq((12L, "twelve words here."), (463L, "more.")))
    val uris = Warc.records(Seq(Tuple1(shard)).toDF("content"))
      .filter(col("warc_type") === "response")
      .select("target_uri").collect().map(_.getString(0)).sorted
    assert(uris.sameElements(Array(Urls.urlOf(12L), Urls.urlOf(463L)).sorted))
  }

  test("q_url_parse / q_url_normalize are exchange-free map work") {
    for (q <- Seq("q_url_parse", "q_url_normalize")) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"$q should be map-only, found a shuffle:\n$p")
      assert(!p.contains("Join"), s"$q should not join:\n$p")
    }
  }

  test("q_domain_cap plans a partial WindowGroupLimit below the exchange") {
    val p = SparkEntry.queries("q_domain_cap")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k did not plan as WindowGroupLimit:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"no PARTIAL group limit below the exchange:\n$p")
  }

  test("frontierKeepFirst plans a partial WindowGroupLimit top-1 (the curated flagship's cut stage)") {
    // the flagship query itself checkpoints downstream (corpusBuildTail),
    // which truncates the visible plan — pin the frontier STAGE directly
    import spark.implicits._
    val recs = Seq((1L, "https://a.com/x", "<urn:uuid:r-1>"),
        (2L, "https://a.com/x?utm_source=f", "<urn:uuid:r-2>"))
      .toDF("doc_id", "target_uri", "record_id")
    val kept = Urls.frontierKeepFirst(recs, "target_uri", "record_id")
    val p = kept.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"keep-first per canonical did not plan as WindowGroupLimit:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"no PARTIAL group limit below the exchange:\n$p")
    // semantics: the utm re-crawl collapses onto the first record id
    val rows = kept.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
  }

  test("q_url_dedup / q_domain_stats are a single hash aggregate, no join") {
    for (q <- Seq("q_url_dedup", "q_domain_stats")) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"$q should not join:\n$p")
      assert(!p.contains("SortAggregate") || p.contains("HashAggregate"),
        s"$q should hash-aggregate:\n$p")
    }
  }
}
