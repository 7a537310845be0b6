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

  test("registered domain: PSL private-section and registry suffixes the label heuristic gets wrong") {
    // github.io is a (private-section) public suffix: each user site is
    // its own registrant — a two-label heuristic would collapse every
    // *.github.io host into one 'github.io' domain
    assert(parseOne("https://site5.github.io/x").getString(8) == "site5.github.io")
    assert(parseOne("https://deep.site5.github.io/x").getString(8) == "site5.github.io")
    // registry suffix under a ccTLD
    assert(parseOne("https://www.site9.co.jp/x").getString(8) == "site9.co.jp")
    // a PSL-absent multi-label host keeps the default one-label suffix
    assert(parseOne("https://a.b.example.zz/x").getString(8) == "example.zz")
  }

  test("registered domain: wildcard and exception rules (the *.ck / !www.ck pair)") {
    // *.ck: every child of ck is itself a public suffix
    assert(parseOne("https://shop.thing.ck/x").getString(8) == "shop.thing.ck")
    // !www.ck: exception makes www.ck registrable
    assert(parseOne("https://www.ck/x").getString(8) == "www.ck")
    assert(parseOne("https://sub.www.ck/x").getString(8) == "www.ck")
    // host that IS a public suffix falls back to itself
    assert(parseOne("https://co.uk/x").getString(8) == "co.uk")
  }

  test("resolveDomain agrees with the generated SQL mirror across rule classes") {
    import spark.implicits._
    val hosts = Seq("news.site3.co.uk", "a.b.site4.io", "localhost",
      "site5.github.io", "deep.site5.github.io", "www.site9.co.jp",
      "a.b.example.zz", "shop.thing.ck", "www.ck", "sub.www.ck", "co.uk",
      "thing.ck", "ck", "github.io")
    val got = Urls.resolveDomain(hosts.toDF("h"), col("h"), "domain")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // evaluate the DuckDB-dialect mirror via its rule semantics in Scala
    def mirror(h: String): String = {
      val lb = h.split('.')
      val n = lb.length
      def suf(j: Int) = lb.takeRight(j).mkString(".")
      val rows = Urls.pslRows.map(r => r._1 -> r).toMap
      val x = (1 to Urls.PslMaxLabels).collectFirst {
        case j if n >= j && rows.get(suf(j)).exists(_._4) => j - 1
      }
      val cand = (1 to Urls.PslMaxLabels).flatMap { j =>
        val r = if (n >= j) rows.get(suf(j)) else None
        Seq(r.filter(_._2).map(_ => j), r.filter(_._3).filter(_ => n >= j + 1).map(_ => j + 1)).flatten
      }
      val pub = x.getOrElse((cand :+ 1).max)
      lb.takeRight(math.min(n, pub + 1)).mkString(".")
    }
    hosts.foreach(h => assert(got(h) == mirror(h), s"host $h: ${got(h)} vs ${mirror(h)}"))
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

  test("q_url_parse / q_url_normalize are shuffle-free (PSL probes broadcast, rows never move)") {
    // q_url_parse's domain resolution probes the broadcast PSL
    // snapshot (BroadcastHashJoin per suffix length) — build-side-only
    // exchanges; the URL rows themselves must never shuffle
    for (q <- Seq("q_url_parse", "q_url_normalize")) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      // shuffle exchanges print as 'Exchange hashpartitioning/…' — the
      // only Exchange nodes allowed are the PSL build side's broadcasts
      val shuffles = p.linesIterator
        .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
        .toList
      assert(shuffles.isEmpty, s"$q rows should never shuffle:\n$shuffles\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q must not sort-merge join:\n$p")
      if (q == "q_url_parse")
        assert(p.contains("BroadcastHashJoin"), s"$q should probe the broadcast PSL:\n$p")
      else
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

  test("q_url_dedup / q_domain_stats aggregate without moving rows for the PSL probe") {
    for (q <- Seq("q_url_dedup", "q_domain_stats")) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q must not shuffle-join (PSL probes are broadcast-only):\n$p")
      assert(!p.contains("SortAggregate") || p.contains("HashAggregate"),
        s"$q should hash-aggregate:\n$p")
      if (q == "q_url_dedup")
        assert(!p.contains("Join"), s"$q should not join at all:\n$p")
    }
  }
}
