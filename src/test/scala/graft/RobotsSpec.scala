package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** REP (robots-exclusion) resolution semantics (Robots.scala). The
  * oracle row (q_robots_filter) pins engine agreement over the full
  * fixture; this spec pins the rule-resolution edges in isolation.
  */
class RobotsSpec extends SparkSpec {

  private def resolve(url: String): (Boolean, String) = {
    import spark.implicits._
    val r = Robots.filter(Seq((1L, url)).toDF("id", "url"), "id", "url",
      Robots.fixtureRules(spark)).head()
    (r.getBoolean(2), r.getString(3))
  }

  test("default allow: a host with no rules, and a ruled host's unruled path") {
    // site2 (2 % 3 == 2): no rules at all
    assert(resolve("https://site2.net/Articles/5") == (true, ""))
    // site1 (1 % 3 == 1): rules exist but only under /Articles/1
    assert(resolve("https://site1.org/Articles/5") == (true, ""))
    // site0 blocks /Articles/ but not other paths
    assert(resolve("https://site0.com/about") == (true, ""))
  }

  test("disallow: the /Articles/ block on n%3==0 hosts, prefix semantics") {
    assert(resolve("https://site0.com/Articles/7") == (false, "/Articles/"))
    assert(resolve("https://site3.com/Articles/") == (false, "/Articles/"))
  }

  test("most-specific wins: /Articles/12 allow overrides the /Articles/1 disallow") {
    // /Articles/1, /Articles/10, /Articles/19 hit the disallow
    assert(resolve("https://site1.org/Articles/1") == (false, "/Articles/1"))
    assert(resolve("https://site1.org/Articles/19") == (false, "/Articles/1"))
    // the longer allow prefix wins for /Articles/12*
    assert(resolve("https://site1.org/Articles/12") == (true, "/Articles/12"))
    assert(resolve("https://site1.org/Articles/120") == (true, "/Articles/12"))
  }

  test("WWW/case noise does not evade the rules (host is lowercased before keying)") {
    assert(resolve("HTTPS://WWW.SITE0.COM/Articles/7")._1 == false)
  }

  test("q_robots_filter: rules broadcast; the frontier itself NEVER shuffles (map-side resolution)") {
    val p = SparkEntry.queries("q_robots_filter")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"rules side should broadcast:\n$p")
    // the PROBE side (the frontier: lines between the join and its
    // build-side BroadcastExchange) must not shuffle; the tiny rules
    // aggregate under the BroadcastExchange is the build side's own
    val lines = p.linesIterator.toList
    val probe = lines.drop(lines.indexWhere(_.contains("BroadcastHashJoin")) + 1)
      .takeWhile(!_.contains("BroadcastExchange"))
    assert(probe.nonEmpty && !probe.exists(_.contains("Exchange")),
      s"URL frontier should stay map-local, found a shuffle on the probe side:\n$p")
    assert(!p.contains("WindowGroupLimit") && !p.contains("Window"),
      s"resolution should be a map-side projection, not a window:\n$p")
  }

  // --- REP user-agent groups + crawl-delay (politeness tier) ---

  private def schedule(rows: Seq[(Long, String, Long)],
      admittedOnly: Boolean = true) = {
    import spark.implicits._
    val (rules, delays) = Robots.fixtureGroups(spark)
    Robots.frontierSchedule(rows.toDF("doc_id", "url", "t_us"),
      "doc_id", "url", "t_us", rules, delays, admittedOnly)
      .collect()
  }

  test("agent group wins OUTRIGHT where present: site0's generic article block does not bind graftbot") {
    // site0: '*' blocks /Articles/ entirely; graftbot group (n%5==0)
    // only blocks /Articles/13 — groups never merge
    val got = schedule(Seq(
      (1L, "https://site0.com/Articles/7", 0L),
      (2L, "https://site0.com/Articles/13", 10L * 1000000L),
      (3L, "https://site0.com/Articles/130", 20L * 1000000L)))
    assert(got.map(_.getLong(0)).toSet == Set(1L)) // 13/130 blocked by graftbot's own rule
  }

  test("sites without an agent group fall back to the * group") {
    // site1 (n%5!=0): '*' blocks /Articles/1 but re-allows /Articles/12
    val got = schedule(Seq(
      (1L, "https://site1.org/Articles/12", 0L),
      (2L, "https://site1.org/Articles/1", 10L * 1000000L)))
    assert(got.map(_.getLong(0)).toSet == Set(1L))
  }

  test("crawl-delay admits one fetch per host per its own window, first by (t, id)") {
    // site2 (no agent group): '*' delay = 1 + 2%3 = 3 s
    val got = schedule(Seq(
      (1L, "https://site2.co.uk/Articles/2", 1000000L), // window 0
      (2L, "https://site2.co.uk/Articles/2", 2000000L), // window 0 — dropped
      (3L, "https://site2.co.uk/Articles/2", 3500000L), // window 1
      (4L, "https://site7.io/Articles/7", 1500000L))) // other host, own window
    assert(got.map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getLong(3) == 3L) // delay_s
    assert(r1.getLong(5) == 1L) // rk: admitted first
  }

  test("pre-admission form carries every allowed row with its window (the streaming feed)") {
    val got = schedule(Seq(
      (1L, "https://site2.co.uk/Articles/2", 1000000L),
      (2L, "https://site2.co.uk/Articles/2", 2000000L)), admittedOnly = false)
    assert(got.length == 2)
    assert(got.map(r => r.getLong(4)).toSet == Set(0L)) // same bucket
  }

  test("q_frontier_schedule: delay tables broadcast; the only row shuffle is the throttle's own") {
    val p = SparkEntry.queries("q_frontier_schedule")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"group/delay sides should broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"admission should rank via WindowGroupLimit:\n$p")
    assert(!p.contains("SortMergeJoin"), s"frontier must not sort-merge join:\n$p")
  }

  // --- robots.txt TEXT parse (RFC 9309 group semantics) -----------------

  test("robots.txt parse: consecutive user-agent lines form ONE group; a later UA starts a new one") {
    val txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n" +
      "User-agent: c\nDisallow: /y\n"
    val rows = graft.operators.Robots.parseRobotsTxt(txt)
    assert(rows.contains(("a", "disallow", "/x")))
    assert(rows.contains(("b", "disallow", "/x")))
    assert(rows.contains(("c", "disallow", "/y")))
    assert(!rows.contains(("a", "disallow", "/y")) && !rows.contains(("b", "disallow", "/y")))
  }

  test("robots.txt parse: repeated user-agent lines in one group do not duplicate rules") {
    val rows = graft.operators.Robots.parseRobotsTxt(
      "User-agent: *\nUser-agent: *\nDisallow: /x\n")
    assert(rows == Seq(("*", "disallow", "/x")))
  }

  test("robots.txt parse: lenient skips — comments, unknown fields, empty Disallow, orphan rules") {
    val txt = "# header comment\nDisallow: /orphan\n" + // rule before any group: dropped
      "User-agent: *\nDisallow:\n" + // empty value: allow-all, NO rule row
      "Allow: /ok # trailing comment\n" +
      "Host: example.com\n" + // unknown field ignored
      "not a field line\n" +
      "Sitemap: https://x.example/s.xml.gz\n"
    val rows = graft.operators.Robots.parseRobotsTxt(txt)
    assert(rows == Seq(("*", "allow", "/ok"), ("", "sitemap", "https://x.example/s.xml.gz")))
  }

  test("robots.txt parse: CRLF, mixed field case, agent lowercased; fixture round-trips its groups") {
    val rows = graft.operators.Robots.parseRobotsTxt(
      "USER-AGENT: GraftBot\r\nDISALLOW: /z\r\n")
    assert(rows == Seq(("graftbot", "disallow", "/z")))
    // every fixture site parses to exactly its fixtureGroups rows
    for (n <- 0 until graft.operators.Robots.NumSites) {
      val parsed = graft.operators.Robots.parseRobotsTxt(
        graft.operators.Robots.renderRobotsTxt(n))
      val pathRules = parsed.filter(r => r._2 == "allow" || r._2 == "disallow")
      val expected = Seq(
        if (n % 3 == 0) Seq(("*", "disallow", "/Articles/")) else Nil,
        if (n % 3 == 1) Seq(("*", "disallow", "/Articles/1"),
          ("*", "allow", "/Articles/12")) else Nil,
        if (n % 5 == 0) Seq((graft.operators.Robots.Agent, "disallow", "/Articles/13"))
        else Nil).flatten
      assert(pathRules == expected, s"site $n path rules")
      val delays = parsed.filter(_._2 == "crawl-delay")
      assert(delays.contains(("*", "crawl-delay", (1 + n % 3).toString)))
      assert(parsed.count(_._2 == "sitemap") == 2, s"site $n sitemap directives")
    }
  }
}
