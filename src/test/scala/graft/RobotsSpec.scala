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
}
