package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Robots-exclusion (REP) compliance — the crawl-frontier gate that
  * runs beside [[Urls]] curation: given per-host allow/disallow
  * path-prefix rules, each URL resolves to the MOST SPECIFIC matching
  * rule (longest prefix wins; at equal length `allow` wins — the
  * published REP tie-break), default allow when nothing matches.
  *
  * Shape at 100 TB: the rules table is robots.txt-derived and tiny
  * (per-host lines) — it BROADCASTS; the URL side stays map-local
  * through the join, and the most-specific-rule cut is a per-URL top-1
  * (partial WindowGroupLimit below the exchange on the url id).
  *
  * Fixture discipline: rules are rendered in-plan from the site index
  * (mirrored in SQL via a `range()` CTE), so both engines face the
  * identical rule set — site n ≡ 0 (mod 3) blocks all articles,
  * n ≡ 1 (mod 3) blocks the `/Articles/1` prefix but re-allows the
  * more specific `/Articles/12`, n ≡ 2 (mod 3) publishes no rules.
  */
object Robots {

  /** Max site index in the [[Urls]] fixture (host = site{k%23}.tld). */
  val NumSites = 23

  /** Fixture rules: (site_n, prefix, allow). */
  def fixtureRules(spark: SparkSession): DataFrame = {
    val n = col("id").cast("int").as("site_n")
    val base = spark.range(NumSites.toLong)
    val blockAll = base.filter(col("id") % 3 === 0)
      .select(n, lit("/Articles/").as("prefix"), lit(false).as("allow"))
    val blockOne = base.filter(col("id") % 3 === 1)
      .select(n, lit("/Articles/1").as("prefix"), lit(false).as("allow"))
    val reAllow = base.filter(col("id") % 3 === 1)
      .select(n, lit("/Articles/12").as("prefix"), lit(true).as("allow"))
    blockAll.union(blockOne).union(reAllow)
  }

  /** The same rules as a DuckDB CTE named `rules`. */
  val fixtureRulesSqlCte: String =
    s"""rules AS (
          SELECT CAST(n AS INT) AS site_n, '/Articles/' AS prefix, FALSE AS allow
          FROM range(0, $NumSites) t(n) WHERE n % 3 = 0
          UNION ALL
          SELECT CAST(n AS INT), '/Articles/1', FALSE
          FROM range(0, $NumSites) t(n) WHERE n % 3 = 1
          UNION ALL
          SELECT CAST(n AS INT), '/Articles/12', TRUE
          FROM range(0, $NumSites) t(n) WHERE n % 3 = 1)"""

  /** REP resolution: for each row of `urls` (idCol, urlColName), emit
    * (idCol, url, allowed, matched_prefix) where matched_prefix is ''
    * when no rule matched. `rules` must be (site_n, prefix, allow);
    * site_n is recovered from the fixture host shape.
    *
    * The rules are grouped to one ARRAY per site and broadcast, and the
    * most-specific rule resolves MAP-SIDE in a projection (array_max
    * over (length, allow, prefix) structs — longest prefix wins, allow
    * wins ties, the REP tie-break): the URL frontier itself never
    * shuffles. A first draft cut with row_number() over the URL id —
    * but the id is UNIQUE, so the partial WindowGroupLimit forwarded
    * every row and the exchange moved the whole frontier for a cut
    * that needs none.
    */
  def filter(urls: DataFrame, idCol: String, urlColName: String,
      rules: DataFrame): DataFrame = {
    val siteRules = rules.groupBy(col("site_n"))
      .agg(collect_list(struct(col("prefix"), col("allow"))).as("rules"))
    val u = col(urlColName)
    val withKey = urls.select(col(idCol), u,
      // anchored to the fixture host shape ([WWW.]site<n>.<tld>) so a
      // host merely CONTAINING 'site<digits>' (mysite1.example.com)
      // can't key the wrong rule set; a production path joins rules on
      // the full registered domain instead of this fixture key
      regexp_extract(lower(Urls.hostOf(u)), "^(?:www\\.)?site([0-9]+)\\.", 1)
        .cast("int").as("site_n"),
      regexp_extract(u, Urls.UrlRegex, 3).as("path"))
    val matched = filter_(coalesce(col("rules"),
        array().cast("array<struct<prefix:string,allow:boolean>>")),
      r => col("path").startsWith(r.getField("prefix")))
    val best = array_max(transform(matched, r =>
      struct(length(r.getField("prefix")).as("l"),
        r.getField("allow").as("a"), r.getField("prefix").as("p"))))
    withKey.join(broadcast(siteRules), Seq("site_n"), "left")
      .select(col(idCol), u,
        coalesce(best.getField("a"), lit(true)).as("allowed"),
        coalesce(best.getField("p"), lit("")).as("matched_prefix"))
  }

  // the HOF `filter` collides with this object's own filter; alias it
  private def filter_(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.filter(c, f)

  /** Oracle mirror over the `parsed` CTE (doc_id, host, path) +
    * [[fixtureRulesSqlCte]]: same join, same most-specific resolution
    * — (length DESC, allow DESC, prefix DESC), the exact order
    * array_max induces on the Spark side's (l, a, p) structs.
    */
  val filterSql: String =
    s"""SELECT doc_id, url,
          COALESCE(allow, TRUE) AS allowed,
          COALESCE(prefix, '') AS matched_prefix
        FROM (
          SELECT p.doc_id, p.url, r.allow, r.prefix,
            ROW_NUMBER() OVER (PARTITION BY p.doc_id
              ORDER BY length(r.prefix) DESC NULLS LAST,
                       r.allow DESC NULLS LAST,
                       r.prefix DESC NULLS LAST) AS rn
          FROM (SELECT doc_id, url,
                  CAST(regexp_extract(lower(host), '^(?:www\\.)?site([0-9]+)\\.', 1) AS INT) AS site_n,
                  path
                FROM parsed) p
          LEFT JOIN rules r
            ON p.site_n = r.site_n AND starts_with(p.path, r.prefix)) m
        WHERE rn = 1"""
}
