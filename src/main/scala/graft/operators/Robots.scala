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
      rules: DataFrame): DataFrame =
    filterKeeping(urls, idCol, urlColName, rules, Nil)
      .select(col(idCol), col(urlColName),
        col("allowed"), col("matched_prefix"))

  /** [[filter]] keeping extra passthrough columns plus the recovered
    * `site_n` — the form composed operators (the politeness scheduler)
    * build on.
    */
  private[graft] def filterKeeping(urls: DataFrame, idCol: String,
      urlColName: String, rules: DataFrame,
      extra: Seq[String]): DataFrame = {
    val siteRules = rules.groupBy(col("site_n"))
      .agg(collect_list(struct(col("prefix"), col("allow"))).as("rules"))
    val u = col(urlColName)
    val withKey = urls.select((Seq(col(idCol), u,
      // anchored to the fixture host shape ([WWW.]site<n>.<tld>) so a
      // host merely CONTAINING 'site<digits>' (mysite1.example.com)
      // can't key the wrong rule set; a production path joins rules on
      // the full registered domain instead of this fixture key
      regexp_extract(lower(Urls.hostOf(u)), "^(?:www\\.)?site([0-9]+)\\.", 1)
        .cast("int").as("site_n"),
      regexp_extract(u, Urls.UrlRegex, 3).as("path")) ++ extra.map(col)): _*)
    val matched = filter_(coalesce(col("rules"),
        array().cast("array<struct<prefix:string,allow:boolean>>")),
      r => col("path").startsWith(r.getField("prefix")))
    val best = array_max(transform(matched, r =>
      struct(length(r.getField("prefix")).as("l"),
        r.getField("allow").as("a"), r.getField("prefix").as("p"))))
    withKey.join(broadcast(siteRules), Seq("site_n"), "left")
      .select((Seq(col(idCol), u, col("site_n"),
        coalesce(best.getField("a"), lit(true)).as("allowed"),
        coalesce(best.getField("p"), lit("")).as("matched_prefix")) ++
        extra.map(col)): _*)
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

  // ---------------------------------------------------------------------
  // REP user-agent groups + crawl-delay → frontier politeness schedule
  // ---------------------------------------------------------------------

  /** Our crawler's product token. REP group resolution: a robots.txt
    * is a set of GROUPS, each headed by user-agent lines; a crawler
    * obeys the most specific matching group ONLY (groups do not
    * merge) — if a `graftbot` group exists it wins outright, else the
    * `*` group applies.
    */
  val Agent = "graftbot"

  /** Fixture groups: every site publishes a `*` group carrying the
    * [[fixtureRules]] path rules plus `Crawl-delay: 1 + n%3`; sites
    * n ≡ 0 (mod 5) ALSO publish a `graftbot` group (disallow
    * `/Articles/13` only, `Crawl-delay: 2`) — on those sites the
    * generic article blocks must NOT apply to us (the whitelisted-bot
    * pattern), which is exactly what group resolution has to get
    * right. Returned as (rules', delays): (site_n, agent, prefix,
    * allow) and (site_n, agent, delay_s).
    */
  def fixtureGroups(spark: SparkSession): (DataFrame, DataFrame) = {
    val n = col("id").cast("int").as("site_n")
    val base = spark.range(NumSites.toLong)
    val star = fixtureRules(spark).withColumn("agent", lit("*"))
      .select(col("site_n"), col("agent"), col("prefix"), col("allow"))
    val bot = base.filter(col("id") % 5 === 0)
      .select(n, lit(Agent).as("agent"),
        lit("/Articles/13").as("prefix"), lit(false).as("allow"))
    val delays = base.select(n, lit("*").as("agent"),
        (lit(1) + col("id") % 3).cast("long").as("delay_s"))
      .union(base.filter(col("id") % 5 === 0)
        .select(n, lit(Agent).as("agent"), lit(2L).as("delay_s")))
    (star.union(bot), delays)
  }

  /** The same groups as DuckDB CTEs `grules` / `gdelays`. */
  val fixtureGroupsSqlCte: String =
    s"""grules AS (
          SELECT site_n, '*' AS agent, prefix, allow FROM rules
          UNION ALL
          SELECT CAST(n AS INT), '$Agent', '/Articles/13', FALSE
          FROM range(0, $NumSites) t(n) WHERE n % 5 = 0),
        gdelays AS (
          SELECT CAST(n AS INT) AS site_n, '*' AS agent,
                 CAST(1 + n % 3 AS BIGINT) AS delay_s
          FROM range(0, $NumSites) t(n)
          UNION ALL
          SELECT CAST(n AS INT), '$Agent', 2
          FROM range(0, $NumSites) t(n) WHERE n % 5 = 0)"""

  /** Frontier politeness schedule: REP group resolution for [[Agent]]
    * (agent group wins outright where present), path-rule gate, then
    * per-host crawl-delay admission — at most ONE fetch per host per
    * its own delay window, first by (t, id) — via the generalized
    * [[Sampling.throttle]] (per-row bucket width). Output: admitted
    * fetches (idCol, url, site_n, delay_s, bucket, rk).
    *
    * Scale shape: the group/delay tables are robots.txt-derived and
    * tiny (broadcast); the frontier's only exchange is the throttle's
    * own (site, bucket) shuffle, WindowGroupLimit-cut map-side first —
    * a flooding host forwards one row per partition per window, never
    * its whole queue.
    */
  def frontierSchedule(urls: DataFrame, idCol: String, urlColName: String,
      tsUsCol: String, rules: DataFrame, delays: DataFrame,
      admittedOnly: Boolean = true): DataFrame = {
    val agentSites = rules.filter(col("agent") === Agent).select(col("site_n"))
      .union(delays.filter(col("agent") === Agent).select(col("site_n")))
      .distinct().withColumn("__has_agent", lit(true))
    def effective(df: DataFrame): DataFrame =
      df.join(agentSites, Seq("site_n"), "left")
        .filter((col("__has_agent").isNotNull && col("agent") === Agent) ||
          (col("__has_agent").isNull && col("agent") === "*"))
        .drop("__has_agent", "agent")
    val allowed = filterKeeping(urls, idCol, urlColName,
        effective(rules), Seq(tsUsCol))
      .filter(col("allowed"))
    val sched = allowed
      .join(broadcast(effective(delays)), Seq("site_n"), "left")
    val width = greatest(coalesce(col("delay_s"), lit(0L)) * 1000000L, lit(1L))
    if (admittedOnly)
      Sampling.throttle(sched, "site_n", tsUsCol, idCol, width, k = 1)
        .select(col(idCol), col(urlColName), col("site_n"),
          coalesce(col("delay_s"), lit(0L)).as("delay_s"),
          col("bucket"), col("rk").cast("long").as("rk"))
    else // pre-admission rows with their windows — the streaming feed
      sched.withColumn("bucket", Sampling.bucketOf(col(tsUsCol), width))
        .select(col(idCol), col(urlColName), col("site_n"),
          coalesce(col("delay_s"), lit(0L)).as("delay_s"),
          col("bucket"), col(tsUsCol))
  }

  /** Oracle mirror of [[frontierSchedule]] over the `parsed` CTE +
    * [[fixtureRulesSqlCte]] + [[fixtureGroupsSqlCte]]; `tsUsExpr` must
    * render the same arrival timestamps the query derives.
    */
  def frontierScheduleSql(tsUsExpr: String): String =
    s"""SELECT doc_id, url, site_n, delay_s, bucket, rk FROM (
          SELECT a.doc_id, a.url, a.site_n,
            COALESCE(d.delay_s, 0) AS delay_s,
            a.t_us // GREATEST(COALESCE(d.delay_s, 0) * 1000000, 1) AS bucket,
            ROW_NUMBER() OVER (
              PARTITION BY a.site_n,
                a.t_us // GREATEST(COALESCE(d.delay_s, 0) * 1000000, 1)
              ORDER BY a.t_us, a.doc_id) AS rk
          FROM (
            SELECT doc_id, url, site_n, t_us FROM (
              SELECT p.doc_id, p.url, p.site_n, p.t_us, r.allow, r.prefix,
                ROW_NUMBER() OVER (PARTITION BY p.doc_id
                  ORDER BY length(r.prefix) DESC NULLS LAST,
                           r.allow DESC NULLS LAST,
                           r.prefix DESC NULLS LAST) AS rn
              FROM (SELECT doc_id, url,
                      CAST(regexp_extract(lower(host), '^(?:www\\.)?site([0-9]+)\\.', 1) AS INT) AS site_n,
                      path, $tsUsExpr AS t_us
                    FROM parsed) p
              LEFT JOIN (SELECT g.site_n, g.prefix, g.allow FROM grules g
                         LEFT JOIN (SELECT DISTINCT site_n FROM grules WHERE agent = '$Agent'
                                    UNION SELECT DISTINCT site_n FROM gdelays WHERE agent = '$Agent') ag
                           ON g.site_n = ag.site_n
                         WHERE (ag.site_n IS NOT NULL AND g.agent = '$Agent')
                            OR (ag.site_n IS NULL AND g.agent = '*')) r
                ON p.site_n = r.site_n AND starts_with(p.path, r.prefix)) m
            WHERE rn = 1 AND COALESCE(allow, TRUE)) a
          LEFT JOIN (SELECT g.site_n, g.delay_s FROM gdelays g
                     LEFT JOIN (SELECT DISTINCT site_n FROM grules WHERE agent = '$Agent'
                                UNION SELECT DISTINCT site_n FROM gdelays WHERE agent = '$Agent') ag
                       ON g.site_n = ag.site_n
                     WHERE (ag.site_n IS NOT NULL AND g.agent = '$Agent')
                        OR (ag.site_n IS NULL AND g.agent = '*')) d
            ON a.site_n = d.site_n) s
        WHERE rk = 1"""

  // ---------------------------------------------------------------------
  // robots.txt TEXT layer — until this round the rule tables were
  // "robots.txt-derived" by assumption; this is the derivation: real
  // robots.txt bytes → RFC 9309 group parse → the same (site_n, agent,
  // prefix, allow) / crawl-delay rows the filter and scheduler consume,
  // plus the Sitemap: discovery directives.
  // ---------------------------------------------------------------------

  /** Render site n's robots.txt — the SAME groups as [[fixtureGroups]]
    * (so text-parsed rules can share the in-plan fixtures' oracles
    * verbatim) dressed in wire realism the parser must absorb: mixed
    * field-name case, CRLF on odd sites, a comment header, an inline
    * comment, an EMPTY Disallow (legal; means allow-all and must yield
    * NO rule), an unknown field, and per-site `Sitemap:` directives
    * naming the gzipped leaf sitemaps of the [[Urls.sitemapIndexSeeds]]
    * fixture.
    */
  def renderRobotsTxt(n: Int): String = {
    val eol = if (n % 2 == 0) "\n" else "\r\n"
    val sb = new StringBuilder
    sb ++= s"# graft fixture robots.txt, site $n$eol"
    sb ++= (if (n % 2 == 0) "User-agent: *" else "USER-AGENT: *") + eol
    if (n % 3 == 0) sb ++= s"Disallow: /Articles/$eol"
    if (n % 3 == 1) {
      sb ++= s"Disallow: /Articles/1$eol"
      sb ++= s"Allow: /Articles/12 # more specific re-allow$eol"
    }
    if (n % 3 == 2) sb ++= s"Disallow:$eol" // empty value = allow all = NO rule
    sb ++= s"Crawl-delay: ${1 + n % 3}$eol"
    sb ++= s"Host: site$n.example$eol" // unknown-to-us field: ignored
    if (n % 5 == 0) {
      sb ++= eol // blank lines are insignificant per RFC 9309
      sb ++= s"User-agent: $Agent$eol"
      sb ++= s"Disallow: /Articles/13$eol"
      sb ++= s"Crawl-delay: 2$eol"
    }
    sb ++= eol
    sb ++= s"Sitemap: https://site$n.example/leaf-site$n-p0.xml.gz$eol"
    sb ++= s"Sitemap: https://site$n.example/leaf-site$n-p1.xml.gz$eol"
    sb.toString
  }

  /** RFC 9309 group parse of one robots.txt body → (agent, kind,
    * value) rows; kinds `allow`/`disallow`/`crawl-delay` carry their
    * group's agent (one row PER agent for multi-agent groups),
    * `sitemap` rows are group-independent (agent ''). LENIENT by the
    * protocol's own design: unknown fields, comments, blank lines,
    * malformed lines, and empty allow/disallow values are skipped —
    * robots.txt has no fail-closed mode (an unreadable file means
    * crawl-with-care, not crash).
    *
    * Group semantics: consecutive user-agent lines accumulate ONE
    * group's agent set; the first rule line closes the set; a later
    * user-agent line starts a NEW group. Rules before any user-agent
    * line have no group and are dropped.
    */
  def parseRobotsTxt(text: String): Seq[(String, String, String)] = {
    if (text == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var agents = List.empty[String]
    var groupHasRules = false
    for (raw <- text.split("\n", -1)) {
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.stripSuffix("\r").trim
      val c = line.indexOf(':')
      if (line.nonEmpty && c > 0) {
        val field = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            val a = value.toLowerCase(java.util.Locale.ROOT)
            if (a.nonEmpty) {
              if (groupHasRules) { agents = List(a); groupHasRules = false }
              // dedup repeated UA lines in one group (a common real-
              // world copy-paste) — without it every rule row doubles
              else if (!agents.contains(a)) agents = a :: agents
            }
          case "allow" | "disallow" =>
            if (value.nonEmpty) {
              agents.reverse.foreach(a => out += ((a, field, value)))
              groupHasRules = true
            } else groupHasRules = true // empty value still closes the group
          case "crawl-delay" =>
            agents.reverse.foreach(a => out += ((a, field, value)))
            groupHasRules = true
          case "sitemap" =>
            if (value.nonEmpty) out += (("", "sitemap", value))
          case _ => // unknown field: ignored, does not close the group
        }
      }
    }
    out.toSeq
  }

  /** Files (path, content) → flattened directive rows
    * (site_n, agent, kind, value) — the text-layer front of the REP
    * tier; map-only (parse runs per file row).
    */
  def directivesFromTxt(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val pIdx = files.schema.fieldIndex("path")
    val cIdx = files.schema.fieldIndex("content")
    files.rdd.flatMap { r =>
      val site = "robots-site([0-9]+)\\.txt".r
        .findFirstMatchIn(r.getString(pIdx)).map(_.group(1).toInt).getOrElse(-1)
      parseRobotsTxt(r.getString(cIdx)).map { case (a, k, v) => (site, a, k, v) }
    }.toDF("site_n", "agent", "kind", "value")
      .select(col("site_n").cast("int").as("site_n"),
        col("agent"), col("kind"), col("value"))
  }

  /** Text-parsed path rules in the shape [[filter]] consumes
    * ((site_n, prefix, allow) for one agent's groups).
    */
  def pathRulesFromTxt(directives: DataFrame, agent: String): DataFrame =
    directives.filter(col("agent") === agent &&
        (col("kind") === "allow" || col("kind") === "disallow"))
      .select(col("site_n"), col("value").as("prefix"),
        (col("kind") === "allow").as("allow"))

  /** DuckDB mirror of [[directivesFromTxt]] over the rendered fixture:
    * every directive row predicted from the site axes.
    */
  def directivesOracleSql: String =
    s"""SELECT CAST(n AS INT) AS site_n, agent, kind, value FROM (
          SELECT n, '*' AS agent, 'disallow' AS kind, '/Articles/' AS value
          FROM range(0, $NumSites) t(n) WHERE n % 3 = 0
          UNION ALL SELECT n, '*', 'disallow', '/Articles/1'
          FROM range(0, $NumSites) t(n) WHERE n % 3 = 1
          UNION ALL SELECT n, '*', 'allow', '/Articles/12'
          FROM range(0, $NumSites) t(n) WHERE n % 3 = 1
          UNION ALL SELECT n, '*', 'crawl-delay', CAST(1 + n % 3 AS VARCHAR)
          FROM range(0, $NumSites) t(n)
          UNION ALL SELECT n, '$Agent', 'disallow', '/Articles/13'
          FROM range(0, $NumSites) t(n) WHERE n % 5 = 0
          UNION ALL SELECT n, '$Agent', 'crawl-delay', '2'
          FROM range(0, $NumSites) t(n) WHERE n % 5 = 0
          UNION ALL SELECT n, '', 'sitemap',
            'https://site' || n || '.example/leaf-site' || n || '-p0.xml.gz'
          FROM range(0, $NumSites) t(n)
          UNION ALL SELECT n, '', 'sitemap',
            'https://site' || n || '.example/leaf-site' || n || '-p1.xml.gz'
          FROM range(0, $NumSites) t(n))"""
}
