package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** URL curation — the metadata half of the crawl front door. A real
  * 100-TB pipeline curates BY URL before it ever reads page bytes:
  * parse, canonicalize (re-crawls of one page differ only in tracking
  * junk), dedup on the canonical form, aggregate per registered domain,
  * and cap per-domain volume so no single site dominates the corpus.
  * The reference has no cell for this (its closest surface is the
  * element-wise map/filter tier, `/root/reference/src/Data/Conduino/
  * Combinators.hs:277-308`, already ported); like [[Html]] and [[Warc]]
  * this fills the LLM-pipeline tier's curation hole.
  *
  * Everything here is per-row regexp/array work over codegen'd
  * built-ins — parse and normalize are map-only passes whose cost is
  * the scan; dedup and domain stats are single hash aggregates on the
  * canonical/domain key; the cap is a per-domain top-k that plans as a
  * partial WindowGroupLimit below the exchange (only k rows per domain
  * cross the wire).
  *
  * The test fixture follows the [[Html.wrapSqlExpr]] discipline: ONE
  * definition renders the URL from `doc_id` as both a Spark column
  * ([[urlCol]]) and a DuckDB expression ([[urlSqlExpr]] over
  * [[urlPartsSqlCte]]), so both engines parse byte-identical strings.
  * Page identity is keyed by `doc_id % 150` (the same page crawled
  * repeatedly) while the DECORATIONS — scheme case, www prefix, host
  * case, explicit default port, utm params, param order, /index.html,
  * trailing slash, fragment — vary by doc_id, exactly the variance
  * canonicalization must collapse.
  */
object Urls {

  // ---------------------------------------------------------------------
  // Shared fixture: url rendered from doc_id, byte-identical in both
  // engines. k = doc_id % 150 keys the page identity; everything else
  // is crawl noise.
  // ---------------------------------------------------------------------

  /** Render the fixture URL from a doc-id column (Spark side). */
  def urlCol(docId: Column): Column = {
    val k = docId % 150
    val scheme = when(docId % 3 === 0, "HTTPS").otherwise("https")
    val www = when(docId % 4 === 0, "WWW.")
      .when(docId % 4 === 1, "www.").otherwise("")
    val tld = when(k % 7 === 0, ".com").when(k % 7 === 1, ".org")
      .when(k % 7 === 2, ".co.uk").when(k % 7 === 3, ".io")
      .when(k % 7 === 4, ".github.io").when(k % 7 === 5, ".co.jp")
      .otherwise(".net")
    val hostRaw = concat(www, lit("site"), (k % 23).cast("string"), tld)
    val host = when(docId % 9 === 0, upper(hostRaw)).otherwise(hostRaw)
    val port = when(docId % 7 === 0, ":443")
      .when(docId % 7 === 1, ":8080").otherwise("")
    val pathBase = concat(lit("/Articles/"), k.cast("string"))
    val path = when(docId % 11 === 0, concat(pathBase, lit("/")))
      .when(docId % 11 === 1, concat(pathBase, lit("/index.html")))
      .otherwise(pathBase)
    val page = concat(lit("page="), (k % 4).cast("string"))
    val query = when(docId % 13 === 0, "")
      .when(docId % 2 === 0, concat(lit("?utm_source=feed&"), page))
      .otherwise(concat(lit("?"), page, lit("&utm_campaign=mail")))
    val frag = when(docId % 6 === 0, "#sec-2").otherwise("")
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** The SAME rendering as a plain JVM function — the fixture-staging
    * side (the WARC shards carry it as `WARC-Target-URI`). Kept in
    * lockstep with [[urlCol]] by a UrlsSpec property over a thousand
    * ids; content is ASCII so the ROOT-locale upcase is exact.
    */
  def urlOf(docId: Long): String = {
    val k = docId % 150
    val scheme = if (docId % 3 == 0) "HTTPS" else "https"
    val www =
      if (docId % 4 == 0) "WWW." else if (docId % 4 == 1) "www." else ""
    val tld = (k % 7).toInt match {
      case 0 => ".com"; case 1 => ".org"; case 2 => ".co.uk"
      case 3 => ".io"; case 4 => ".github.io"; case 5 => ".co.jp"
      case _ => ".net"
    }
    val hostRaw = www + "site" + (k % 23) + tld
    val host =
      if (docId % 9 == 0) hostRaw.toUpperCase(java.util.Locale.ROOT) else hostRaw
    val port =
      if (docId % 7 == 0) ":443" else if (docId % 7 == 1) ":8080" else ""
    val pathBase = "/Articles/" + k
    val path =
      if (docId % 11 == 0) pathBase + "/"
      else if (docId % 11 == 1) pathBase + "/index.html"
      else pathBase
    val page = "page=" + (k % 4)
    val query =
      if (docId % 13 == 0) ""
      else if (docId % 2 == 0) "?utm_source=feed&" + page
      else "?" + page + "&utm_campaign=mail"
    val frag = if (docId % 6 == 0) "#sec-2" else ""
    scheme + "://" + host + port + path + query + frag
  }

  // SQL-side rendering fragments, shared between the parts-CTE form
  // (readable, joins once per doc) and the fully-inline form (usable
  // for DERIVED ids like the outlink target) so the two can never drift
  private def tldSqlExpr(d: String): String =
    s"""(CASE WHEN (($d) % 150) % 7 = 0 THEN '.com'
          WHEN (($d) % 150) % 7 = 1 THEN '.org'
          WHEN (($d) % 150) % 7 = 2 THEN '.co.uk'
          WHEN (($d) % 150) % 7 = 3 THEN '.io'
          WHEN (($d) % 150) % 7 = 4 THEN '.github.io'
          WHEN (($d) % 150) % 7 = 5 THEN '.co.jp'
          ELSE '.net' END)"""

  private def hostSqlExpr(d: String): String =
    s"""((CASE WHEN ($d) % 4 = 0 THEN 'WWW.'
          WHEN ($d) % 4 = 1 THEN 'www.' ELSE '' END) ||
        'site' || CAST((($d) % 150) % 23 AS VARCHAR) || ${tldSqlExpr(d)})"""

  /** The registered DOMAIN of the fixture url for an id expression —
    * `site{n}{tld}` exactly: the www prefix and host case are noise the
    * PSL resolution discards by construction (suffix rules key on the
    * LAST labels), and every fixture tld — including the `.co.uk` /
    * `.co.jp` registry suffixes and the `.github.io` private-section
    * suffix — resolves to site-label + tld. Lets oracles predict
    * domains without rendering or parsing urls.
    */
  def domainOfIdSql(d: String): String =
    s"('site' || CAST((($d) % 150) % 23 AS VARCHAR) || ${tldSqlExpr(d)})"
  private def pathBaseSqlExpr(d: String): String =
    s"('/Articles/' || CAST(($d) % 150 AS VARCHAR))"
  private def pageSqlExpr(d: String): String =
    s"('page=' || CAST((($d) % 150) % 4 AS VARCHAR))"

  private def urlRenderSql(d: String, h: String, p: String, g: String): String =
    s"""((CASE WHEN ($d) % 3 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
        (CASE WHEN ($d) % 9 = 0 THEN upper($h) ELSE $h END) ||
        (CASE WHEN ($d) % 7 = 0 THEN ':443'
              WHEN ($d) % 7 = 1 THEN ':8080' ELSE '' END) ||
        (CASE WHEN ($d) % 11 = 0 THEN $p || '/'
              WHEN ($d) % 11 = 1 THEN $p || '/index.html' ELSE $p END) ||
        (CASE WHEN ($d) % 13 = 0 THEN ''
              WHEN ($d) % 2 = 0 THEN '?utm_source=feed&' || $g
              ELSE '?' || $g || '&utm_campaign=mail' END) ||
        (CASE WHEN ($d) % 6 = 0 THEN '#sec-2' ELSE '' END))"""

  /** Oracle CTE `parts` — the k-keyed page-identity pieces (host `h`,
    * path base `p`, page param `g`) from `documents.doc_id`.
    */
  val urlPartsSqlCte: String =
    s"""parts AS (SELECT doc_id, ${hostSqlExpr("doc_id")} AS h,
          ${pathBaseSqlExpr("doc_id")} AS p, ${pageSqlExpr("doc_id")} AS g
        FROM documents)"""

  /** The SAME rendering as a DuckDB expression over `parts` columns. */
  val urlSqlExpr: String = urlRenderSql("doc_id", "h", "p", "g")

  /** Fully-inline rendering over an ARBITRARY doc-id expression — for
    * derived ids (e.g. the template's outlink target) where no parts
    * CTE exists.
    */
  def urlSqlInline(d: String): String =
    urlRenderSql(d, hostSqlExpr(d), pathBaseSqlExpr(d), pageSqlExpr(d))

  /** Oracle CTE chain `parts, base` where base = (doc_id, url). */
  val urlBaseSqlCtes: String =
    s"""$urlPartsSqlCte,
        base AS (SELECT doc_id, $urlSqlExpr AS url FROM parts)"""

  // ---------------------------------------------------------------------
  // Parse (RFC-3986-shaped, regex shared verbatim with the oracle)
  // ---------------------------------------------------------------------

  /** Split regex: scheme :// authority path [?query] [#fragment].
    * Java regex and RE2 agree on every construct used (character
    * classes, non-capturing groups, anchors — no lookaround).
    */
  val UrlRegex = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$"

  // ---------------------------------------------------------------------
  // Registered domain (eTLD+1) via a public-suffix-list snapshot —
  // TABLE-DRIVEN, not a label-count heuristic: `site.github.io`-class
  // hosts (private-section suffixes) and `site.co.jp` registry
  // suffixes resolve correctly only against PSL data. The snapshot is
  // a fixture-sized stand-in with the REAL list's rule grammar (normal
  // rules, `*.` wildcard rules, `!` exception rules, private-section
  // entries); a production deployment swaps in the published list —
  // everything else (rule semantics, join shape) stands.
  // ---------------------------------------------------------------------

  /** PSL-shaped snapshot (publicsuffix.org rule grammar). */
  val PslSnapshot: Seq[String] = Seq(
    "com", "org", "net", "io", "uk", "co.uk", "org.uk",
    "jp", "co.jp", "ne.jp", "au", "com.au",
    // wildcard + exception pair (the .ck shape from the real list)
    "ck", "*.ck", "!www.ck",
    // private-section entry: every user site is its own registrant
    "github.io")

  /** Longest rule in the snapshot (the real list tops out at 5). */
  val PslMaxLabels = 5

  /** Snapshot folded to one row per lookup key: a wildcard `*.k` rule
    * keys on its parent `k`, an exception `!k` on `k` itself, so each
    * host suffix needs exactly one hash probe per length.
    */
  private[graft] def pslRows: Seq[(String, Boolean, Boolean, Boolean)] =
    PslSnapshot.groupBy { r =>
      if (r.startsWith("!")) r.substring(1)
      else if (r.startsWith("*.")) r.substring(2)
      else r
    }.map { case (k, rs) =>
      (k,
        rs.exists(r => !r.startsWith("!") && !r.startsWith("*.")),
        rs.exists(_.startsWith("*.")),
        rs.exists(_.startsWith("!")))
    }.toSeq.sortBy(_._1)

  /** The snapshot as a DataFrame — the broadcast build side. */
  def pslTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    pslRows.toDF("psl_key", "psl_n", "psl_w", "psl_x")
  }

  /** Resolve eTLD+1 for a LOWERCASED-host expression by PSL rules and
    * append it as column `out`: the host's 1..[[PslMaxLabels]]-label
    * suffixes probe the broadcast snapshot (one BroadcastHashJoin per
    * length — map-side only, zero shuffle at any scale), then the
    * prevailing rule picks the public suffix (exception beats all,
    * else longest match, wildcard adding one label, implicit `*`
    * default) and the registered domain is one label more. A host that
    * IS a public suffix (or has no dot) resolves to itself — the
    * bare-host fallback downstream grouping keys rely on.
    */
  def resolveDomain(df: DataFrame, hostL: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    val orig = df.columns.toSeq
    var cur = df.withColumn("__lb", split(hostL, "\\."))
      .withColumn("__ln", size(col("__lb")))
    (1 to PslMaxLabels).foreach { j =>
      val p = pslTable(spark).select(col("psl_key").as(s"__k$j"),
        col("psl_n").as(s"__n$j"), col("psl_w").as(s"__w$j"),
        col("psl_x").as(s"__x$j"))
      cur = cur.withColumn(s"__s$j",
          when(col("__ln") >= j, array_join(slice(col("__lb"), -j, j), ".")))
        .join(broadcast(p), col(s"__s$j") === col(s"__k$j"), "left")
    }
    val xLen = (1 to PslMaxLabels).map(j => when(col(s"__x$j"), lit(j - 1)))
    val candidates = (1 to PslMaxLabels).flatMap(j => Seq(
      coalesce(when(col(s"__n$j"), lit(j)), lit(1)),
      coalesce(when(col(s"__w$j") && col("__ln") >= j + 1, lit(j + 1)), lit(1)))) :+
      lit(1).cast("int")
    val pubLen = coalesce((xLen :+ greatest(candidates: _*)): _*)
    val regN = least(col("__ln"), pubLen + 1)
    cur.withColumn(out, array_join(slice(col("__lb"), -regN, regN), "."))
      .select((orig.map(col) :+ col(out)): _*)
  }

  /** Raw host (case preserved) out of a url column. */
  def hostOf(u: Column): Column =
    regexp_extract(regexp_extract(u, UrlRegex, 2), "^([^:]*)", 1)

  /** url column → (scheme, host, port, path, query, fragment, domain).
    * scheme/host are RAW (case preserved — lowercasing is [[canonical]]'s
    * job); port is a nullable long; query/fragment are stripped of their
    * `?`/`#` markers; domain is the eTLD+1 heuristic over the LOWERCASED
    * host (DNS is case-insensitive even when the crawl record isn't).
    */
  def parse(df: DataFrame, idCol: String, urlColName: String): DataFrame = {
    val u = col(urlColName)
    val auth = regexp_extract(u, UrlRegex, 2)
    val portS = regexp_extract(auth, ":([0-9]+)$", 1)
    resolveDomain(
      df.select(col(idCol), u,
        regexp_extract(u, UrlRegex, 1).as("scheme"),
        hostOf(u).as("host"),
        when(portS === "", lit(null)).otherwise(portS).cast("long").as("port"),
        regexp_extract(u, UrlRegex, 3).as("path"),
        regexp_replace(regexp_extract(u, UrlRegex, 4), "^\\?", "").as("query"),
        regexp_replace(regexp_extract(u, UrlRegex, 5), "^#", "").as("fragment")),
      lower(col("host")), "domain")
  }

  // ---------------------------------------------------------------------
  // Normalize → canonical URL
  // ---------------------------------------------------------------------

  /** Canonicalization policy (each step mirrored in [[canonicalSql]]):
    *   1. lowercase scheme and host; strip a leading `www.`;
    *   2. drop the DEFAULT port (80/http, 443/https), keep others;
    *   3. drop a trailing `/index.html`; drop the trailing slash
    *      (except the root path); empty path → `/`;
    *   4. drop `utm_*` tracking params, SORT the survivors (param order
    *      is transport noise), drop the `?` when none survive;
    *   5. drop the fragment.
    */
  def canonical(u: Column): Column = {
    val scheme = lower(regexp_extract(u, UrlRegex, 1))
    val auth = regexp_extract(u, UrlRegex, 2)
    val host = regexp_replace(lower(regexp_extract(auth, "^([^:]*)", 1)),
      "^www\\.", "")
    val portS = regexp_extract(auth, ":([0-9]+)$", 1)
    val port = when(portS === "" ||
        (scheme === "http" && portS === "80") ||
        (scheme === "https" && portS === "443"), "")
      .otherwise(concat(lit(":"), portS))
    val p0 = regexp_replace(regexp_extract(u, UrlRegex, 3), "/index\\.html$", "")
    val p1 = when(p0 =!= "/" && p0.endsWith("/"),
      p0.substr(lit(1), length(p0) - 1)).otherwise(p0)
    val path = when(p1 === "", "/").otherwise(p1)
    val qs = regexp_replace(regexp_extract(u, UrlRegex, 4), "^\\?", "")
    val params = array_sort(filter(split(qs, "&"),
      x => x =!= "" && !startswith(x, lit("utm_"))))
    val query = when(size(params) === 0, "")
      .otherwise(concat(lit("?"), array_join(params, "&")))
    concat(scheme, lit("://"), host, port, path, query)
  }

  /** (id, url, canonical) over a dataframe. */
  def normalize(df: DataFrame, idCol: String, urlColName: String): DataFrame =
    df.select(col(idCol), col(urlColName),
      canonical(col(urlColName)).as("canonical"))

  // ---------------------------------------------------------------------
  // Curation queries over the parsed/canonical forms
  // ---------------------------------------------------------------------

  /** Exact dedup on the canonical URL: one hash aggregate; keep-first
    * (min id) plus the group size — the crawl-frontier dedup that runs
    * BEFORE any page bytes are fetched or parsed.
    */
  def dedupCanonical(df: DataFrame, idCol: String, urlColName: String): DataFrame =
    normalize(df, idCol, urlColName)
      .groupBy(col("canonical"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"))

  /** URL-frontier keep-first: one row per canonical URL — the FIRST by
    * `orderCol` — with all input columns preserved. row_number()=1 over
    * the canonical partition plans as a partial WindowGroupLimit top-1
    * below the exchange: at 100 TB each map task forwards one candidate
    * per canonical key, never a domain's whole re-crawl history.
    */
  def frontierKeepFirst(df: DataFrame, urlColName: String,
      orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("canonical")).orderBy(col(orderCol))
    df.withColumn("canonical", canonical(col(urlColName)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Per-registered-domain corpus profile: doc volume, distinct hosts
    * (subdomains), distinct canonical pages, total text size. Pure
    * per-row derivation then ONE hash aggregate on the domain key (the
    * distincts ride the same aggregate via expand — no join).
    */
  def domainStats(df: DataFrame, idCol: String, urlColName: String,
      sizeCol: String): DataFrame = {
    val u = col(urlColName)
    resolveDomain(
      df.select(col(idCol), col(sizeCol),
        lower(hostOf(u)).as("host_l"),
        canonical(u).as("canonical")),
      col("host_l"), "domain")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host_l")).as("n_hosts"),
        countDistinct(col("canonical")).as("n_pages"),
        sum(col(sizeCol)).as("total_chars"))
  }

  /** Per-domain volume cap: keep the top `k` docs per registered domain
    * by (size DESC, id ASC — deterministic). rank-<=k over a partitioned
    * window plans as a PARTIAL WindowGroupLimit below the exchange, so
    * at 100 TB each map task forwards at most k rows per domain instead
    * of the domain's whole crawl.
    */
  def domainCap(df: DataFrame, idCol: String, urlColName: String,
      sizeCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(col(sizeCol).desc, col(idCol).asc)
    resolveDomain(df, lower(hostOf(col(urlColName))), "domain")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("domain"), col(sizeCol), col("rk"))
  }

  // ---------------------------------------------------------------------
  // DuckDB mirrors
  // ---------------------------------------------------------------------

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Oracle-side parse pieces as a CTE over `base` (doc_id, url). Each
    * expression mirrors the Spark one above verbatim (same regexes).
    */
  val parseSqlCte: String = parseSqlCteFrom("base", "parsed")

  /** The same parse CTE over an arbitrary (doc_id, url) source under
    * an arbitrary name — for oracles that parse TWO url sets (e.g.
    * redirect source + Location target).
    */
  def parseSqlCteFrom(src: String, name: String): String =
    s"""$name AS (SELECT doc_id, url,
          regexp_extract(url, ${q(UrlRegex)}, 1) AS scheme,
          regexp_extract(regexp_extract(url, ${q(UrlRegex)}, 2), '^([^:]*)', 1) AS host,
          regexp_extract(regexp_extract(url, ${q(UrlRegex)}, 2), ':([0-9]+)$$', 1) AS port_s,
          regexp_extract(url, ${q(UrlRegex)}, 3) AS path,
          regexp_replace(regexp_extract(url, ${q(UrlRegex)}, 4), '^\\?', '') AS query,
          regexp_replace(regexp_extract(url, ${q(UrlRegex)}, 5), '^#', '') AS fragment
        FROM $src)"""

  // ---------------------------------------------------------------------
  // Sitemaps — the REP discovery channel beside robots.txt: per-site
  // XML listing the pages a crawler should seed its frontier with.
  // ---------------------------------------------------------------------

  /** Render site n's sitemap XML from its docs' fixture URLs (urls
    * XML-escape their `&` — the unescape on the read side must undo
    * exactly this).
    */
  def renderSitemap(urls: Seq[String]): String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      urls.map(u => s"  <url><loc>${u.replace("&", "&amp;")}</loc></url>\n").mkString +
      "</urlset>\n"

  /** Render a sitemapindex XML referencing leaf sitemap URLs (the
    * sitemaps.org nesting layer: a site with >50k URLs must split into
    * gzipped leaves under one index).
    */
  def renderSitemapIndex(leafUrls: Seq[String]): String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      leafUrls.map(u =>
        s"  <sitemap><loc>${u.replace("&", "&amp;")}</loc></sitemap>\n").mkString +
      "</sitemapindex>\n"

  /** Frontier seeds through the FULL sitemaps.org discovery shape:
    * per-site `sitemapindex` files name their gzipped leaf sitemaps
    * (`.xml.gz` — the compressed form the protocol mandates support
    * for); the leaves are fetched BY REFERENCE (a name-keyed join —
    * an orphan leaf no index names must contribute nothing), gunzipped
    * with the engine inflate, and parsed into the same per-site
    * profile as [[sitemapSeeds]] — whose oracle is shared VERBATIM, so
    * the index + gzip + orphan-exclusion layers must be exactly
    * transparent. The index side is file-level metadata (tiny at any
    * corpus scale) and BROADCASTS; leaf bytes never shuffle.
    */
  def sitemapIndexSeeds(indexFiles: DataFrame, leafFiles: DataFrame): DataFrame = {
    val refs = indexFiles.select(
        explode(regexp_extract_all(col("xml"),
          lit("<loc>([^<]*)</loc>"), lit(1))).as("ref"))
      .select(regexp_extract(col("ref"), "/([^/]+\\.xml\\.gz)$", 1).as("ref_name"))
      .filter(col("ref_name") =!= "")
      .distinct()
    seedsFromLeafRefs(refs, leafFiles)
  }

  /** The by-reference leaf fetch + per-site seed profile shared by
    * every sitemap discovery channel (sitemapindex files, robots.txt
    * `Sitemap:` directives): `refs` is ONE column `ref_name` of leaf
    * file names (metadata-sized at any scale — it broadcasts); leaves
    * not referenced by anyone contribute nothing.
    */
  def seedsFromLeafRefs(refs: DataFrame, leafFiles: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val leaves = leafFiles.select(
      regexp_extract(col("path"), "/([^/]+\\.xml\\.gz)$", 1).as("leaf_name"),
      call_function("decode",
        graft.functions.GzipDecode.gzip_decode(col("content")), lit("UTF-8"))
        .as("xml"))
    leaves.join(broadcast(refs), col("leaf_name") === col("ref_name"))
      .select(
        regexp_extract(col("leaf_name"), "leaf-site([0-9]+)-", 1)
          .cast("int").as("site_n"),
        explode(regexp_extract_all(col("xml"),
          lit("<loc>([^<]*)</loc>"), lit(1))).as("loc"))
      .select(col("site_n"),
        canonical(call_function("replace", col("loc"), lit("&amp;"), lit("&")))
          .as("canonical"))
      .groupBy(col("site_n"))
      .agg(count(lit(1)).as("n_locs"),
        countDistinct(col("canonical")).as("n_pages"))
  }

  /** Frontier SEEDS from a directory of per-site sitemap files
    * (`sitemap-site<n>.xml`, wholetext rows of (path, xml)): extract
    * `<loc>` entries, unescape, canonicalize, and profile per site —
    * loc count vs DISTINCT canonical pages (the re-crawl variance a
    * seeded frontier immediately collapses). Map-only extraction +
    * one hash aggregate on the site key.
    */
  def sitemapSeeds(files: DataFrame): DataFrame =
    files.select(
        regexp_extract(col("path"), "sitemap-site([0-9]+)\\.xml", 1)
          .cast("int").as("site_n"),
        explode(regexp_extract_all(col("xml"),
          lit("<loc>([^<]*)</loc>"), lit(1))).as("loc"))
      .select(col("site_n"),
        canonical(call_function("replace", col("loc"), lit("&amp;"), lit("&")))
          .as("canonical"))
      .groupBy(col("site_n"))
      .agg(count(lit(1)).as("n_locs"),
        countDistinct(col("canonical")).as("n_pages"))

  /** DuckDB mirror of [[sitemapSeeds]] over the fixture (site of a
    * doc = its host's site index, (doc_id % 150) % 23).
    */
  def sitemapSeedsOracleSql: String =
    s"""WITH $urlBaseSqlCtes, $parseSqlCte
        SELECT CAST((doc_id % 150) % 23 AS INT) AS site_n,
               COUNT(*) AS n_locs,
               CAST(COUNT(DISTINCT ${canonicalSql}) AS BIGINT) AS n_pages
        FROM parsed GROUP BY 1"""

  /** domain over a lowercased-host expression — DuckDB mirror of
    * [[resolveDomain]], GENERATED from the same [[PslSnapshot]] (rule
    * keys inlined as literal IN-lists, so engine and oracle can never
    * read different lists). Exception beats all, else longest match
    * (wildcard adds a label), implicit `*` default, bare-host
    * fallback.
    */
  def domainSql(hostLExpr: String): String = {
    val lb = s"string_split($hostLExpr, '.')"
    val n = s"len($lb)"
    def suf(j: Int) = s"array_to_string(list_slice($lb, -$j, -1), '.')"
    def inKeys(j: Int, keys: Seq[String]) =
      if (keys.isEmpty) "FALSE"
      else s"($n >= $j AND ${suf(j)} IN (${keys.map(q).mkString(", ")}))"
    def keysOf(pick: ((String, Boolean, Boolean, Boolean)) => Boolean, j: Int) =
      pslRows.filter(r => pick(r) && r._1.count(_ == '.') + 1 == j).map(_._1)
    val xCases = (1 to PslMaxLabels).flatMap { j =>
      val ks = keysOf(_._4, j)
      if (ks.isEmpty) None else Some(s"CASE WHEN ${inKeys(j, ks)} THEN ${j - 1} END")
    }
    val cands = (1 to PslMaxLabels).flatMap { j =>
      val nk = keysOf(_._2, j)
      val wk = keysOf(_._3, j)
      Seq(
        if (nk.isEmpty) None else Some(s"CASE WHEN ${inKeys(j, nk)} THEN $j ELSE 1 END"),
        if (wk.isEmpty) None
        else Some(s"CASE WHEN ${inKeys(j, wk)} AND $n >= ${j + 1} THEN ${j + 1} ELSE 1 END")
      ).flatten
    } :+ "1"
    val pubLen = s"COALESCE(${(xCases :+ s"GREATEST(${cands.mkString(", ")})").mkString(", ")})"
    s"array_to_string(list_slice($lb, -LEAST($n, ($pubLen) + 1), -1), '.')"
  }

  /** canonical over the `parsed` CTE's columns (mirrors [[canonical]]). */
  val canonicalSql: String = {
    val host = "regexp_replace(lower(host), '^www\\.', '')"
    val port = """(CASE WHEN port_s = ''
          OR (lower(scheme) = 'http' AND port_s = '80')
          OR (lower(scheme) = 'https' AND port_s = '443') THEN ''
        ELSE ':' || port_s END)"""
    val p0 = "regexp_replace(path, '/index\\.html$', '')"
    val p1 = s"""(CASE WHEN $p0 <> '/' AND $p0 LIKE '%/'
        THEN substr($p0, 1, length($p0) - 1) ELSE $p0 END)"""
    val pathN = s"(CASE WHEN $p1 = '' THEN '/' ELSE $p1 END)"
    val params = """list_sort(list_filter(string_split(query, '&'),
        x -> x <> '' AND NOT starts_with(x, 'utm_')))"""
    val queryN = s"""(CASE WHEN len($params) = 0 THEN ''
        ELSE '?' || array_to_string($params, '&') END)"""
    s"(lower(scheme) || '://' || $host || $port || $pathN || $queryN)"
  }
}
