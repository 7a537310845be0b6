package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

import graft.core.Materialize

/** Iterative graph analytics over edge tables — the second graph
  * operator family after [[Dedup.clusterPairs]]'s connected components
  * (reference counterpart: none — conduino's feedback loop
  * `/root/reference/src/Data/Conduino.hs:320-352` is the closest shape,
  * a driver-stepped recurrence; here each step is a full distributed
  * join+aggregate, the Pregel pattern expressed as plain DataFrames).
  *
  * PageRank is the canonical member: web-corpus curation uses link
  * centrality both as a quality prior (rank-weighted sampling) and as a
  * crawl-frontier signal. The implementation is **integer-exact**: ranks
  * live in micro-units (1.0 == 1 000 000) and every step is Long
  * multiply / integer `div` / Long sum — all order-independent, so the
  * result hash-matches any engine computing the same recurrence (the
  * DuckDB oracle unrolls the identical iterations as CTEs). Doubles
  * would NOT survive that comparison: float summation order differs
  * across partitionings.
  *
  * Scale notes:
  *  - Each iteration is one equi-join of the edge table with the
  *    |V|-row rank table plus one shuffle on `dst` — the textbook
  *    distributed PageRank step. Edge+degree sides are materialized
  *    ONCE ([[Materialize.checkpoint]]) so k iterations scan the edge
  *    table k times but never recompute its derivation.
  *  - Ranks stay ≤ ~|V|·10⁶ in the worst (star-graph) case, so Long is
  *    safe to ~10¹² nodes in micro-units; widen to DECIMAL(38,0) past
  *    that.
  *  - Iteration count is a parameter, not convergence-tested: a fixed
  *    unrollable recurrence is what an oracle can mirror, and in
  *    production the operator is run with k chosen from the graph's
  *    diameter (10-20 for web graphs).
  */
object Graph {

  /** Damping factor in micro-units: rank' = 0.15 + 0.85·Σ contrib. */
  val DampMicro = 850000L
  val BaseMicro = 150000L

  /** `iters` rounds of damped PageRank over the UNDIRECTED version of
    * `edges` (symmetrized + deduped internally; self-loops kept as
    * given). Input columns `src`, `dst` (Long node ids); output one row
    * per node: (node, rank_micro). Every node in the symmetrized edge
    * set has degree ≥ 1 and an in-edge, so the node set is stable
    * across iterations and no dangling-mass term is needed.
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg-of-src), materialized once: the loop below joins
    // against this k times and must not re-derive sym/deg each round.
    // Checkpointed HASH-PARTITIONED ON `src` (LogicalRDD preserves the
    // captured outputPartitioning): each iteration's rank table arrives
    // hash-partitioned on `node` from the previous round's dst
    // aggregate, so when the per-round join plans as a shuffled join
    // both sides are already co-partitioned and the edge side never
    // re-exchanges — at broadcastable |V| the point is moot (rank
    // broadcasts), but at graph scale this is the difference between
    // k edge shuffles and zero.
    val edgeDeg = Materialize.checkpoint(
      sym.join(deg, sym("src") === deg("node"))
        .select(col("src"), col("dst"), col("deg"))
        .repartition(col("src")))
    // seed from the checkpoint, not from `deg`: deg's lineage re-derives
    // the edge table from source, which the checkpoint exists to avoid
    var rank = edgeDeg.select(col("src").as("node")).distinct()
      .withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      rank = edgeDeg.join(rank, edgeDeg("src") === rank("node"))
        .groupBy(col("dst").as("node"))
        .agg(expr(s"cast($BaseMicro + ($DampMicro * sum(rank_micro div deg)) div 1000000 as bigint)")
          .as("rank_micro"))
    }
    rank
  }

  /** DuckDB mirror of [[pageRank]]: the same recurrence unrolled as
    * `iters` chained CTEs over `edgesSql` (a query producing src, dst).
    */
  def pageRankSql(edgesSql: String, iters: Int): String = {
    val base =
      s"""edges0 AS ($edgesSql),
         edges AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),
         deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM deg)"""
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
           CAST($BaseMicro + ($DampMicro * SUM(r.rank_micro // d.deg)) // 1000000 AS BIGINT) AS rank_micro
           FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON d.node = e.src
           GROUP BY e.dst)"""
    }
    s"WITH $base,\n${iterCtes.mkString(",\n")}\nSELECT node, rank_micro FROM r$iters"
  }

  /** Global triangle count over an undirected edge set — the motif
    * statistic behind clustering-coefficient quality signals (how
    * clique-ish is this link neighborhood) on co-occurrence / link
    * graphs. Input `(src, dst)` in either orientation, duplicates and
    * self-loops tolerated (canonicalized away); output one row,
    * `n_triangles`.
    *
    * The 100-TB shape is DEGREE ORIENTATION (the classic
    * wedge-counting bound): every canonical edge is directed from its
    * (degree, node)-smaller endpoint to the larger, so a node's
    * out-neighborhood is at most O(√m) even for celebrity hubs, wedge
    * generation is Σ out-deg² instead of Σ deg², and each triangle is
    * counted exactly once at its lowest-rank apex — no ×6 overcount to
    * divide away, no hub explosion. Plan: canonical-edge distinct +
    * degree aggregate + two equi-joins (wedge build, wedge close) —
    * all key-partitioned, checkpointed oriented edges reused by both
    * joins.
    */
  def triangleCount(edges: DataFrame): DataFrame =
    closedTriples(edges)._1.agg(count(lit(1)).as("n_triangles"))

  /** Per-node triangle participation and local clustering coefficient —
    * how clique-ish each node's neighborhood is, in exact ppm:
    * `coef_ppm = 2·tri·10⁶ div (d·(d−1))` (0 for degree < 2). Same
    * degree-oriented machinery as [[triangleCount]]; each closed
    * triple credits all three corners via one explode + count.
    */
  def clusteringCoef(edges: DataFrame): DataFrame = {
    val (triples, deg) = closedTriples(edges)
    val perNode = triples
      .select(explode(array(col("s"), col("v"), col("w"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("deg"),
        coalesce(col("tri"), lit(0L)).as("n_tri"),
        when(col("d") < 2, lit(0L))
          .otherwise(expr("2 * coalesce(tri, 0L) * 1000000L div (d * (d - 1))"))
          .as("coef_ppm"))
  }

  /** Shared plumbing: canonicalize, degree-orient, build wedges at each
    * lowest-rank apex, close them. Returns (closed (s,v,w) triples —
    * one row per triangle — and the degree table).
    */
  private def closedTriples(edges: DataFrame): (DataFrame, DataFrame) = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") < col("b")).distinct()
    val deg = canon.select(col("a").as("n"))
      .union(canon.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = Materialize.checkpoint(withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("s"),
      when(aFirst, col("b")).otherwise(col("a")).as("t"),
      when(aFirst, col("db")).otherwise(col("da")).as("dt")))
    val e1 = o.select(col("s"), col("t").as("v"), col("dt").as("dv"))
    val e2 = o.select(col("s").as("s2"), col("t").as("w"), col("dt").as("dw"))
    val wedges = e1.join(e2, col("s") === col("s2") &&
        (col("dv") < col("dw") ||
          (col("dv") === col("dw") && col("v") < col("w"))))
      .select(col("s"), col("v"), col("w"))
    // o's (s, t) pairs are distinct by construction, so the inner join
    // keeps each closed wedge exactly once — one row per triangle
    val triples = wedges.join(o.select(col("s").as("v"), col("t").as("w")),
      Seq("v", "w"))
    (triples, deg)
  }

  /** Shared CTE chain for the triangle family (ends at the closed
    * `tri3 (s, v, w)` triple table + `deg`).
    */
  private def triangleChainSql(edgesSql: String): String =
    s"""e0 AS ($edgesSql),
        canon AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                  FROM e0 WHERE src <> dst GROUP BY 1, 2),
        deg AS (SELECT n, COUNT(*) AS d
                FROM (SELECT a AS n FROM canon
                      UNION ALL SELECT b FROM canon) t GROUP BY 1),
        o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND c.a < c.b)
                          THEN c.a ELSE c.b END AS s,
                     CASE WHEN da.d < db.d OR (da.d = db.d AND c.a < c.b)
                          THEN c.b ELSE c.a END AS t,
                     CASE WHEN da.d < db.d OR (da.d = db.d AND c.a < c.b)
                          THEN db.d ELSE da.d END AS dt
              FROM canon c
              JOIN deg da ON da.n = c.a JOIN deg db ON db.n = c.b),
        wdg AS (SELECT e1.s AS s, e1.t AS v, e2.t AS w
                FROM o e1 JOIN o e2 ON e1.s = e2.s
                  AND (e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t))),
        tri3 AS (SELECT wdg.s, wdg.v, wdg.w
                 FROM wdg JOIN o ON o.s = wdg.v AND o.t = wdg.w)"""

  /** DuckDB mirror of [[triangleCount]]; `edgesSql` yields (src, dst). */
  def triangleCountSql(edgesSql: String): String =
    s"""WITH ${triangleChainSql(edgesSql)}
        SELECT COUNT(*)::BIGINT AS n_triangles FROM tri3"""

  /** DuckDB mirror of [[clusteringCoef]]. */
  def clusteringCoefSql(edgesSql: String): String =
    s"""WITH ${triangleChainSql(edgesSql)},
        pernode AS (SELECT n, COUNT(*) AS tri
                    FROM (SELECT UNNEST([s, v, w]) AS n FROM tri3) t
                    GROUP BY 1)
        SELECT deg.n AS node, deg.d AS deg,
               COALESCE(pernode.tri, 0)::BIGINT AS n_tri,
               CASE WHEN deg.d < 2 THEN 0
                    ELSE 2 * COALESCE(pernode.tri, 0) * 1000000
                         // (deg.d * (deg.d - 1)) END::BIGINT AS coef_ppm
        FROM deg LEFT JOIN pernode ON pernode.n = deg.n"""
}
