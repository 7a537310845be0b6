package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Pre-flight diagnostics for 100-TB jobs — the audits an operator
  * team runs BEFORE committing a cluster to a multi-hour shuffle, plus
  * the governance purge audit run after a deletion request. No conduino
  * counterpart (the reference never owns a planner or storage); these
  * extend the LLM-data/warehouse family with the operational tooling a
  * deployment of this engine needs around it.
  *
  * All outputs are integer-exact (counts, Long products, per-mille
  * ratios via integer division) so every query here hash-matches its
  * DuckDB oracle.
  */
object Diagnostics {

  /** Join cardinality / skew audit: per-key row counts on BOTH sides of
    * a prospective equi-join and the implied output contribution
    * `est_pairs = cnt_l · cnt_r`, top-K keys by contribution. A handful
    * of keys with huge `est_pairs` is the signature of a join that
    * needs [[ColOps.saltedJoin]] (or a key blocklist) before it is run
    * for real; `est_pairs = 0` rows quantify anti-join selectivity.
    *
    * Scale: each side collapses to its per-key count table in one
    * map-side-combined shuffle (≤ |distinct keys| rows — orders of
    * magnitude under the data), the count tables full-outer-join on the
    * key, and the top-K is `orderBy.limit` which Spark plans as
    * TakeOrderedAndProject: per-partition top-K merged on the driver,
    * never a global sort.
    */
  def joinAudit(left: DataFrame, leftKey: String,
                right: DataFrame, rightKey: String, topK: Int): DataFrame = {
    val l = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("cnt_l"))
    val r = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("cnt_r"))
    l.join(r, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("cnt_l"), lit(0L)).as("cnt_l"),
        coalesce(col("cnt_r"), lit(0L)).as("cnt_r"))
      .withColumn("est_pairs", col("cnt_l") * col("cnt_r"))
      .orderBy(col("est_pairs").desc, col("key"))
      .limit(topK)
  }

  /** DuckDB mirror of [[joinAudit]]. */
  def joinAuditSql(leftSql: String, leftKey: String,
                   rightSql: String, rightKey: String, topK: Int): String =
    s"""WITH l AS (SELECT $leftKey AS key, COUNT(*) AS cnt_l FROM ($leftSql) GROUP BY 1),
       r AS (SELECT $rightKey AS key, COUNT(*) AS cnt_r FROM ($rightSql) GROUP BY 1)
       SELECT COALESCE(l.key, r.key) AS key,
         CAST(COALESCE(cnt_l, 0) AS BIGINT) AS cnt_l,
         CAST(COALESCE(cnt_r, 0) AS BIGINT) AS cnt_r,
         CAST(COALESCE(cnt_l, 0) * COALESCE(cnt_r, 0) AS BIGINT) AS est_pairs
       FROM l FULL OUTER JOIN r ON l.key = r.key
       ORDER BY est_pairs DESC, key LIMIT $topK"""

  /** Partition-skew audit: how would `df` distribute if hash-partitioned
    * on `key` into `buckets` partitions? Buckets come from the engine's
    * portable scatter hash ([[Sampling.scatter]]) so the oracle computes
    * the identical assignment. Per bucket: row count, a caller-supplied
    * integer weight (e.g. payload bytes), and each as parts-per-million
    * of the EVEN share — 1 000 000 means perfectly balanced; a bucket at
    * 5 000 000 holds 5× its share and forecasts a straggler task.
    *
    * Scale: one map-side-combined shuffle to `buckets` rows, then a
    * 1-row total attached by broadcast. Output is `buckets` rows
    * regardless of data volume.
    */
  def partitionSkew(df: DataFrame, key: Column, weight: Column,
                    buckets: Int): DataFrame = {
    val b = df.select((Sampling.scatter(key) % buckets).as("bucket"),
        weight.cast("long").as("w"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum(col("w")).as("w_sum"))
    val tot = b.agg(sum(col("n_rows")).as("__tn"), sum(col("w_sum")).as("__tw"))
    b.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_rows"), col("w_sum"),
        expr(s"n_rows * $buckets * 1000000 div __tn").as("rows_ppm_of_even"),
        expr(s"w_sum * $buckets * 1000000 div __tw").as("weight_ppm_of_even"))
  }

  /** DuckDB mirror of [[partitionSkew]] (same scatter constants). */
  def partitionSkewSql(fromSql: String, keySql: String, weightSql: String,
                       buckets: Int): String =
    s"""WITH b AS (SELECT ((($keySql) * ${Sampling.ScatterA}) % ${TextOps.HashMod}) % $buckets AS bucket,
           COUNT(*) AS n_rows, CAST(SUM($weightSql) AS BIGINT) AS w_sum
         FROM ($fromSql) GROUP BY 1),
       t AS (SELECT SUM(n_rows) AS tn, SUM(w_sum) AS tw FROM b)
       SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows, w_sum,
         CAST(n_rows * $buckets * 1000000 // tn AS BIGINT) AS rows_ppm_of_even,
         CAST(w_sum * $buckets * 1000000 // tw AS BIGINT) AS weight_ppm_of_even
       FROM b, t"""

  /** Right-to-be-forgotten purge audit: for each (table, keyColumn)
    * pair, how many rows match the delete-key set and how many remain.
    * The audit is the dry run of the actual purge (the purge itself is
    * the same anti-join written back via [[Layout.compact]]-style
    * rewrite); cascades are expressed by deriving a second key set from
    * the first (e.g. orderkeys of purged customers) and passing another
    * entry.
    *
    * Scale: delete sets are tiny versus the corpus (a deletion request
    * batch), so each table is ONE scan with a broadcast left-semi-style
    * flag — no shuffle of the fact tables at all.
    */
  /** Polynomial row digest over integer fields: fold
    * `acc = (acc·31 + field mod M) mod M` left-to-right (M =
    * [[TextOps.HashMod]]). Pure codegen arithmetic — no HOF, no UDF —
    * and `%` truncates toward zero in both Spark and DuckDB, so negative
    * fields digest identically. Intermediates stay ≤ 32·M ≪ Long.Max.
    */
  def rowDigest(fields: Seq[Column]): Column =
    fields.foldLeft(lit(0L)) { (acc, f) =>
      (acc * 31 + f.cast("long") % TextOps.HashMod) % TextOps.HashMod
    }

  /** DuckDB mirror of [[rowDigest]]. */
  def rowDigestSql(fields: Seq[String]): String =
    fields.foldLeft("CAST(0 AS BIGINT)") { (acc, f) =>
      s"(($acc) * 31 + CAST($f AS BIGINT) % ${TextOps.HashMod}) % ${TextOps.HashMod}"
    }

  /** Merkle-style content checksum: rows bucket by the portable scatter
    * hash of `id`, and each bucket reports its row count plus two
    * order-independent digest moments (Σd mod M and Σd² mod M). Two
    * replicas of a 100-TB table compare by exchanging `buckets` rows —
    * no data moves — and a mismatch localizes to the differing buckets,
    * which re-run at finer granularity (the Merkle descent). The second
    * moment catches compensating edits the plain sum misses.
    *
    * Scale: one scan, map-side-combined shuffle to `buckets` rows.
    * Envelope: |d| < M ≈ 2³⁰, so the un-modded Long sums overflow only
    * past ~2³³ rows per bucket — size `buckets` so no bucket exceeds
    * that (overflow would still be *consistent* across engines that wrap
    * two's-complement, but DuckDB widens to INT128, so stay inside).
    */
  def tableChecksum(df: DataFrame, id: Column, fields: Seq[Column],
                    buckets: Int): DataFrame = {
    val M = TextOps.HashMod
    df.select((Sampling.scatter(id) % buckets).as("bucket"),
        rowDigest(fields).as("__d"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__d")) % M).as("sum1"),
        (sum(col("__d") * col("__d") % M) % M).as("sum2"))
  }

  /** DuckDB mirror of [[tableChecksum]]. */
  def tableChecksumSql(fromSql: String, idSql: String,
                       fields: Seq[String], buckets: Int): String = {
    val M = TextOps.HashMod
    s"""WITH d AS (SELECT ((($idSql) * ${Sampling.ScatterA}) % $M) % $buckets AS bucket,
           ${rowDigestSql(fields)} AS d
         FROM ($fromSql))
       SELECT bucket, COUNT(*) AS n_rows,
         CAST(SUM(d) % $M AS BIGINT) AS sum1,
         CAST(SUM(d * d % $M) % $M AS BIGINT) AS sum2
       FROM d GROUP BY bucket"""
  }

  def purgeAudit(tables: Seq[(String, DataFrame, String)],
                 keys: DataFrame): DataFrame = {
    val k = broadcast(keys.select(col(keys.columns.head).as("__key"))
      .distinct().withColumn("__del", lit(1)))
    tables.map { case (name, df, keyCol) =>
      df.select(col(keyCol).as("__k"))
        .join(k, col("__k") === k("__key"), "left_outer")
        .agg(sum(when(col("__del").isNotNull, 1L).otherwise(0L)).as("purged"),
          sum(when(col("__del").isNull, 1L).otherwise(0L)).as("kept"))
        .select(lit(name).as("tbl"), col("purged"), col("kept"))
    }.reduce(_ unionByName _)
  }

  /** ANALYZE-style column statistics in ONE pass — the stats collection
    * a cost-based planner (and every data-quality dashboard) runs
    * before trusting a table: per requested column, non-null count,
    * null count, min, max, sum. Callers pre-convert to integer units
    * (micro-fixing, epoch-µs, day buckets) so every statistic is
    * engine-exact and overflow-analyzable — e.g. profile a day bucket,
    * not raw epoch-µs, when `rows × value` would pass ~9.2e18. Output
    * one row per column: `(col_name, n, n_null, min_v, max_v, sum_v)`
    * (min/max/sum NULL for an all-null column, like the engines'
    * aggregates themselves).
    *
    * Plan: a single global aggregate computes all 5·|cols| statistics
    * in one scan (partial aggregation does the work map-side; the
    * "shuffle" is |cols|·5 longs), then one in-plan unpivot explodes
    * the 1-row result — nothing row-proportional ever moves.
    */
  def columnProfile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { case (nm, c) => Seq(
      count(c).as(s"${nm}__cnt"),
      sum(when(c.isNull, 1L).otherwise(0L)).as(s"${nm}__nulls"),
      min(c).as(s"${nm}__min"),
      max(c).as(s"${nm}__max"),
      sum(c).as(s"${nm}__sum"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { case (nm, _) =>
      s"""struct('$nm' AS col_name, ${nm}__cnt AS n,
            coalesce(${nm}__nulls, 0L) AS n_null,
            cast(${nm}__min AS bigint) AS min_v,
            cast(${nm}__max AS bigint) AS max_v,
            cast(${nm}__sum AS bigint) AS sum_v)"""
    }.mkString(", ")
    one.select(explode(expr(s"array($stacked)")).as("p")).select(col("p.*"))
  }

  /** DuckDB mirror of [[columnProfile]]: one aggregate per column,
    * UNION ALL'd (`cols` maps name → SQL expression over `fromSql`).
    */
  def columnProfileSql(fromSql: String, cols: Seq[(String, String)]): String =
    cols.map { case (nm, e) =>
      s"""SELECT '$nm' AS col_name, COUNT(x)::BIGINT AS n,
            CAST(COALESCE(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_null,
            CAST(MIN(x) AS BIGINT) AS min_v, CAST(MAX(x) AS BIGINT) AS max_v,
            CAST(SUM(x) AS BIGINT) AS sum_v
          FROM (SELECT $e AS x FROM ($fromSql))"""
    }.mkString(" UNION ALL ")

  /** Distribution drift between two snapshots of the same column — the
    * "did this feed shift under me" check a training pipeline runs
    * before trusting a refreshed source. Each side is binned by the
    * caller's `bin` expression and reduced to a count table; the bins
    * full-outer-join (a bin present on one side only is real drift,
    * not a dropped row) and each side's counts become integer
    * parts-per-million of its own total, so `delta_ppm` is exact and
    * `Σ|delta_ppm| / 2` is the total-variation distance in ppm —
    * deliberately ln-free (PSI's log term is undefined at empty bins
    * and would be the only float in the operator). Output per bin:
    * `(bin, n_a, n_b, ppm_a, ppm_b, delta_ppm)`. Both snapshots must
    * be non-empty — an empty side makes ppm-of-total meaningless and
    * fails loudly under ANSI division rather than returning zeros.
    *
    * Scale shape: each side collapses to its bin-count table BEFORE
    * any join (map-side combinable aggregate, shuffle bounded by
    * |bins|); the 1-row totals attach by broadcast. Nothing
    * row-proportional ever joins.
    */
  def distributionDrift(a: DataFrame, b: DataFrame, bin: Column): DataFrame = {
    // count tables are checkpointed: the totals below otherwise re-derive
    // them from source, turning 2 snapshot scans into 4
    def counts(df: DataFrame, n: String) =
      graft.core.Materialize.checkpoint(
        df.select(bin.as("bin")).where(col("bin").isNotNull)
          .groupBy(col("bin")).agg(count(lit(1)).as(n)))
    val ca = counts(a, "n_a")
    val cb = counts(b, "n_b")
    val ta = ca.agg(sum(col("n_a")).as("tot_a"))
    val tb = cb.agg(sum(col("n_b")).as("tot_b"))
    ca.join(cb, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("bin"), col("n_a"), col("n_b"),
        expr("n_a * 1000000L div tot_a").as("ppm_a"),
        expr("n_b * 1000000L div tot_b").as("ppm_b"),
        (expr("n_a * 1000000L div tot_a") - expr("n_b * 1000000L div tot_b"))
          .as("delta_ppm"))
  }

  /** DuckDB mirror of [[distributionDrift]]: `aSql`/`bSql` are the two
    * snapshot SELECTs, `binSql` the bin expression over their rows.
    * (`//` floors where Spark's `div` truncates — identical on the
    * non-negative counts involved.)
    */
  def distributionDriftSql(aSql: String, bSql: String, binSql: String): String =
    s"""WITH ca AS (SELECT bin, COUNT(*) AS n_a FROM
                      (SELECT $binSql AS bin FROM ($aSql)) WHERE bin IS NOT NULL
                    GROUP BY 1),
        cb AS (SELECT bin, COUNT(*) AS n_b FROM
                 (SELECT $binSql AS bin FROM ($bSql)) WHERE bin IS NOT NULL
               GROUP BY 1),
        ta AS (SELECT SUM(n_a) AS tot_a FROM ca),
        tb AS (SELECT SUM(n_b) AS tot_b FROM cb)
        SELECT bin, COALESCE(n_a, 0)::BIGINT AS n_a,
               COALESCE(n_b, 0)::BIGINT AS n_b,
               CAST(COALESCE(n_a, 0) * 1000000 // tot_a AS BIGINT) AS ppm_a,
               CAST(COALESCE(n_b, 0) * 1000000 // tot_b AS BIGINT) AS ppm_b,
               CAST(COALESCE(n_a, 0) * 1000000 // tot_a
                    - COALESCE(n_b, 0) * 1000000 // tot_b AS BIGINT) AS delta_ppm
        FROM ca FULL OUTER JOIN cb USING (bin), ta, tb"""
}
