package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Behavioral / cohort analytics over an event stream — the query
  * family every event-log deployment of a streaming library ends up
  * hand-writing (the reference's issue tracker calls this shape out as
  * the motivating use of `scan`+`filter` chains over event sources,
  * `/root/reference/src/Data/Conduino/Combinators.hs:1-60` module
  * intro). Re-expressed Spark-first: ordered per-user semantics become
  * min-chain aggregations and cohort joins that Catalyst can plan as
  * pushed-filter scans feeding ever-shrinking shuffles — no per-user
  * sort, no window over the raw event log.
  *
  * Scale notes (the design constraints, not incidental choices):
  *  - Funnel does ONE pushed-predicate scan per stage, each aggregated
  *    to at most |users| rows BEFORE any join; the joins are equi-joins
  *    on the user key whose right side only ever shrinks (stage k+1 ⊆
  *    stage k). No global sort, no per-user event buffering — the
  *    100 TB failure mode of sessionize-then-iterate funnels.
  *  - Retention reduces the event log to DISTINCT (user, week) pairs in
  *    a single shuffle before the cohort join, so the join input is
  *    bounded by |users|·|weeks| regardless of event volume.
  *  - All time arithmetic is integer microseconds / epoch-week numbers
  *    (never calendar functions), so results hash-match any engine.
  */
object Behavior {

  /** Per-user conversion depth through an ORDERED funnel of event
    * types: stage k is reached iff an event of type `stages(k-1)`
    * exists strictly after the user's stage-(k-1) time (first-touch
    * attribution: each stage time is the MINIMUM qualifying event
    * time). Returns one row per distinct user: (userCol, stage,
    * t_first_us, t_conv_us) — t_first_us the stage-1 time, t_conv_us
    * the final-stage time, NULL where unreached.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val us = unix_micros(col(tsCol))
    // stage tables: (user, t_k) with t_k = min qualifying time; built
    // left-to-right so each join's right side is the previous stage's
    // aggregate (already ≤ |users| rows)
    val stageTimes: Seq[DataFrame] = stages.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (st, i)) =>
        val evs = events.filter(col(typeCol) === st)
          .select(col(userCol), us.as("t"))
        val qualified = acc.lastOption match {
          case None       => evs
          case Some(prev) =>
            evs.join(prev.select(col(userCol), col(s"t$i").as("t_prev")), userCol)
              .filter(col("t") > col("t_prev"))
        }
        acc :+ qualified.groupBy(col(userCol)).agg(min(col("t")).as(s"t${i + 1}"))
      }
    val users = events.select(col(userCol)).distinct()
    val joined = stageTimes.foldLeft(users)((d, st) => d.join(st, Seq(userCol), "left"))
    // fold LOW→HIGH so the highest reached stage is the OUTERMOST test
    // (each later `when` wraps the accumulated expression as its else)
    val stageExpr = stages.indices
      .foldLeft(lit(0)) { (e, i) => when(col(s"t${i + 1}").isNotNull, i + 1).otherwise(e) }
    joined.select(col(userCol), stageExpr.as("stage"),
      col("t1").as("t_first_us"), col(s"t${stages.size}").as("t_conv_us"))
  }

  /** The same funnel as engine-neutral SQL (DuckDB oracle mirror). */
  def funnelSql(table: String, userCol: String, typeCol: String,
                tsCol: String, stages: Seq[String]): String = {
    val cte = stages.zipWithIndex.map { case (st, i) =>
      val k = i + 1
      if (i == 0)
        s"s1 AS (SELECT $userCol, min(epoch_ns($tsCol) // 1000) AS t1 FROM $table WHERE $typeCol = '$st' GROUP BY 1)"
      else
        s"""s$k AS (SELECT e.$userCol, min(epoch_ns(e.$tsCol) // 1000) AS t$k
             FROM $table e JOIN s$i USING ($userCol)
             WHERE e.$typeCol = '$st' AND epoch_ns(e.$tsCol) // 1000 > s$i.t$i
             GROUP BY 1)"""
    }.mkString(",\n")
    val caseArms = stages.indices.reverse
      .map(i => s"WHEN t${i + 1} IS NOT NULL THEN ${i + 1}").mkString(" ")
    val joins = stages.indices.map(i => s"LEFT JOIN s${i + 1} USING ($userCol)").mkString(" ")
    s"""WITH $cte,
        u AS (SELECT DISTINCT $userCol FROM $table)
        SELECT u.$userCol, CASE $caseArms ELSE 0 END AS stage,
               t1 AS t_first_us, t${stages.size} AS t_conv_us
        FROM u $joins"""
  }

  /** Weekly cohort retention: cohort = the user's first-activity epoch
    * week (floor(micros / week)), and for every (cohort, offset) the
    * number of DISTINCT cohort users active `offset` weeks later.
    * Returns (cohort_week, week_offset, users). The event log collapses
    * to distinct (user, week) in one shuffle before anything joins.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val WeekUs = 7L * 86400L * 1000000L
    // FLOOR division: Spark `div` truncates toward zero while the
    // oracle's `//` floors — they differ exactly on pre-epoch
    // timestamps (negative micros), so correct the truncation by 1
    // whenever the remainder is negative (same discipline as
    // Packing.scala's div/floor note)
    val wk = expr(
      s"unix_micros($tsCol) div ${WeekUs}L" +
        s" - CASE WHEN unix_micros($tsCol) % ${WeekUs}L < 0 THEN 1 ELSE 0 END")
    val active = events.select(col(userCol), wk.as("week")).distinct()
    val cohorts = active.groupBy(col(userCol)).agg(min(col("week")).as("cohort_week"))
    active.join(cohorts, userCol)
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("users")) // distinct (user, week) already — count is exact
  }

  /** The same retention matrix as engine-neutral SQL. */
  def retentionSql(table: String, userCol: String, tsCol: String): String = {
    val weekUs = 7L * 86400L * 1000000L
    s"""WITH active AS (SELECT DISTINCT $userCol,
                          (epoch_ns($tsCol) // 1000) // $weekUs AS week
                        FROM $table),
        cohorts AS (SELECT $userCol, min(week) AS cohort_week
                    FROM active GROUP BY 1)
        SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
               COUNT(*) AS users
        FROM active a JOIN cohorts c USING ($userCol)
        GROUP BY 1, 2"""
  }

  /** Cumulative audience growth: per epoch week, how many users were
    * seen for the FIRST time that week, and the running total of
    * distinct users ever seen. The "cumulative distinct count over
    * time" query — answered WITHOUT any distinct-over-window state by
    * the first-touch trick: a user contributes exactly at min(week), so
    * cumulative-distinct = prefix-sum of first-seen counts.
    *
    * Scale shape: the event log collapses to (user, min week) in one
    * shuffle (|users| rows), then to |weeks| rows; only THEN does the
    * ordered prefix-sum window run — over the |weeks|-row aggregate,
    * never the log. The naive `COUNT(DISTINCT user) OVER (ORDER BY
    * week)` would buffer the full user set per week; this never holds
    * more than a count.
    */
  def userGrowth(events: DataFrame, userCol: String, tsCol: String,
                 bucketUs: Long = 7L * 86400L * 1000000L): DataFrame = {
    // same floor-division discipline as `retention` (Spark div truncates,
    // the oracle's // floors; they differ on pre-epoch micros)
    val bkt = expr(
      s"unix_micros($tsCol) div ${bucketUs}L" +
        s" - CASE WHEN unix_micros($tsCol) % ${bucketUs}L < 0 THEN 1 ELSE 0 END")
    val firstSeen = events.select(col(userCol), bkt.as("bucket"))
      .groupBy(col(userCol)).agg(min(col("bucket")).as("bucket"))
    val perBucket = firstSeen.groupBy(col("bucket")).agg(count(lit(1)).as("new_users"))
    // |buckets| rows by now — the unpartitioned ordered window is a
    // deliberate single-task step over a tiny aggregate, not a smell
    val w = expressions.Window.orderBy(col("bucket"))
      .rowsBetween(expressions.Window.unboundedPreceding,
        expressions.Window.currentRow)
    perBucket.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** The same growth curve as engine-neutral SQL. */
  def userGrowthSql(table: String, userCol: String, tsCol: String,
                    bucketUs: Long = 7L * 86400L * 1000000L): String =
    s"""WITH fw AS (SELECT $userCol,
                      MIN((epoch_ns($tsCol) // 1000) // $bucketUs) AS bucket
                    FROM $table GROUP BY 1)
        SELECT bucket, COUNT(*) AS new_users,
               CAST(SUM(COUNT(*)) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_users
        FROM fw GROUP BY bucket"""

  /** Per-user temporal feature engineering — the lag/gap vector every
    * behavioral model trains on: for each event, its 1-based index in
    * the user's history, microseconds since the user's previous event
    * (NULL on the first), and the micro-scaled delta of `valCol` versus
    * the previous event. Ordering is (event time, id) so ties are
    * deterministic; `valCol` doubles are fixed to integer micro-units
    * BEFORE differencing so the delta is engine-exact.
    *
    * Scale: ONE shuffle on the user key, then per-user sorted windows
    * inside each partition — the standard window plan; no global sort.
    * Skewed power users are bounded by their own history length (window
    * state is O(1) per row for lag/row_number).
    */
  def lagFeatures(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, valCol: String): DataFrame = {
    val w = expressions.Window.partitionBy(col(userCol))
      .orderBy(col("__t_us"), col(idCol))
    events
      .withColumn("__t_us", unix_micros(col(tsCol)))
      .withColumn("__v_micro", floor(col(valCol) * 1000000 + 0.5).cast("long"))
      .select(col(userCol), col(idCol), col("__t_us").as("t_us"),
        row_number().over(w).cast("long").as("evt_idx"),
        (col("__t_us") - lag(col("__t_us"), 1).over(w)).as("gap_us"),
        (col("__v_micro") - lag(col("__v_micro"), 1).over(w)).as("val_delta_micro"))
  }

  /** Market-basket co-occurrence: item pairs bought/viewed by the same
    * user, with support (distinct users holding both). The per-user item
    * set is CAPPED at `capPerUser` items first (top by the user's own
    * frequency, ties by item id — deterministic), which bounds the pair
    * explosion at `cap²/2` per user however degenerate the power users
    * get; the cap is the operator's contract, mirrored by the oracle.
    *
    * Scale: one (user, item) count shuffle; the cap is a WindowGroupLimit
    * (partial top-k before the exchange); the pair self-join is keyed on
    * the user so it shuffles the CAPPED per-user sets, never raw events;
    * the final support count is map-side combined on (item_a, item_b).
    */
  def coOccurrence(events: DataFrame, userCol: String, itemCol: String,
                   minSupport: Long, capPerUser: Int): DataFrame = {
    val w = expressions.Window.partitionBy(col(userCol))
      .orderBy(col("freq").desc, col(itemCol))
    val capped = events.groupBy(col(userCol), col(itemCol))
      .agg(count(lit(1)).as("freq"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= capPerUser)
      .select(col(userCol).as("u"), col(itemCol).as("item"))
    val a = capped.select(col("u"), col("item").as("item_a"))
    val b = capped.select(col("u").as("u2"), col("item").as("item_b"))
    a.join(b, col("u") === col("u2") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** DuckDB mirror of [[coOccurrence]] (same cap and tie-break). */
  def coOccurrenceSql(fromSql: String, userCol: String, itemSql: String,
                      minSupport: Long, capPerUser: Int): String =
    s"""WITH capped AS (
         SELECT $userCol AS u, $itemSql AS item
         FROM ($fromSql)
         GROUP BY 1, 2
         QUALIFY row_number() OVER (PARTITION BY $userCol
           ORDER BY COUNT(*) DESC, $itemSql) <= $capPerUser)
       SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS support
       FROM capped a JOIN capped b ON a.u = b.u AND a.item < b.item
       GROUP BY 1, 2 HAVING COUNT(*) >= $minSupport"""

  /** DuckDB mirror of [[lagFeatures]] (same ordering and micro-fixing). */
  def lagFeaturesSql(table: String, userCol: String, tsCol: String,
                     idCol: String, valCol: String): String =
    s"""WITH e AS (SELECT $userCol, $idCol,
           epoch_ns($tsCol) // 1000 AS t_us,
           CAST(FLOOR($valCol * 1000000 + 0.5) AS BIGINT) AS v_micro
         FROM $table)
       SELECT $userCol, $idCol, t_us,
         CAST(row_number() OVER w AS BIGINT) AS evt_idx,
         t_us - lag(t_us, 1) OVER w AS gap_us,
         v_micro - lag(v_micro, 1) OVER w AS val_delta_micro
       FROM e WINDOW w AS (PARTITION BY $userCol ORDER BY t_us, $idCol)"""
}
