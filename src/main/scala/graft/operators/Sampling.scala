package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: deterministic
  * stratified sampling (per-class caps / balanced class mixes) and
  * weighted interleave (mixture schedules). Extends the LLM-data family
  * beyond the reference's own operator set (SURVEY.md §2 LLM-data
  * section); no conduino counterpart.
  *
  * Both are pure Spark plans over portable integer arithmetic — no RNG
  * state anywhere — so the DuckDB oracle reproduces them bit-for-bit and
  * a re-run on different cluster topology returns the same sample.
  */
object Sampling {

  /** Multiplier of the sample-ranking scatter (Knuth's 2^32 golden-ratio
    * constant); modulus shared with the text hashes ([[TextOps.HashMod]]).
    * id·ScatterA must stay within Long: ids < ~3.4·10^9 — far above any
    * fixture id; for wider ids scatter twice over (id >> 32, id & 0xffffffff).
    */
  val ScatterA = 2654435761L

  /** Pseudo-random but DETERMINISTIC per-id sort key in [0, HashMod). */
  def scatter(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (id * ScatterA) % TextOps.HashMod

  /** Deterministic stratified k-sample: keep the k rows of each stratum
    * with the smallest scatter(id) — uniform-without-replacement per
    * stratum, reproducible on any engine. The per-class-cap primitive of
    * training-mix construction.
    *
    * Scale shape: ONE shuffle on the stratum key; the ranking window is
    * PARTITIONED (never a global sort), so heavy strata sort locally
    * after the exchange. A stratum hot enough to skew its task is the
    * `saltedJoin`/AQE case, same as any hot key.
    */
  def stratifiedTake(df: DataFrame, stratum: String, id: String, k: Int): DataFrame = {
    require(k > 0, "stratifiedTake: k must be positive")
    val w = Window.partitionBy(col(stratum)).orderBy(scatter(col(id)), col(id))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** The oracle-side mirror of [[stratifiedTake]] (DuckDB QUALIFY
    * fragment, same constants).
    */
  def stratifiedTakeQualifySql(stratum: String, id: String, k: Int): String =
    s"QUALIFY row_number() OVER (PARTITION BY $stratum ORDER BY ($id * $ScatterA) % ${TextOps.HashMod}, $id) <= $k"

  /** Per-source quality cap: keep the k HIGHEST-quality rows of each
    * stratum (ties broken by id — fully deterministic). The per-domain /
    * per-host cap of web-corpus curation: no single source may
    * contribute more than k documents, and the k kept are the best ones,
    * not a random sample ([[stratifiedTake]] is the uniform variant).
    *
    * Scale shape: identical to stratifiedTake — ONE shuffle on the
    * stratum key and a PARTITIONED rank window that Spark rewrites to
    * WindowGroupLimit (partial per-partition top-k BEFORE the exchange,
    * PlanSpec-asserted), so a 100 TB corpus moves at most
    * k·|partitions| rows per source, never a source's full population.
    */
  def qualityCap(df: DataFrame, stratum: String, id: String,
                 quality: Column, k: Int): DataFrame = {
    require(k > 0, "qualityCap: k must be positive")
    val w = Window.partitionBy(col(stratum)).orderBy(quality.desc, col(id))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Per-key rate throttle, batch form: at most k rows per (key,
    * time-bucket), the FIRST k by (t, id) — ingestion admission control
    * replayed over a log (the streaming form is
    * [[graft.streaming.Throttle]]; this is its oracle semantics).
    * Emits the admitted rows + their `bucket` and admission `rk`.
    *
    * Scale shape: same as [[qualityCap]] — one shuffle on (key,
    * bucket), a WindowGroupLimit-rewritten rank, so a flooding key
    * ships at most k·|partitions| rows per bucket through the exchange.
    * Bucket uses the floor-division discipline of Behavior (Spark `div`
    * truncates; correct by 1 on negative remainders).
    */
  def throttle(df: DataFrame, key: String, tsUsCol: String, id: String,
               bucketUs: Long, k: Int): DataFrame = {
    require(bucketUs > 0, "throttle: bucketUs must be positive")
    throttle(df, key, tsUsCol, id, lit(bucketUs), k)
  }

  /** [[throttle]] with a PER-ROW bucket width — the crawl-politeness
    * form, where each host's robots crawl-delay sets its own window
    * (see [[Robots.frontierSchedule]]). Floor division via pmod so a
    * negative timestamp still buckets correctly; the quotient of two
    * longs below 2^53 with an exact integer result divides exactly in
    * double, so the cast is lossless.
    */
  def throttle(df: DataFrame, key: String, tsUsCol: String, id: String,
               bucketUs: Column, k: Int): DataFrame = {
    require(k > 0, "throttle: k must be positive")
    val w = Window.partitionBy(col(key), col("bucket"))
      .orderBy(col(tsUsCol), col(id))
    df.withColumn("bucket", bucketOf(col(tsUsCol), bucketUs))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** The throttle's bucket function: floor(t / width) with per-row
    * width (pmod handles negative t; the double quotient of two longs
    * below 2^53 with an exact integer result is lossless).
    */
  def bucketOf(t: Column, width: Column): Column =
    ((t - pmod(t, width)) / width).cast("long")

  /** Weighted deterministic interleave of two corpora — the training
    * mixture schedule: every cycle of wa+wb output positions takes wa
    * elements of A then wb of B (e.g. 3:1 web:code). Inputs must carry
    * DENSE `seq` columns (use `RowExec.withDenseSeq`) and matching
    * schemas; the output `seq` is the schedule position — collision-free
    * and monotone per side, sparse after the shorter side exhausts.
    *
    * Scale shape: two per-side projections + union — ZERO shuffle beyond
    * whatever produced the dense seqs. The schedule is pure arithmetic,
    * so it composes with any downstream repartitioning.
    */
  /** Temperature-scaled corpus mixing weights (the multi-source
    * sampling schedule of a training-data pipeline): per source,
    * `share = n/N`, `score = share^alpha` (alpha < 1 upsamples small
    * sources — the standard temperature trick), and the normalized
    * weight. One count aggregate over the corpus plus two 1-row
    * broadcast attaches — output is `|sources|` rows regardless of n.
    *
    * Determinism: `pow` is the one non-correctly-rounded op, so scores
    * are micro-scaled to BIGINT (floor(x·1e6 + 0.5), the Relevance
    * convention) BEFORE the normalizing sum and integer division —
    * aggregation order and engine ulps cannot flip the output.
    * `w_micro` sums to ≤ 1e6 (integer-division remainders are left
    * with the consumer, who re-normalizes or assigns them by rank).
    */
  def mixWeights(df: DataFrame, srcCol: String, weighCol: Column,
                 alpha: Double): DataFrame = {
    // materialized at |sources| rows: every downstream 1-row attach
    // (total, score sum, rebalance min) would otherwise re-run the
    // corpus count scan — the pmiCollocations single-scan discipline
    val counts = graft.core.Materialize.checkpoint(
      df.select(col(srcCol).as("source"), weighCol.as("__w"))
        .groupBy(col("source")).agg(sum(col("__w")).cast("long").as("n_tokens")))
    val total = counts.agg(sum(col("n_tokens")).cast("long").as("__tot"))
    val scored = counts.crossJoin(org.apache.spark.sql.functions.broadcast(total))
      .select(col("source"), col("n_tokens"),
        floor(pow(col("n_tokens").cast("double") / col("__tot").cast("double"),
          lit(alpha)) * lit(1e6) + lit(0.5)).cast("long").as("s_micro"))
    val sTot = scored.agg(sum(col("s_micro")).cast("long").as("__stot"))
    scored.crossJoin(org.apache.spark.sql.functions.broadcast(sTot))
      .select(col("source"), col("n_tokens"), col("s_micro"),
        expr("s_micro * 1000000 div __stot").as("w_micro"))
  }

  /** DuckDB mirror of [[mixWeights]] over the documents table. */
  def mixWeightsSql(weighSql: String, alpha: Double): String =
    s"""WITH c AS (SELECT source, CAST(SUM($weighSql) AS BIGINT) AS n_tokens
                   FROM documents GROUP BY source),
        t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM c),
        s AS (SELECT source, n_tokens,
                CAST(FLOOR(pow(n_tokens::DOUBLE / tot::DOUBLE, $alpha) * 1000000 + 0.5) AS BIGINT) AS s_micro
              FROM c, t),
        st AS (SELECT CAST(SUM(s_micro) AS BIGINT) AS stot FROM s)
        SELECT source, n_tokens, s_micro,
               s_micro * 1000000 // stot AS w_micro
        FROM s, st"""

  def interleave(a: DataFrame, b: DataFrame, wa: Int, wb: Int): DataFrame = {
    require(wa > 0 && wb > 0, "interleave: weights must be positive")
    val cyc = wa + wb
    val pa = a.withColumn("seq",
      expr(s"(seq div $wa) * $cyc + (seq % $wa)"))
    val pb = b.withColumn("seq",
      expr(s"(seq div $wb) * $cyc + $wa + (seq % $wb)"))
    pa.unionByName(pb)
  }

  /** Deterministic train/val/test assignment by id hash: the scatter
    * value mod `denom` falls in [0, denom); cut points are cumulative
    * per-mille (or any granularity) thresholds. Per-row arithmetic only
    * — ZERO shuffle, no RNG, stable under re-runs, appends, and
    * repartitioning (membership depends on the id alone, never on row
    * order or sample size) — the property that keeps eval sets leakage-
    * free when the corpus grows.
    *
    * `cuts` maps split name → upper bound (exclusive) in [0, denom];
    * bounds must be strictly increasing; ids above the last cut get the
    * final split name. E.g. train/val/test 80/10/10 with denom 1000:
    * `Seq("train" -> 800, "val" -> 900, "test" -> 1000)`.
    */
  /** Split label of an id as a PURE per-row expression — the form that
    * composes with no join and no extra scan ([[splitLeakage]] applies
    * it directly to a pair list's two id columns).
    */
  def splitExpr(id: org.apache.spark.sql.Column,
                cuts: Seq[(String, Int)], denom: Int = 1000): org.apache.spark.sql.Column = {
    require(cuts.nonEmpty && cuts.last._2 == denom,
      s"hashSplit: last cut must equal denom=$denom")
    require(cuts.map(_._2) == cuts.map(_._2).sorted.distinct,
      "hashSplit: cuts must be strictly increasing")
    val bucket = scatter(id) % denom
    cuts.init.reverse.foldLeft(lit(cuts.last._1)) {
      case (els, (name, ub)) => when(bucket < ub, lit(name)).otherwise(els)
    }
  }

  def hashSplit(df: DataFrame, id: String,
                cuts: Seq[(String, Int)], denom: Int = 1000): DataFrame =
    df.withColumn("split", splitExpr(col(id), cuts, denom))

  /** The oracle-side mirror of [[hashSplit]] (same constants/CASE). */
  def hashSplitSql(id: String, cuts: Seq[(String, Int)], denom: Int = 1000): String = {
    val bucket = s"((($id * $ScatterA) % ${TextOps.HashMod}) % $denom)"
    val whens = cuts.init.map { case (name, ub) =>
      s"WHEN $bucket < $ub THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${cuts.last._1}' END"
  }

  /** Per-stratum quality calibration: each row's score becomes its
    * within-stratum percentile (exact integer per-mille) — the
    * cross-domain score normalizer of corpus curation (a raw quality
    * score of 0.7 means different things on different domains; the
    * percentile is comparable, so one global threshold applies). Rank
    * and population ride ONE shuffle on the stratum; ties break by id
    * so the per-mille is deterministic. pct_mille = (rank−1)·1000 div
    * max(n−1, 1) ∈ [0, 1000] (a singleton stratum calibrates to 0).
    */
  def qualityCalibrate(df: DataFrame, stratum: String, id: String,
                       score: Column): DataFrame = {
    val w = Window.partitionBy(col(stratum)).orderBy(score, col(id))
    val wn = Window.partitionBy(col(stratum))
    df.withColumn("__score", score)
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("pct_mille",
        expr("(__rk - 1) * 1000 div greatest(__n - 1, 1)"))
      .drop("__score", "__rk", "__n")
  }

  /** DuckDB mirror of [[qualityCalibrate]] (same arithmetic). */
  def qualityCalibrateSql(stratum: String, id: String, scoreSql: String): String =
    s"""(row_number() OVER (PARTITION BY $stratum ORDER BY $scoreSql, $id) - 1) * 1000
        // greatest(COUNT(*) OVER (PARTITION BY $stratum) - 1, 1)"""

  /** Subsampling rates that realize a [[mixWeights]] temperature target:
    * given per-source populations n_i and target weights w_i (micro),
    * the largest corpus M every source can serve is
    * M = min_i (n_i·10⁶ div w_i), each source contributes
    * take_i = M·w_i div 10⁶, and the Bernoulli/sequential-Poisson rate
    * to hand the sampler is rate_ppm_i = take_i·10⁶ div n_i — the
    * binding source runs at ~10⁶ (keep everything), every other source
    * downsamples. All integer, so the schedule is engine-exact.
    * Overflow envelope: n_i·10⁶ < Long.Max ⇒ n_i ≲ 9·10¹² tokens per
    * source — past that, pre-scale the weigh column.
    *
    * Scale: one count aggregate to |sources| rows; the min and the
    * rates are |sources|-sized arithmetic — output is the schedule,
    * not data.
    */
  def mixRebalance(df: DataFrame, srcCol: String, weighCol: Column,
                   alpha: Double): DataFrame = {
    val weights = mixWeights(df, srcCol, weighCol, alpha)
    val m = weights.agg(min(expr("n_tokens * 1000000 div w_micro")).as("__m"))
    weights.crossJoin(org.apache.spark.sql.functions.broadcast(m))
      .select(col("source"), col("n_tokens"), col("w_micro"),
        expr("__m * w_micro div 1000000").as("take_n"),
        expr("(__m * w_micro div 1000000) * 1000000 div n_tokens").as("rate_ppm"))
  }

  /** DuckDB mirror of [[mixRebalance]] over the documents table. */
  def mixRebalanceSql(weighSql: String, alpha: Double): String =
    s"""WITH mw AS (${mixWeightsSql(weighSql, alpha)}),
        mm AS (SELECT MIN(n_tokens * 1000000 // w_micro) AS m FROM mw)
        SELECT source, n_tokens, w_micro,
               CAST(m * w_micro // 1000000 AS BIGINT) AS take_n,
               CAST((m * w_micro // 1000000) * 1000000 // n_tokens AS BIGINT) AS rate_ppm
        FROM mw, mm"""

  /** Deterministic weighted k-sample — sequential Poisson sampling
    * (Ohlsson 1998): every row gets priority ξ = u/w with u the
    * [[scatter]] pseudo-uniform and w its weight, and the k SMALLEST
    * priorities win — inclusion probability ≈ proportional to weight,
    * the "longer docs more likely" sampler of corpus curation. Pure
    * integer arithmetic (ξ scaled ×10⁶, ties by id), so the draw is
    * engine-portable and stable under re-runs and repartitioning.
    *
    * Scale shape: a per-row expression + global top-k — Spark executes
    * the ORDER BY LIMIT as TakeOrderedAndProject (per-partition partial
    * top-k, driver merges k·|partitions| rows), never a global sort.
    * Weights must be positive.
    */
  def weightedSample(df: DataFrame, id: String, weight: Column, k: Int): DataFrame = {
    require(k > 0, "weightedSample: k must be positive")
    df.withColumn("__w", weight.cast("long"))
      .withColumn("priority",
        expr(s"CASE WHEN __w > 0 THEN (($id * $ScatterA) % ${TextOps.HashMod}) * 1000000 div __w " +
          "ELSE CAST(raise_error('weightedSample: non-positive weight') AS BIGINT) END"))
      .drop("__w")
      .orderBy(col("priority"), col(id))
      .limit(k)
  }

  /** DuckDB mirror of [[weightedSample]] (same constants). */
  def weightedSampleSql(table: String, id: String, weightSql: String, k: Int): String =
    s"""SELECT *, (($id * $ScatterA) % ${TextOps.HashMod}) * 1000000 // ($weightSql) AS priority
        FROM $table
        ORDER BY priority, $id LIMIT $k"""

  /** Seeded affine permutation key over ids: `(A·(2·seed+1)·id + B·(seed+1))
    * mod P` with P prime ([[TextOps.HashMod]]) — injective on id for any
    * seed (the multiplier is never ≡ 0 mod P for seeds < ~10^8), so the
    * induced order is a strict, reproducible pseudo-random permutation;
    * a different seed per epoch gives a different order.
    */
  def epochKey(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column = {
    val a = (ScatterA * (2 * seed + 1)) % TextOps.HashMod
    val b = (104729L * (seed + 1))      % TextOps.HashMod
    ((id % TextOps.HashMod) * a + b) % TextOps.HashMod
  }

  /** Cross-split LEAKAGE audit — the check a training pipeline runs
    * after [[hashSplit]]: near-duplicate pairs whose members landed in
    * DIFFERENT splits (a val/test doc with a train-side near-copy
    * silently inflates eval). Candidate generation and verify are the
    * scale-shaped [[Dedup.jaccardPairs]] (banded MinHash buckets, caps,
    * never all-pairs); split membership is recomputed from the id hash,
    * so the audit needs no split materialization. Output: one row per
    * offending pair with both split labels — empty means leakage-free.
    */
  def splitLeakage(df: DataFrame, id: String, textCol: String,
                   cuts: Seq[(String, Int)], minJ: Double): DataFrame = {
    val pairs = Dedup.jaccardPairs(df, id, textCol).filter(col("jaccard") >= minJ)
    // membership is a pure function of the id ([[splitExpr]]), so both
    // labels attach as per-row expressions on the pair list — zero
    // extra scans, zero joins
    pairs.select(col("doc_a"), col("doc_b"),
        splitExpr(col("doc_a"), cuts).as("split_a"),
        splitExpr(col("doc_b"), cuts).as("split_b"))
      .filter(col("split_a") =!= col("split_b"))
  }

  /** SQL mirror of [[epochKey]]. */
  def epochKeySql(id: String, seed: Long): String = {
    val a = (ScatterA * (2 * seed + 1)) % TextOps.HashMod
    val b = (104729L * (seed + 1))      % TextOps.HashMod
    s"((($id % ${TextOps.HashMod}) * $a + $b) % ${TextOps.HashMod})"
  }

  /** Deterministic training-order shuffle — the last stage before
    * sharding a corpus to training files: assign every doc a dense new
    * ordinal 0..n-1 in [[epochKey]] order. Ranking runs on the
    * distributed `Ordinals` machinery (range-partition by key, sort
    * within partitions, per-partition offsets prefix-summed on the
    * driver — O(numPartitions) driver data, never a single-partition
    * global window), so the plan survives a corpus that does not fit
    * one task. Output: (new_seq, id).
    */
  def shuffleOrder(df: DataFrame, id: String, seed: Long): DataFrame = {
    val spark = df.sparkSession
    implicit val enc: org.apache.spark.sql.Encoder[graft.core.Elem[(Long, Long)]] =
      graft.core.Elem.enc[(Long, Long)]
    import spark.implicits._
    val keyed = df.select(col(id).cast("long").as("_1"),
        epochKey(col(id), seed).cast("long").as("_2"))
      .as[(Long, Long)]
    // id appended as tiebreak: epochKey is injective only for unique ids
    // below the modulus — duplicate or >= P ids collide, and without the
    // tiebreak their relative order would be shuffle-arrival-dependent
    // (the oracle orders by (key, id) for the same reason)
    graft.core.Ordinals.zipWithOrdinal(keyed, Seq(col("_2"), col("_1")))
      .toDF()
      .select(col("seq").as("new_seq"), col("value._1").as(id))
  }

  /** Threshold SELECTION CURVE — the quality-vs-size tuning artifact a
    * curation pipeline sweeps before fixing its filter cutoff: for each
    * candidate threshold `t`, how many rows (and how much weight) would
    * survive `num / den ≥ t`? The ratio compare is evaluated as the
    * EXACT integer cross-multiplication `num ≥ t · den` (den > 0 rows
    * only — a zero denominator has no defined per-unit score and never
    * passes), so both engines agree bit-for-bit with no FP division.
    * Plan: ONE scan with 2·K conditional aggregates, then an in-plan
    * `stack` unpivot to K rows — the [[Diagnostics.columnProfile]]
    * single-pass discipline; never K scans, never a threshold×row
    * explode (a K× scan amplification at 100 TB).
    */
  def selectionCurve(df: DataFrame, numCol: String, denCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "selectionCurve needs at least one threshold")
    // duplicates would alias the agg column names (ambiguous-reference
    // AnalysisException at the stack) — and silently deduping would
    // change the row count out from under a caller's oracle
    require(thresholds == thresholds.distinct,
      s"selectionCurve thresholds must be distinct, got $thresholds")
    // decimal(20,0) × decimal(20,0) → decimal(38,0): |Long·Long| < 2^126
    // ≈ 8.5e37 < 1e38 always fits, so the cross-multiplication stays
    // EXACT for any (t, den) — a raw Long multiply would silently wrap
    // for |t|·den > 2^63 and flip the comparison (DuckDB's side runs in
    // HUGEINT, so only the Spark side needed widening)
    val keep = (t: Long) => col(denCol) > 0 &&
      col(numCol).cast("decimal(20,0)") >=
        lit(t).cast("decimal(20,0)") * col(denCol).cast("decimal(20,0)")
    val aggs = thresholds.flatMap { t =>
      // coalesce: a global agg over ZERO rows yields one row of NULL
      // sums — the defined empty-corpus contract is K rows of 0 counts
      Seq(coalesce(sum(when(keep(t), lit(1L)).otherwise(lit(0L))), lit(0L)).as(s"n_$t"),
        coalesce(sum(when(keep(t), col(denCol)).otherwise(lit(0L))), lit(0L)).as(s"w_$t"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${thresholds.size}, " +
        thresholds.map(t => s"${t}L, `n_$t`, `w_$t`").mkString(", ") +
        ") AS (threshold, n_kept, weight_kept)")
  }

  /** DuckDB mirror of [[selectionCurve]] over a scored CTE. */
  def selectionCurveSql(scoredSql: String, numCol: String, denCol: String,
                        thresholds: Seq[Long]): String = {
    val values = thresholds.map(t => s"($t)").mkString(", ")
    // LEFT JOIN from the threshold list (never CROSS): an empty scored
    // set must still yield one zero row per threshold, the engine's
    // empty-corpus contract
    s"""WITH s AS ($scoredSql),
        t(threshold) AS (VALUES $values)
        SELECT CAST(t.threshold AS BIGINT) AS threshold,
               CAST(COALESCE(SUM(CASE WHEN s.$denCol > 0
                 AND s.$numCol >= t.threshold * s.$denCol THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_kept,
               CAST(COALESCE(SUM(CASE WHEN s.$denCol > 0
                 AND s.$numCol >= t.threshold * s.$denCol THEN s.$denCol ELSE 0 END), 0)
                 AS BIGINT) AS weight_kept
        FROM t LEFT JOIN s ON TRUE GROUP BY t.threshold"""
  }
}
