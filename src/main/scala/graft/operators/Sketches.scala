package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketch: KMV (k-minimum-values) over the
  * portable word hash.
  *
  * Spark's built-in `approx_count_distinct` (HyperLogLog++) is the
  * usual tool, but its register layout is engine-private — the DuckDB
  * oracle could never hash-match it. KMV over [[TextOps.charHash]] is
  * exactly reproducible in both engines with integer arithmetic: keep
  * the k smallest DISTINCT hash values; if the k-th smallest is h, the
  * hashes are ~uniform on [0, P), so n̂ = (k-1)·P / h. Standard error
  * ~1/√k (k=256 → ~6%).
  *
  * Scale shape: one shuffle to distinct the (narrow) hash column, then
  * a TakeOrdered top-k — per-partition partial top-k, O(k) rows to the
  * driver side of the sort, never a global sort of the data. At 100 TB
  * the distinct can also be replaced by per-partition min-k + merge
  * (k·partitions rows through one reducer); the distinct form is kept
  * here because it is a single declarative plan Catalyst/AQE handles.
  */
object Sketches {

  val K = 256

  /** Affine finisher (a bijection mod P): charHash of short words spans
    * only a narrow band of [0, P) (a w-char word reaches at most
    * ~31^w·127), which biases the KMV estimator low; multiplying by a
    * large constant mod P scatters any band across the full range.
    * KmvA·h stays within Long (KmvA < 9.2e18 / P).
    */
  val KmvA = 2654435761L
  val KmvB = 104729L

  /** One-row sketch summary over the words of `textCol`:
    * (k, kth_min, n_in_sketch, est) — `est` falls back to the exact
    * count when fewer than k distinct values exist.
    */
  def kmvWordSketch(df: DataFrame, textCol: String): DataFrame = {
    // word_hashes = the native codegen expression computing charHash per
    // word in one pass (vs explode + per-word aggregate-over-split)
    val hashes = df
      .select(explode(graft.functions.WordHashes.word_hashes(col(textCol))).as("wh"))
      .select(((lit(KmvA) * col("wh") + lit(KmvB)) % TextOps.HashMod).as("hv"))
      .distinct()
    hashes.orderBy(col("hv")).limit(K)
      .agg(max(col("hv")).as("kth_min"), count(lit(1)).as("n_in_sketch"))
      .select(
        lit(K.toLong).as("k"),
        col("kth_min"), col("n_in_sketch"),
        when(col("n_in_sketch") < K, col("n_in_sketch"))
          .otherwise(expr(s"${(K - 1).toLong * TextOps.HashMod} div kth_min"))
          .as("est"))
  }

  /** The same sketch as DuckDB SQL over the documents table. */
  def kmvWordSketchSql: String = {
    val h = s"(($KmvA * (${TextOps.charHashSql("w")}) + $KmvB) % ${TextOps.HashMod})"
    s"""WITH hs AS (SELECT DISTINCT $h AS hv
                    FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) t),
             tk AS (SELECT hv FROM hs ORDER BY hv LIMIT $K)
        SELECT ${K}::BIGINT AS k, max(hv) AS kth_min, count(*) AS n_in_sketch,
               CASE WHEN count(*) < $K THEN count(*)
                    ELSE ${(K - 1).toLong * TextOps.HashMod} // max(hv) END AS est
        FROM tk"""
  }

  /** Per-group KMV: one (group, k, kth_min, n_in_sketch, est) row per
    * group — approximate distinct-word cardinality PER CORPUS SLICE
    * (domain, language, source), the shape a 100-TB profile actually
    * needs. The k smallest hashes per group are cut with a row_number
    * window that Spark plans as WindowGroupLimit: every map task keeps
    * only its local top-k per group BEFORE the exchange, so the shuffle
    * carries ≤ k·|groups| rows per task, not the corpus vocabulary.
    */
  def kmvGroupSketch(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val hashes = df
      .select(col(groupCol).as("grp"),
        explode(graft.functions.WordHashes.word_hashes(col(textCol))).as("wh"))
      .select(col("grp"),
        ((lit(KmvA) * col("wh") + lit(KmvB)) % TextOps.HashMod).as("hv"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("hv"))
    hashes.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= K)
      .groupBy(col("grp"))
      .agg(max(col("hv")).as("kth_min"), count(lit(1)).as("n_in_sketch"))
      .select(col("grp"), lit(K.toLong).as("k"),
        col("kth_min"), col("n_in_sketch"),
        when(col("n_in_sketch") < K, col("n_in_sketch"))
          .otherwise(expr(s"${(K - 1).toLong * TextOps.HashMod} div kth_min"))
          .as("est"))
  }

  /** KMV MERGE — the property that makes the sketch a 100-TB tool: the
    * union of two corpus parts is summarized by unioning their k-minimum
    * hash SETS and re-cutting to the k smallest, never rescanning either
    * part. The global k smallest hashes are necessarily contained in the
    * union of each side's k smallest, so the merged sketch is IDENTICAL
    * to the sketch of the union (SketchesSpec pins this equality; the
    * oracle checks the merged row itself). Per-part cuts are
    * `ORDER BY hv LIMIT k` — TakeOrderedAndProject, a top-k, not a
    * global sort. This is how per-shard / per-day sketches roll up into
    * corpus-wide cardinality without a second pass over the data.
    */
  def kmvMergeSketch(parts: Seq[DataFrame], textCol: String): DataFrame = {
    val partMins = parts.map { df =>
      df.select(explode(graft.functions.WordHashes.word_hashes(col(textCol))).as("wh"))
        .select(((lit(KmvA) * col("wh") + lit(KmvB)) % TextOps.HashMod).as("hv"))
        .distinct()
        .orderBy(col("hv")).limit(K)
    }
    // distinct again: a value can be in several parts' sketches
    val merged = partMins.reduce(_ union _).distinct().orderBy(col("hv")).limit(K)
    merged
      .agg(max(col("hv")).as("kth_min"), count(lit(1)).as("n_in_sketch"))
      .select(
        lit(K.toLong).as("k"),
        col("kth_min"), col("n_in_sketch"),
        when(col("n_in_sketch") < K, col("n_in_sketch"))
          .otherwise(expr(s"${(K - 1).toLong * TextOps.HashMod} div kth_min"))
          .as("est"))
  }

  /** KMV as a STREAMING sketch: the k smallest distinct scattered word
    * hashes live as keyed `transformWithState` state — a fixed K longs
    * per key no matter how much data streams past, the textbook
    * bounded-state cardinality monitor. Each arriving document folds
    * its words in (same code-point hash + scatter as the batch
    * [[kmvWordSketch]], so the Scala fold is bit-identical to the
    * `word_hashes` expression) and the running state is emitted; the
    * final element's state IS the corpus sketch. KMV's merge algebra
    * makes the result arrival-order-independent, so the streaming
    * query shares the batch sketch's oracle verbatim.
    */
  def kmvStreamPipe: graft.core.Pipe[String, Vector[Long]] =
    graft.streaming.StreamPipes.scanTws(Vector.empty[Long]) {
      (st: Vector[Long], text: String) =>
        var v = st
        // mirror WordHashes.hashWords: split on ' ' code points, empty
        // words hash to 0, then the KmvA/KmvB scatter
        var acc = 0L
        var i = 0
        val n = text.length
        while (i < n) {
          val cp = text.codePointAt(i)
          if (cp == ' ') {
            v = kmvInsert(v, (KmvA * acc + KmvB) % TextOps.HashMod)
            acc = 0L
          } else acc = (acc * 31 + cp) % TextOps.HashMod
          i += Character.charCount(cp)
        }
        kmvInsert(v, (KmvA * acc + KmvB) % TextOps.HashMod)
    }

  /** Sorted bounded-insert into the k-min set: no-op when the sketch is
    * full and `hv` ≥ its max or already present; otherwise insert in
    * place and drop the new maximum.
    */
  private def kmvInsert(v: Vector[Long], hv: Long): Vector[Long] =
    if (v.length == K && hv >= v.last) v
    else {
      var lo = 0
      var hi = v.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (v(m) < hv) lo = m + 1 else hi = m
      }
      if (lo < v.length && v(lo) == hv) v
      else {
        val ins = (v.take(lo) :+ hv) ++ v.drop(lo)
        if (ins.length > K) ins.init else ins
      }
    }

  /** Reduce [[kmvStreamPipe]]'s emitted running states to the final
    * summary row — same columns as [[kmvWordSketch]].
    */
  def kmvStreamSummary(out: DataFrame): DataFrame =
    out.orderBy(col("seq").desc).limit(1)
      .select(
        lit(K.toLong).as("k"),
        element_at(col("value"), size(col("value"))).as("kth_min"),
        size(col("value")).cast("long").as("n_in_sketch"),
        when(size(col("value")) < K, size(col("value")).cast("long"))
          .otherwise(expr(
            s"${(K - 1).toLong * TextOps.HashMod} div element_at(value, size(value))"))
          .as("est"))

  /** DuckDB mirror of [[kmvMergeSketch]] for a two-way split of the
    * documents table on `partPred` vs NOT `partPred`.
    */
  def kmvMergeSketchSql(partPred: String): String = {
    val h = s"(($KmvA * (${TextOps.charHashSql("w")}) + $KmvB) % ${TextOps.HashMod})"
    def side(pred: String) =
      s"""(SELECT DISTINCT $h AS hv
           FROM (SELECT UNNEST(string_split(text, ' ')) AS w
                 FROM documents WHERE $pred) t
           ORDER BY hv LIMIT $K)"""
    s"""WITH merged AS (SELECT DISTINCT hv FROM
                          (SELECT hv FROM ${side(partPred)} a
                           UNION ALL SELECT hv FROM ${side(s"NOT ($partPred)")} b) u
                        ORDER BY hv LIMIT $K)
        SELECT ${K}::BIGINT AS k, max(hv) AS kth_min, count(*) AS n_in_sketch,
               CASE WHEN count(*) < $K THEN count(*)
                    ELSE ${(K - 1).toLong * TextOps.HashMod} // max(hv) END AS est
        FROM merged"""
  }

  /** Pairwise corpus-overlap matrix from per-source KMV sketches — the
    * "how much does source A repeat source B" report a multi-source
    * corpus build runs before mixing (high overlap ⇒ dedup across the
    * pair or down-weight one side). Universe = word-3-gram shingle
    * hashes ([[Dedup.shingleHashes]], affine-scattered like every KMV
    * here); per source the k smallest survive, and each pair's Jaccard
    * is estimated on the MERGED k-min set U = kmin_k(S_a ∪ S_b):
    * Ĵ = |U ∩ S_a ∩ S_b| / |U| — the standard KMV union estimator,
    * reported as exact-integer ppm.
    *
    * Scale shape: one corpus-wide explode + distinct (the sketch
    * build — same cost class as [[kmvGroupSketch]]); everything after
    * is bounded by SKETCH GEOMETRY, not data size: k·|sources| sketch
    * rows, |sources|²/2 pairs, and the pair expansion is a broadcast
    * nested-loop of the tiny pair list against the tiny sketch table
    * (≤ k·|sources|² rows) — deliberate and bounded, never touching
    * the corpus again.
    */
  def corpusOverlap(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = Dedup.shingleHashes(
        df.select(col(srcCol), col(textCol)), srcCol, textCol)
      .select(col("doc_id").as("src"), explode(col("sh")).as("h0"))
      .select(col("src"),
        ((lit(KmvA) * col("h0") + lit(KmvB)) % TextOps.HashMod).as("hv"))
      .distinct()
    val w = Window.partitionBy(col("src")).orderBy(col("hv"))
    val kmin = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= K).drop("__rn")
    val srcs = kmin.select(col("src")).distinct()
    val pairs = srcs.select(col("src").as("src_a"))
      .crossJoin(srcs.select(col("src").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    val members = broadcast(pairs)
      .join(kmin, col("src") === col("src_a") || col("src") === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("hv"))
      .agg(max(when(col("src") === col("src_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("src") === col("src_b"), 1).otherwise(0)).as("in_b"))
    val wp = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("hv"))
    members.withColumn("__rn", row_number().over(wp)).filter(col("__rn") <= K)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_union"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("n_both"))
      .select(col("src_a"), col("src_b"), col("n_union"), col("n_both"),
        expr("n_both * 1000000 div n_union").as("jaccard_ppm"))
  }

  /** DuckDB mirror of [[corpusOverlap]] over the documents table. */
  def corpusOverlapSql(srcCol: String): String =
    s"""WITH sh AS (SELECT $srcCol AS src, UNNEST(${Dedup.shinglesSql}) AS h0
                    FROM documents),
        hs AS (SELECT DISTINCT src, ($KmvA * h0 + $KmvB) % ${TextOps.HashMod} AS hv
               FROM sh),
        km AS (SELECT src, hv FROM
                 (SELECT src, hv,
                         row_number() OVER (PARTITION BY src ORDER BY hv) AS rn
                  FROM hs) r
               WHERE rn <= $K),
        s AS (SELECT DISTINCT src FROM km),
        p AS (SELECT a.src AS src_a, b.src AS src_b
              FROM s a, s b WHERE a.src < b.src),
        m AS (SELECT p.src_a, p.src_b, km.hv,
                     MAX(CASE WHEN km.src = p.src_a THEN 1 ELSE 0 END) AS in_a,
                     MAX(CASE WHEN km.src = p.src_b THEN 1 ELSE 0 END) AS in_b
              FROM p JOIN km ON km.src = p.src_a OR km.src = p.src_b
              GROUP BY 1, 2, 3),
        t AS (SELECT src_a, src_b, hv, in_a, in_b,
                     row_number() OVER (PARTITION BY src_a, src_b
                                        ORDER BY hv) AS rn
              FROM m)
        SELECT src_a, src_b, COUNT(*) AS n_union,
               CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_both,
               CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS jaccard_ppm
        FROM t WHERE rn <= $K GROUP BY 1, 2"""

  /** DuckDB mirror of [[kmvGroupSketch]] over the documents table. */
  def kmvGroupSketchSql(groupCol: String): String = {
    val h = s"(($KmvA * (${TextOps.charHashSql("w")}) + $KmvB) % ${TextOps.HashMod})"
    s"""WITH hs AS (SELECT DISTINCT $groupCol AS grp, $h AS hv
                    FROM (SELECT $groupCol, UNNEST(string_split(text, ' ')) AS w
                          FROM documents) t),
             rk AS (SELECT grp, hv,
                           row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
                    FROM hs)
        SELECT grp, ${K}::BIGINT AS k, max(hv) AS kth_min,
               count(*) AS n_in_sketch,
               CASE WHEN count(*) < $K THEN count(*)
                    ELSE ${(K - 1).toLong * TextOps.HashMod} // max(hv) END AS est
        FROM rk WHERE rn <= $K GROUP BY grp"""
  }

  // ----- Count-Min sketch (frequency estimation) -----

  /** Count-Min dimensions: depth (independent hash rows) × width
    * (buckets per row). Estimate of a word's count = min over rows of
    * its bucket's counter; overestimates by at most ε·N with
    * ε = e/width at confidence 1 − e^−depth. The sketch is a FIXED
    * d×w counter matrix no matter the corpus size — the entire shuffle
    * is ≤ d·w rows after map-side partial aggregation, which is the
    * point at 100 TB: frequency structure of an unbounded vocabulary in
    * O(1) memory.
    */
  val CmsDepth = 4
  val CmsWidth = 512

  /** Per-row affine scatter constants (row j hashes
    * `((a_j·h + b_j) mod P) mod width` over the portable word hash h).
    * All a < 2^32 so a·h < 2^62 stays in Long in both engines.
    */
  val RowConsts: Seq[(Long, Long)] = Seq(
    2654435761L -> 104729L,
    2246822519L -> 12582917L,
    3266489917L -> 786433L,
    668265263L  -> 201326611L)

  private[operators] def bucketCol(h: Column, j: Int, width: Int): Column = {
    val (a, b) = RowConsts(j)
    ((lit(a) * h + lit(b)) % TextOps.HashMod) % width
  }

  private[operators] def bucketSql(h: String, j: Int, width: Int): String = {
    val (a, b) = RowConsts(j)
    s"((($a * $h + $b) % ${TextOps.HashMod}) % $width)"
  }

  /** The populated cells of a Count-Min sketch over the words of
    * `textCol`: (row, bucket, cnt), cnt = total word occurrences
    * hashing into that cell. One narrow shuffle of ≤ depth·width rows.
    */
  def cmsWordSketch(df: DataFrame, textCol: String): DataFrame = {
    val hs = df.select(
      explode(graft.functions.WordHashes.word_hashes(col(textCol))).as("wh"))
    val cells = (0 until CmsDepth).map { j =>
      struct(lit(j.toLong).as("row"), bucketCol(col("wh"), j, CmsWidth).as("bucket"))
    }
    hs.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The same Count-Min cells as DuckDB SQL over the documents table. */
  def cmsWordSketchSql: String = {
    val rows = (0 until CmsDepth)
      .map(j => s"SELECT ${j}::BIGINT AS row, ${bucketSql("h", j, CmsWidth)} AS bucket FROM wh")
      .mkString(" UNION ALL ")
    s"""WITH wh AS (SELECT ${TextOps.charHashSql("w")} AS h
                    FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) t),
             cells AS ($rows)
        SELECT row, bucket, COUNT(*) AS cnt FROM cells GROUP BY row, bucket"""
  }

  // ----- Bloom filter (set membership) -----

  /** Bloom geometry: `BloomBits` bit positions stored as 32-bit slots
    * (bit index < 32 so the mask `1<<bit` is overflow-safe BIGINT in
    * both engines), `BloomK` probes per element. Like the CMS, the
    * filter is fixed-size: the shuffle after map-side OR-combine is
    * ≤ BloomBits/32 rows regardless of corpus size.
    */
  val BloomBits = 4096
  val BloomK = 3

  /** Bit positions of one element hash `h` (reuses the CMS row
    * constants — BloomK ≤ RowConsts.size).
    */
  private def bloomPositions(h: Column): Seq[Column] =
    (0 until BloomK).map(j => bucketCol(h, j, BloomBits))

  /** The non-empty 32-bit slots of a Bloom filter over the DISTINCT
    * words of `textCol`: (slot, bits). Distinct first — membership is
    * a set property, and distinct-ing the narrow hash column keeps the
    * explode fan-out off repeated words.
    */
  def bloomWordFilter(df: DataFrame, textCol: String): DataFrame = {
    val hs = df.select(
        explode(graft.functions.WordHashes.word_hashes(col(textCol))).as("wh"))
      .distinct()
    hs.select(explode(array(bloomPositions(col("wh")): _*)).as("p"))
      .select(expr("p div 32").cast("long").as("slot"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("mask"))
      .groupBy(col("slot")).agg(expr("bit_or(mask)").as("bits"))
  }

  /** The same Bloom slots as DuckDB SQL over the documents table. */
  def bloomWordFilterSql: String = {
    val probes = (0 until BloomK)
      .map(j => s"SELECT ${bucketSql("h", j, BloomBits)} AS p FROM wh")
      .mkString(" UNION ALL ")
    s"""WITH wh AS (SELECT DISTINCT ${TextOps.charHashSql("w")} AS h
                    FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) t),
             ps AS ($probes)
        SELECT p // 32 AS slot, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
        FROM ps GROUP BY p // 32"""
  }

  // ----- Fixed-bin histogram (distribution sketch) -----

  /** Fixed-bin histogram over a numeric column: (bin, cnt) with bin =
    * floor((v - lo) · bins / (hi - lo)), clamped to -1 (underflow) and
    * `bins` (overflow). Output is ≤ bins + 2 rows REGARDLESS of input
    * size — like the CMS/KMV/Bloom, the whole shuffle is the sketch
    * geometry after map-side combine, which is the point at 100 TB:
    * the value distribution of an unbounded column in O(bins) memory.
    *
    * The bin expression is written multiply-then-divide and mirrored
    * token-for-token in [[histogramSql]]: both engines execute the same
    * IEEE double ops in the same order, so bin boundaries can never
    * disagree on a hash compare.
    */
  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, s"need bins >= 1 and hi > lo; got $bins, [$lo, $hi)")
    val v = col(valueCol).cast("double")
    val bin = when(v < lo, lit(-1L))
      .when(v >= hi, lit(bins.toLong))
      .otherwise(floor((v - lit(lo)) * lit(bins.toDouble) / lit(hi - lo)).cast("long"))
    df.select(bin.as("bin")).groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** DuckDB mirror of [[histogram]] over expression `v`. */
  def histogramSql(v: String, lo: Double, hi: Double, bins: Int): String =
    s"""SELECT CASE WHEN $v < $lo THEN -1
                    WHEN $v >= $hi THEN $bins
                    ELSE CAST(FLOOR(($v - $lo) * ${bins.toDouble} / ${hi - lo}) AS BIGINT)
               END AS bin,
               COUNT(*) AS cnt
        FROM events GROUP BY 1"""
}
