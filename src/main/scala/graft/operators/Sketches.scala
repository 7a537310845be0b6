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
}
