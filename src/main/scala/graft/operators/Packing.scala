package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: assign documents
  * (in corpus order) to fixed token-budget training sequences. The two
  * standard disciplines, each with a different scale shape:
  *
  *  1. [[concatSplit]] — "concat-and-split" (GPT-style): the corpus is
  *     one virtual token stream, split every `budget` tokens; documents
  *     may straddle pack boundaries. Needs one global exclusive prefix
  *     sum of token counts — computed with [[RowExec.runningSumLong]]
  *     (range-partition + per-partition fold + O(P) driver
  *     prefix-combine + broadcast carries), NEVER a global SQL window
  *     (`ORDER BY` with no `PARTITION BY` is a single-task sort — the
  *     one plan shape that cannot survive 100 TB).
  *
  *  2. [[greedyPack]] — document-boundary-respecting first-fit: docs are
  *     packed whole, a new pack starts when the current one cannot fit
  *     the next doc. The fold is inherently sequential (each decision
  *     depends on the running fill), so the scale form shards the corpus
  *     into fixed `groupSize` runs of doc ids and packs each run
  *     independently — embarrassingly parallel, deterministic (group
  *     boundaries are a pure function of doc_id, not of partitioning),
  *     state bounded by one group. This is how production packers
  *     actually run: global first-fit across 100 TB would serialize the
  *     whole corpus through one state machine for no training benefit.
  *
  * Token counts are whitespace word counts (`TextOps.words`) — the same
  * split every other text operator uses, so pack budgets compose with
  * `chunkWords`/`tokens` accounting.
  */
object Packing {

  /** Concat-and-split packing plan: per document, its token count, the
    * exclusive start offset in the virtual token stream, the first and
    * last pack it lands in (`pack_first`/`pack_last`, width `budget`),
    * and its offset within the first pack. Pure integer arithmetic —
    * hash-stable across engines.
    */
  def concatSplit(df: DataFrame, idCol: String, textCol: String,
                  budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val toks = df.select(
      col(idCol).cast("long").as("seq"),
      size(TextOps.words(col(textCol))).cast("long").as("tok"))
    RowExec.runningSumLong(toks, col("tok"), "__run")
      .withColumn("start_off", col("__run") - col("tok"))
      .select(
        col("seq").as(idCol),
        col("tok"),
        col("start_off"),
        expr(s"start_off div $budget").as("pack_first"),
        // greatest(start_off, ·) pins tok = 0 to pack_first: Spark `div`
        // truncates toward zero while the DuckDB oracle's `//` floors,
        // and they diverge exactly when start_off + tok - 1 < start_off.
        // Whitespace split always yields tok >= 1 today, but a tokenizer
        // swap (TextOps.tokens CAN return 0) must not break the match.
        expr(s"greatest(start_off, start_off + tok - 1) div $budget")
          .as("pack_last"),
        expr(s"start_off % $budget").as("off_in_pack"))
  }

  /** First-fit greedy packing within fixed doc-id groups: documents are
    * visited in doc_id order inside each group of `groupSize` consecutive
    * ids; a doc joins the current pack if it fits, else opens the next.
    * Output per doc: its group, token count, pack ordinal within the
    * group (`bin`), and the pack's fill after placing it. A doc larger
    * than the budget occupies a pack alone (fill > budget for that one
    * row — packs never split documents by definition of this discipline).
    *
    * One shuffle (on `grp`); per-task memory is one group of
    * (id, tok) pairs — `groupSize` longs, not document text.
    */
  def greedyPack(df: DataFrame, idCol: String, textCol: String,
                 budget: Long, groupSize: Long): DataFrame = {
    require(budget >= 1 && groupSize >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("doc_id"),
        expr(s"CAST($idCol AS BIGINT) div $groupSize").as("grp"),
        size(TextOps.words(col(textCol))).cast("long").as("tok"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (_, it) =>
        val docs = it.toArray.sortBy(_._1)
        var bin = 0L
        var fill = 0L
        docs.iterator.map { case (id, g, tok) =>
          if (fill > 0 && fill + tok > budget) { bin += 1; fill = tok }
          else fill += tok
          (id, g, tok, bin, fill)
        }
      }
      .toDF("doc_id", "grp", "tok", "bin", "fill")
  }

  /** Pack-level summary of [[greedyPack]]: per (grp, bin), the number of
    * docs, total fill, and waste (`budget - fill`, negative for a
    * single-oversized-doc pack). The downstream "how full are my
    * training sequences" report.
    */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("grp"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("fill_total"))
      .withColumn("waste", lit(budget) - col("fill_total"))
}
