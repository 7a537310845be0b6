package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Materialize

/** Corpus relevance scoring — TF-IDF and Okapi BM25 over a tokenized
  * document corpus, plus top-k terms per document. These are the
  * retrieval/quality primitives a training-data pipeline runs corpus-wide
  * (term weighting for filtering, near-query mining, doc ranking); the
  * reference's analysis surface stops at per-doc folds, so the shapes
  * here follow the standard IR formulations (Robertson/Sparck Jones BM25;
  * smoothed TF-IDF as in common IR practice).
  *
  * Scale shape: one shuffle to (doc, word) term counts; document
  * frequency is a second narrow aggregation of that result; the score
  * join re-shuffles by word (vocabulary-sized side — Spark's AQE
  * broadcasts it when small, shuffles when not); corpus-level constants
  * (doc count, total tokens) ride a 1-row broadcast. The term-count
  * table feeds two consumers (df agg + join), so it is checkpointed once
  * (Catalyst recomputes shared subplans otherwise — measured on the
  * minhash pair in round 2).
  *
  * Determinism contract (oracle hash-matching): every arithmetic step
  * except ln() — add/sub/mul/div — is correctly rounded IEEE-754 and
  * bit-identical across engines given identical inputs; ln() may differ
  * by 1 ulp (measured: ~1% of values vs DuckDB). Scores are therefore
  * emitted as micro-scaled BIGINTs, floor(x*1e6 + 0.5): a 1-ulp ln delta
  * flips the rounded value only when x*1e6+0.5 lands within ~2 ulp of an
  * integer (~1e-10 per row). Both engines evaluate the SAME expression
  * tree (the SQL is built here, in lockstep with the Column form), so
  * constant folding happens with identical IEEE semantics.
  */
object Relevance {

  /** BM25 term-saturation constant (standard default). */
  val K1 = 1.2
  /** BM25 length-normalization constant (standard default). */
  val B = 0.75

  /** floor(x*1e6 + 0.5) as BIGINT — the micro-scaled fixed-point form. */
  private def micro(x: Column): Column =
    floor(x * lit(1e6) + lit(0.5)).cast("long")

  /** Per-(doc, word) term counts — one shuffle, checkpointed for its two
    * consumers (document-frequency agg and the score join).
    */
  private def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Materialize.checkpoint(
      docs.select(col(idCol), explode(TextOps.words(col(textCol))).as("word"))
        .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf")))

  /** Smoothed TF-IDF per (doc, word):
    * tfidf = tf * (ln((n_docs + 1)/(df + 1)) + 1), micro-scaled.
    * Output: idCol, word, tf, df, tfidf_micro.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termCounts(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)
    tf.join(dfreq, "word")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("word"), col("tf"), col("df"),
        micro(col("tf") * idf).as("tfidf_micro"))
  }

  /** Okapi BM25 per (doc, word):
    * idf = ln(1 + (n_docs - df + 0.5)/(df + 0.5))
    * score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    * with dl = doc token count (= sum of tf per doc) and avgdl =
    * total_tokens/n_docs. Output: idCol, word, tf, df, dl, bm25_micro.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termCounts(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // total tokens == sum of tf (every token, empties included, lands in
    // exactly one term-count row) — read the small checkpointed table
    // instead of re-splitting the full text column a second time
    // broadcast() on the 1-row aggregate for uniformity with the outer
    // stats attach: statless aggregates can otherwise plan as
    // CartesianProduct (PlanSpec pins the BroadcastNestedLoopJoin shape)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(tf.agg(sum(col("tf")).cast("long").as("total_tokens"))))
    val joined = tf.join(dfreq, "word")
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col(idCol))))
      .crossJoin(broadcast(stats))
    val avgdl = col("total_tokens") / col("n_docs")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score = idf * (col("tf") * (lit(K1) + lit(1.0))) /
      (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * (col("dl") / avgdl)))
    joined.select(col(idCol), col("word"), col("tf"), col("df"), col("dl"),
      micro(score).as("bm25_micro"))
  }

  /** Top-k terms per document by TF-IDF, deterministic tie-break on the
    * word. Ranking is over the micro-scaled BIGINT (not the raw double),
    * so the cut is engine-independent; Spark plans the rank filter as
    * WindowGroupLimit (partial top-k below the exchange).
    * Output: idCol, word, tfidf_micro, rk.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    tfIdf(docs, idCol, textCol)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tfidf_micro").desc, col("word").asc)))
      .filter(col("rk") <= k)
      .select(col(idCol), col("word"), col("tfidf_micro"), col("rk"))

  // ---- oracle SQL, built from the same constants and the same
  // ---- expression structure (see determinism contract above)

  private val TfSql =
    """tf AS (SELECT doc_id, w AS word, COUNT(*)::BIGINT AS tf
              FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
                    FROM documents) t
              GROUP BY doc_id, w)"""

  private val DfreqSql =
    "dfreq AS (SELECT word, COUNT(*)::BIGINT AS df FROM tf GROUP BY word)"

  def tfIdfSql: String =
    s"""WITH $TfSql, $DfreqSql,
            stats AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents)
        SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
               CAST(FLOOR((tf.tf * (ln((stats.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0))
                    * 1000000.0 + 0.5) AS BIGINT) AS tfidf_micro
        FROM tf JOIN dfreq ON tf.word = dfreq.word CROSS JOIN stats"""

  def bm25Sql: String =
    s"""WITH $TfSql, $DfreqSql,
            stats AS (SELECT COUNT(*)::BIGINT AS n_docs,
                             SUM(len(string_split(text, ' ')))::BIGINT AS total_tokens
                      FROM documents),
            j AS (SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
                         SUM(tf.tf) OVER (PARTITION BY tf.doc_id)::BIGINT AS dl
                  FROM tf JOIN dfreq ON tf.word = dfreq.word)
        SELECT doc_id, word, tf, df, dl,
               CAST(FLOOR((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                      * (tf * (($K1 + 1.0)::DOUBLE))
                      / (tf + $K1 * (1.0 - $B + $B * (dl / (total_tokens / n_docs)))))
                    * 1000000.0 + 0.5) AS BIGINT) AS bm25_micro
        FROM j CROSS JOIN stats"""

  def topTermsSql(k: Int): String =
    s"""SELECT doc_id, word, tfidf_micro,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf_micro DESC, word)::INT AS rk
        FROM ($tfIdfSql) s
        QUALIFY rk <= $k"""

  /** Capped-postings inverted index — the retrieval structure a corpus
    * search/decontamination service materializes: per word, its document
    * frequency, collection frequency, and the FIRST `cap` posting
    * doc_ids (ascending, comma-joined — the head of the posting list; a
    * production index shards the full list, but the stats + head are
    * what corpus analytics reads). The cap runs as a row_number window
    * BELOW the final aggregation, which Spark plans as WindowGroupLimit
    * (a per-key top-k heap under the exchange — no full per-word
    * materialization, so a viral stopword costs the same as a rare
    * term). Stats come from the full, uncapped aggregation; both
    * consumers read the one checkpointed term-count table.
    * Output: (word, df, cf, postings).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    cap: Int): DataFrame = {
    val tc = termCounts(docs, idCol, textCol)
    val stats = tc.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val capped = tc
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("word")).orderBy(col(idCol).asc)))
      .filter(col("rn") <= cap)
      .groupBy(col("word"))
      .agg(array_join(
        transform(sort_array(collect_list(col(idCol))), _.cast("string")),
        ",").as("postings"))
    stats.join(capped, "word")
      .select(col("word"), col("df"), col("cf"), col("postings"))
  }

  /** DuckDB mirror of [[invertedIndex]]. */
  def invertedIndexSql(cap: Int): String =
    s"""WITH $TfSql,
        stats AS (SELECT word, COUNT(*)::BIGINT AS df,
                         CAST(SUM(tf) AS BIGINT) AS cf
                  FROM tf GROUP BY word),
        capped AS (SELECT word, doc_id FROM
                     (SELECT word, doc_id, row_number() OVER
                        (PARTITION BY word ORDER BY doc_id) AS rn FROM tf) r
                   WHERE rn <= $cap),
        post AS (SELECT word,
                        string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
                 FROM capped GROUP BY word)
        SELECT s.word, s.df, s.cf, p.postings
        FROM stats s JOIN post p ON p.word = s.word"""
}
