package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** TF-IDF / BM25 corpus scoring vs an independent Scala computation of
  * the same formulas (the oracle round re-checks against DuckDB; this
  * spec pins the formulas and the micro-scaling independently).
  */
class RelevanceSpec extends SparkSpec {

  // tiny corpus with a stop-ish word in every doc, a mid-frequency word,
  // and unique words — exercises idf extremes and length normalization
  private val corpus = Seq(
    (1L, "the cat sat"),
    (2L, "the dog sat on the mat"),
    (3L, "the bird flew"))

  private def toks(s: String) = s.split(" ", -1).toSeq
  private val nDocs = corpus.size
  private val docToks = corpus.map { case (id, t) => id -> toks(t) }.toMap
  private val tf: Map[(Long, String), Long] = docToks.toSeq
    .flatMap { case (id, ws) => ws.map(w => (id, w)) }
    .groupBy(identity).view.mapValues(_.size.toLong).toMap
  private val dfreq: Map[String, Long] =
    tf.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap

  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("tfIdf matches the smoothed formula, micro-scaled") {
    import spark.implicits._
    val got = Relevance.tfIdf(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == tf.size)
    tf.foreach { case (key @ (_, w), n) =>
      val d = dfreq(w)
      val want = micro(n * (math.log((nDocs + 1.0) / (d + 1.0)) + 1.0))
      assert(got(key) == ((n, d, want)), s"$key: got ${got(key)}")
    }
    // idf floor: a word in every doc still scores tf * (ln(1)+1) = tf
    assert(got((2L, "the"))._3 == micro(2.0))
  }

  test("bm25 matches the Okapi formula with per-doc length normalization") {
    import spark.implicits._
    val avgdl = docToks.values.map(_.size).sum.toDouble / nDocs
    val got = Relevance.bm25(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size == tf.size)
    tf.foreach { case (key @ (id, w), n) =>
      val d = dfreq(w)
      val dl = docToks(id).size.toLong
      val idf = math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5))
      val score = idf * (n * (Relevance.K1 + 1.0)) /
        (n + Relevance.K1 * (1.0 - Relevance.B + Relevance.B * (dl / avgdl)))
      assert(got(key) == ((n, d, dl, micro(score))), s"$key: got ${got(key)}")
    }
    // shorter docs outrank longer ones for an equally-rare term
    assert(got((1L, "cat"))._4 > got((2L, "dog"))._4)
  }

  test("topTerms keeps k best per doc with a deterministic word tie-break") {
    import spark.implicits._
    val got = Relevance.topTerms(corpus.toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(got.groupBy(_._1).forall(_._2.length == 2))
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      // rank order agrees with (score desc, word asc)
      assert(sorted.map(r => (-r._3, r._2)).sameElements(
        sorted.map(r => (-r._3, r._2)).sorted))
    }
    // doc 1: "cat"/"sat" (unique + mid words) outrank the stop word
    val d1 = got.filter(_._1 == 1L).sortBy(_._4).map(_._2).toSeq
    assert(d1 == Seq("cat", "sat"), s"got $d1")
  }
  test("invertedIndex: df/cf from the full aggregation, postings capped at 16 ascending") {
    import spark.implicits._
    val docs = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "alpha beta" else "alpha")).toDF("doc_id", "text")
    val got = Relevance.invertedIndex(docs, "doc_id", "text", 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // stats count ALL postings; the list keeps only the first 16 doc_ids
    assert(got("alpha") == ((40L, 40L, (1 to 16).mkString(","))))
    assert(got("beta") == ((20L, 20L, (2 to 32 by 2).mkString(","))))
  }
}
