package graft

import org.apache.spark.sql.functions._
import graft.operators.{Charsets, LangModel, TextOps}

/** The trained language identifier: determinism, the multi-class
  * perceptron mechanics, and the spec-pinned CONTRAST with the ASCII
  * stopword heuristic it replaces (the reason the model exists).
  */
class LangModelSpec extends SparkSpec {

  /** The six-script corpus the harness queries train on, rebuilt
    * directly from the Charsets fixture functions (same page text the
    * decoded archive yields): non-mojibake modes only, slot-language
    * labels.
    */
  private lazy val corpus = {
    val sqlc = spark
    import sqlc.implicits._
    val rows = (0L until 500L).filter(_ % 4 != 3).map { id =>
      val slot = Charsets.slotOf(id)
      val (label, lang, text) = Charsets.Slots(slot)
      val html =
        if (Charsets.modeOf(id) == 1) Charsets.htmlMeta(id, label, text)
        else Charsets.htmlNoMeta(id, text)
      (id, html, lang)
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("training is deterministic: two runs produce identical weights") {
    val a = LangModel.train(corpus, "doc_id", "text", "lang")
      .orderBy("lang", "d").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = LangModel.train(corpus, "doc_id", "text", "lang")
      .orderBy("lang", "d").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b))
    val langs = corpus.select("lang").distinct().count()
    assert(a.length == langs * LangModel.NDims)
  }

  test("the trained model beats the ASCII stopword heuristic on the six-script corpus") {
    val n = corpus.count()
    val scored = LangModel.score(corpus, "doc_id", "text", "lang")
    val trained = scored.filter(col("agree")).count()
    // the ASCII heuristic knows de/en/es/fr stopwords only: every
    // ja/ko/zh/ru/el page is 'unknown' to it
    val heuristic = corpus
      .select(col("lang"), TextOps.langId(col("text")).as("p"))
      .filter(col("lang") === col("p")).count()
    assert(n > 0)
    assert(heuristic < n / 3,
      s"heuristic unexpectedly strong ($heuristic of $n) — contrast lost its teeth")
    assert(trained > heuristic * 2,
      s"trained agreement $trained must dwarf heuristic $heuristic of $n")
    // the scripts are linearly separable in gram space: the model must
    // classify essentially everything
    assert(trained * 100 >= n * 99,
      s"trained agreement $trained/$n below 99%")
  }

  test("every script classifies: per-language agreement is total") {
    val perLang = LangModel.score(corpus, "doc_id", "text", "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(when(col("agree"), 1L).otherwise(0L)).as("ok"))
      .collect()
    assert(perLang.nonEmpty)
    for (r <- perLang)
      assert(r.getLong(1) == r.getLong(2),
        s"lang ${r.getString(0)}: ${r.getLong(2)}/${r.getLong(1)} agree")
  }

  test("char 3-grams: engine column matches a reference implementation") {
    val sqlc = spark
    import sqlc.implicits._
    val cases = Seq("", "a", "ab", "abc", "abcd", "中文混合 text",
      "高速データ処理 mixed 123")
    val got = cases.toDF("t").select(LangModel.grams(col("t")).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    val want = cases.map(s =>
      if (s.length < 3) Nil
      else (0 to s.length - 3).map(i => s.substring(i, i + 3)).toList)
    assert(got.toList == want.toList)
  }
}
