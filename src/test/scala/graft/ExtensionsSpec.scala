package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.ColOps

/** Session extensions (SQL registration of native expressions) and the
  * skew-salting join helper.
  */
class ExtensionsSpec extends SparkSpec {

  test("word_hashes is callable from SQL via GraftExtensions") {
    // build a SECOND session with extensions over the shared context
    // (getOrCreate would return the default session and skip extensions)
    val prev = spark // force shared-session init first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val got = s2.sql("SELECT word_hashes('a b') AS h").collect()(0).getSeq[Long](0)
      assert(got == Seq(97L, 98L))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("vector_dot / vector_sqdist are callable from SQL via GraftExtensions") {
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                  vector_sqdist(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS s""")
        .collect()(0)
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("codec expressions are callable from SQL via GraftExtensions") {
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val wav = graft.functions.WavCodec.encodePcm16(Array(100, -200, 300), 8000)
      val bmp = graft.functions.BmpCodec.encodeRgb24(Array(0x010203, 0x040506), 2, 1)
      Seq((wav, bmp)).toDF("w", "b").createOrReplaceTempView("m")
      val r = s2.sql(
        """SELECT wav_decode(w).n_samples AS n, wav_samples(w)[1] AS s1,
                  wav_decode(wav_resample(w, 2)).n_samples AS rn,
                  bmp_decode(b).sum_b AS sb,
                  bmp_decode(bmp_resample(b, 2)).n_px AS rp,
                  byte_gram_hashes(w)[0] IS NOT NULL AS g,
                  byte_sum(b) AS bs
           FROM m""").collect()(0)
      assert(r.getLong(0) == 3L && r.getInt(1) == -200 && r.getLong(2) == 2L)
      assert(r.getLong(3) == 3L + 6L && r.getLong(4) == 1L && r.getBoolean(5))
      assert(r.getLong(6) == bmp.map(_ & 0xff).map(_.toLong).sum)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("simhash_bits (one-pass native) is bit-identical to the per-bit HOF formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(9)
    val docs = ((0 until 40).map(_ =>
      Seq.fill(1 + rnd.nextInt(20))(s"w${rnd.nextInt(50)}").mkString(" ")) :+ "")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = operators.Dedup.simhashDf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the displaced HOF form, reconstructed verbatim
    val hw = col("hw")
    val n = size(hw).cast("long")
    val bits = (0 until operators.Dedup.SimBits).map { b =>
      val cnt = size(filter(hw, h => shiftright(h, b).bitwiseAND(lit(1L)) === 1L)).cast("long")
      when(cnt * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }
    val hof = docs.select(col("doc_id"),
        graft.functions.WordHashes.word_hashes(col("text")).as("hw"))
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof, s"diff: ${native.toSet diff hof.toSet}")
    // codegen participation: no CodegenFallback on the path
    val plan = operators.Dedup.simhashDf(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || !plan.contains("Fallback"), plan)
  }

  test("saltedJoin == plain join, with the hot key spread over salts") {
    import spark.implicits._
    // skewed left: one hot key with 10k rows, others tiny
    val left = (Seq.fill(10000)(1) ++ (2 to 50)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val right = (1 to 50).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"), "inner")
    val salted = ColOps.saltedJoin(left, right, "k", 8)
    assert(salted.count() == plain.count())
    val a = salted.orderBy("payload").collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val b = plain.orderBy("payload").collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(a.sameElements(b))
  }
}
