package graft

import org.apache.spark.sql.functions._

import graft.operators.{ColOps, Sketches, TextOps}

/** Semantic guarantees of the frequency/membership sketches — the
  * properties a user relies on, independent of the oracle hash-match:
  * Count-Min never underestimates (and overestimates within ε·N for the
  * words that matter), the Bloom filter has no false negatives, and
  * both sketches stay at their fixed size.
  */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = ColOps.table(spark, dir, "documents")

  /** Exact word counts (driver-side truth). */
  private lazy val trueCounts: Map[String, Long] = docs
    .select(explode(TextOps.words(col("text"))).as("w"))
    .groupBy("w").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def portableHash(w: String): Long = {
    var acc = 0L
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      acc = (acc * 31 + cp) % TextOps.HashMod
      i += Character.charCount(cp)
    }
    acc
  }

  test("kmvGroupSketch: exact fallback below K distinct; groups independent; estimate sane above K") {
    import spark.implicits._
    // group "small": 3 distinct words (< K=256) → est must be EXACT;
    // group "big": 400 distinct words (> K) → KMV estimate within 25%
    val small = Seq(("small", "alpha beta gamma"), ("small", "alpha beta gamma"))
    val big = (0 until 40).map(i =>
      ("big", (0 until 10).map(j => s"w${i * 10 + j}").mkString(" ")))
    val df = (small ++ big).toDF("lang", "text")
    val out = Sketches.kmvGroupSketch(df, "lang", "text")
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_in_sketch"), r.getAs[Long]("est"))).toMap
    assert(out("small") == ((3L, 3L)), s"got ${out("small")}")
    val (nBig, estBig) = out("big")
    assert(nBig == Sketches.K.toLong)
    assert(math.abs(estBig - 400L) <= 100L, s"big est=$estBig")
  }

  test("kmvMergeSketch: merged part-sketches EQUAL the whole-corpus sketch") {
    val whole = Sketches.kmvWordSketch(docs, "text").head()
    val merged = Sketches.kmvMergeSketch(
      Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0)),
      "text").head()
    assert(merged == whole, s"merged=$merged whole=$whole")
    // and a 3-way split merges to the same row too
    val merged3 = Sketches.kmvMergeSketch(
      (0 to 2).map(r => docs.filter(col("doc_id") % 3 === r)), "text").head()
    assert(merged3 == whole, s"merged3=$merged3 whole=$whole")
  }

  test("Count-Min: estimate >= true count for every word; <= true + eps*N for the top 50") {
    val cells = Sketches.cmsWordSketch(docs, "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.size <= Sketches.CmsDepth * Sketches.CmsWidth)
    val n = trueCounts.values.sum
    def estimate(w: String): Long = {
      val h = portableHash(w)
      (0 until Sketches.CmsDepth).map { j =>
        val (a, b) = Sketches.RowConsts(j)
        val bucket = ((a * h + b) % TextOps.HashMod) % Sketches.CmsWidth
        cells.getOrElse((j.toLong, bucket), 0L)
      }.min
    }
    trueCounts.foreach { case (w, c) =>
      assert(estimate(w) >= c, s"CMS underestimated '$w'")
    }
    // ε = e/width; the classic bound holds w.h.p., so check the heavy
    // hitters (where a user actually reads the sketch), not the tail
    val eps = math.E / Sketches.CmsWidth
    val bound = (eps * n).ceil.toLong
    trueCounts.toSeq.sortBy(-_._2).take(50).foreach { case (w, c) =>
      assert(estimate(w) <= c + bound,
        s"CMS estimate for '$w' (${estimate(w)}) exceeds $c + $bound")
    }
  }

  test("Count-Min under load: 2000-word zipf-ish vocabulary still one-sided within eps*N") {
    import spark.implicits._
    // fixture docs carry only ~31 distinct words — far below the sketch
    // width, so collisions barely occur there. This corpus saturates the
    // 512-bucket rows (2000 distinct words, skewed counts: word i
    // appears 1 + 4000/(i+1) times) and checks the bounds where the
    // sketch actually works for a living.
    val docs = (0 until 2000).map { i =>
      (i.toLong, Seq.fill(1 + 4000 / (i + 1))(s"tok$i").mkString(" "))
    }.toDF("doc_id", "text")
    val cells = Sketches.cmsWordSketch(docs, "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.size > Sketches.CmsWidth,
      s"load test failed to populate the sketch (${cells.size} cells)")
    val truth = (0 until 2000).map(i => s"tok$i" -> (1L + 4000 / (i + 1))).toMap
    val n = truth.values.sum
    def estimate(w: String): Long = {
      val h = portableHash(w)
      (0 until Sketches.CmsDepth).map { j =>
        val (a, b) = Sketches.RowConsts(j)
        cells.getOrElse((j.toLong, ((a * h + b) % TextOps.HashMod) % Sketches.CmsWidth), 0L)
      }.min
    }
    val bound = (math.E / Sketches.CmsWidth * n).ceil.toLong
    truth.foreach { case (w, c) =>
      val e = estimate(w)
      assert(e >= c, s"CMS underestimated '$w' under load")
      assert(e <= c + bound, s"CMS estimate for '$w' ($e) exceeds $c + $bound")
    }
  }

  private def bloomMember(slots: Map[Long, Long])(w: String): Boolean = {
    val h = portableHash(w)
    (0 until Sketches.BloomK).forall { j =>
      val (a, b) = Sketches.RowConsts(j)
      val p = ((a * h + b) % TextOps.HashMod) % Sketches.BloomBits
      (slots.getOrElse(p / 32, 0L) & (1L << (p % 32))) != 0
    }
  }

  test("Bloom under load: 2000 distinct words, still zero false negatives") {
    import spark.implicits._
    val docs = (0 until 2000).map(i => (i.toLong, s"tok$i")).toDF("doc_id", "text")
    val slots = Sketches.bloomWordFilter(docs, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(slots.size <= Sketches.BloomBits / 32)
    (0 until 2000).foreach { i =>
      assert(bloomMember(slots)(s"tok$i"), s"false negative for tok$i under load")
    }
  }

  test("Bloom: no false negatives; false-positive rate within 3x the geometry's bound") {
    val slots = Sketches.bloomWordFilter(docs, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(slots.size <= Sketches.BloomBits / 32)
    def member(w: String): Boolean = bloomMember(slots)(w)
    trueCounts.keys.foreach { w =>
      assert(member(w), s"Bloom false negative for '$w'")
    }
    val probes = (0 until 2000).map(i => s"__absent_token_$i")
      .filterNot(trueCounts.contains)
    val fpRate = probes.count(member).toDouble / probes.size
    val nDistinct = trueCounts.size
    val theoretical = math.pow(
      1 - math.exp(-Sketches.BloomK.toDouble * nDistinct / Sketches.BloomBits),
      Sketches.BloomK)
    assert(fpRate <= theoretical * 3 + 0.01,
      f"Bloom FP rate $fpRate%.4f vs theoretical $theoretical%.4f")
  }

  test("histogram: counts conserved, boundaries exact, under/overflow clamped") {
    import spark.implicits._
    // [0, 10) in 5 bins of width 2; -3 underflows, 10 and 11 overflow,
    // 2.0 sits EXACTLY on a boundary and must land in bin 1, not bin 0
    val vals = Seq(-3.0, 0.0, 1.999, 2.0, 3.5, 9.999, 10.0, 11.0)
    val got = Sketches.histogram(vals.toDF("value"), "value", 0.0, 10.0, 5)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("cnt")).toMap
    assert(got == Map(-1L -> 1L, 0L -> 2L, 1L -> 2L, 4L -> 1L, 5L -> 2L), s"got $got")
    assert(got.values.sum == vals.size) // every row lands in exactly one bin
  }

  test("corpusOverlap: identical sources estimate ~1, disjoint ~0, half-shared in between") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def doc(words: Seq[String]) = words.mkString(" ")
    val vocabA = (0 until 300).map(i => s"a$i")
    val vocabB = (0 until 300).map(i => s"b$i")
    def docsFrom(v: Seq[String], n: Int) =
      (0 until n).map(_ => doc(Seq.fill(30)(v(rnd.nextInt(v.size)))))
    // sx == sy (same docs), sz disjoint vocab, sw = half of sx's docs +
    // half of sz's (COPIES — the universe is 3-gram shingles, so only
    // repeated passages overlap; fresh draws from a shared vocab do not)
    val dx = docsFrom(vocabA, 20)
    val dz = docsFrom(vocabB, 20)
    val dw = dx.take(10) ++ dz.take(10)
    val rows = dx.map(("sx", _)) ++ dx.map(("sy", _)) ++
      dz.map(("sz", _)) ++ dw.map(("sw", _))
    val df = rows.toDF("source", "text")
    val got = Sketches.corpusOverlap(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("jaccard_ppm")).toMap
    assert(got.size == 6, s"got ${got.keySet}")
    assert(got(("sx", "sy")) == 1000000L, s"identical: ${got(("sx", "sy"))}")
    assert(got(("sx", "sz")) == 0L, s"disjoint: ${got(("sx", "sz"))}")
    // the half-shared source overlaps both pure sources strictly between
    val xw = got(("sw", "sx")); val zw = got(("sw", "sz"))
    assert(xw > 50000L && xw < 950000L, s"sw-sx $xw")
    assert(zw > 50000L && zw < 950000L, s"sw-sz $zw")
  }
}
