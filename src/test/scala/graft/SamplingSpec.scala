package graft

import org.apache.spark.sql.functions._

import graft.operators.{RowExec, Sampling}

/** Corpus-assembly operators: deterministic stratified sampling and
  * weighted interleave (training-mix primitives).
  */
class SamplingSpec extends SparkSpec {

  test("stratifiedTake: k per stratum, deterministic, a subset of the input") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "s")
    val once = Sampling.stratifiedTake(df, "s", "id", 5).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // exactly k per stratum (both strata have > k members)
    assert(once.count(_._2 == "a") == 5 && once.count(_._2 == "b") == 5)
    // rows come from the input
    assert(once.forall { case (i, s) => (i % 3 == 0) == (s == "a") })
    // bit-deterministic: same sample on a re-run
    val again = Sampling.stratifiedTake(df, "s", "id", 5).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(once.toSeq == again.toSeq)
    // k larger than a stratum keeps the whole stratum
    val all = Sampling.stratifiedTake(df, "s", "id", 1000).count()
    assert(all == 100L)
  }

  test("qualityCap: keeps the k BEST per stratum, id tiebreak, dense ranks") {
    import spark.implicits._
    // stratum a: quality = id (best are the largest ids); stratum b: all
    // ties at quality 7 (the id tiebreak must pick the SMALLEST ids)
    val df = ((0L until 10L).map(i => (i, "a", i)) ++
      (10L until 20L).map(i => (i, "b", 7L))).toDF("id", "s", "q")
    val got = Sampling.qualityCap(df, "s", "id", col("q"), 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3))).sortBy(_._1).toSeq
    assert(got == Seq((7L, "a", 3), (8L, "a", 2), (9L, "a", 1),
      (10L, "b", 1), (11L, "b", 2), (12L, "b", 3)), s"got $got")
    // deterministic on re-run (ties broken by id, never arrival order)
    val again = Sampling.qualityCap(df, "s", "id", col("q"), 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3))).sortBy(_._1).toSeq
    assert(got == again)
  }

  test("throttle: first k by (t, id) per (key, bucket); pre-epoch buckets floor down") {
    import spark.implicits._
    val df = Seq(
      // key 1, bucket 0 (t in [0, 10)): four rows, ties on t broken by id
      (1L, 0L, 10L), (1L, 1L, 11L), (1L, 1L, 12L), (1L, 5L, 13L),
      // key 1, bucket 1: fresh counter
      (1L, 10L, 14L),
      // key 2: independent
      (2L, 0L, 20L),
      // pre-epoch t = -1 must land in bucket -1, not bucket 0
      (3L, -1L, 30L)
    ).toDF("k", "t", "id")
    val got = Sampling.throttle(df, "k", "t", "id", bucketUs = 10L, k = 2)
      .select(col("id"), col("bucket"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(got == Seq((10L, 0L, 1), (11L, 0L, 2), (14L, 1L, 1),
      (20L, 0L, 1), (30L, -1L, 1)), s"got $got")
  }

  test("hashSplit: ratios near the cuts, membership a pure function of the id") {
    import spark.implicits._
    val cuts = Seq("train" -> 800, "val" -> 900, "test" -> 1000)
    val ids = (0L until 5000L).toDF("id")
    val got = Sampling.hashSplit(ids, "id", cuts).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val shares = got.values.groupBy(identity).view.mapValues(_.size / 5000.0).toMap
    assert(math.abs(shares("train") - 0.8) < 0.03, s"train share ${shares("train")}")
    assert(math.abs(shares("val") - 0.1) < 0.02)
    assert(math.abs(shares("test") - 0.1) < 0.02)
    // growing the corpus never reassigns an existing id (leakage safety)
    val grown = Sampling.hashSplit((0L until 10000L).toDF("id"), "id", cuts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, s) => assert(grown(id) == s, s"id $id reassigned") }
    // and the assignment replays as plain arithmetic
    got.foreach { case (id, s) =>
      val b = ((id * Sampling.ScatterA) % graft.operators.TextOps.HashMod) % 1000
      val expect = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(s == expect)
    }
  }

  test("splitLeakage: flags exactly the near-dup pairs that span splits") {
    import spark.implicits._
    val cuts = Seq("train" -> 500, "test" -> 1000)
    // find ids on both sides of the split boundary (membership is a pure
    // function of the id, so probe first)
    val probe = Sampling.hashSplit(
        spark.range(1, 51).toDF("doc_id"), "doc_id", cuts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = probe.keys.min
    val b = probe.collect { case (id, s) if s != probe(a) => id }.min
    val c = probe.collect { case (id, s) if s == probe(a) && id != a => id }.min
    val famX = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val famY = "one two three four five six seven eight nine ten eleven " * 3
    val docs = Seq(
      a -> famX, b -> (famX + "tail"),             // near-dups ACROSS splits
      c -> famY, (c + 100) -> (famY + "tail"))     // near-dups, c+100 split unknown
      .toDF("doc_id", "text")
    val flagged = Sampling.splitLeakage(docs, "doc_id", "text", cuts, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    // (a, b) must be flagged with its two distinct labels
    val ab = flagged.find(p => Set(p._1, p._2) == Set(a, b))
    assert(ab.isDefined, s"cross-split pair not flagged: ${flagged.toList}")
    assert(ab.get._3 != ab.get._4)
    // the famY pair is flagged IFF its members' splits differ — cross-check
    val fam2Cross = Sampling.hashSplit(Seq(c, c + 100).toDF("doc_id"), "doc_id", cuts)
      .collect().map(_.getString(1)).distinct.length == 2
    assert(flagged.exists(p => Set(p._1, p._2) == Set(c, c + 100)) == fam2Cross,
      s"fam2 flag mismatch: ${flagged.toList}")
    // and never a same-family same-split false positive beyond those two pairs
    assert(flagged.forall(p => Set(p._1, p._2) == Set(a, b) || Set(p._1, p._2) == Set(c, c + 100)))
  }

  test("interleave 3:1: schedule positions collision-free, per-side order kept") {
    import spark.implicits._
    val a = RowExec.withDenseSeq((0L until 9L).map(i => (i * 10, "A")).toDF("v", "tag"),
      Seq(col("v")))
    val b = RowExec.withDenseSeq((0L until 3L).map(i => (i * 10 + 5, "B")).toDF("v", "tag"),
      Seq(col("v")))
    val got = Sampling.interleave(a, b, 3, 1).collect()
      .map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    // cycle of 4: positions 0,1,2 from A; 3 from B
    assert(got.map(_._2).toSeq ==
      Seq("A", "A", "A", "B", "A", "A", "A", "B", "A", "A", "A", "B"))
    // seqs are unique and per-side order equals input order
    assert(got.map(_._1).distinct.length == got.length)
    val aOrder = got.filter(_._2 == "A").map(_._1)
    assert(aOrder.sameElements(aOrder.sorted))
  }

  test("shuffleOrder: dense permutation matching the local sort; seed changes the order") {
    import spark.implicits._
    val ids = (0L until 257L) // odd size exercises partition-boundary offsets
    val df = ids.toDF("doc_id")
    def run(seed: Long): Seq[(Long, Long)] =
      Sampling.shuffleOrder(df, "doc_id", seed).collect()
        .map(r => (r.getAs[Long]("new_seq"), r.getAs[Long]("doc_id"))).toSeq.sortBy(_._1)
    val s3 = run(3L)
    // dense 0..n-1 ordinals over exactly the input ids
    assert(s3.map(_._1) == (0L until 257L))
    assert(s3.map(_._2).sorted == ids)
    // agrees with the local reference sort by the same key
    def key(seed: Long)(id: Long): Long = {
      val p = graft.operators.TextOps.HashMod
      val a = (Sampling.ScatterA * (2 * seed + 1)) % p
      val b = (104729L * (seed + 1)) % p
      ((id % p) * a + b) % p
    }
    assert(s3.map(_._2) == ids.sortBy(key(3L)))
    // reproducible; a different seed produces a different permutation
    assert(run(3L) == s3)
    assert(run(4L).map(_._2) != s3.map(_._2))
  }

  test("mixWeights: hand computation; alpha < 1 upsamples the small source") {
    import spark.implicits._
    // source a: 90 tokens, b: 10 → shares 0.9/0.1
    val docs = Seq(("a", 90L), ("b", 10L)).toDF("source", "tok")
    val got = Sampling.mixWeights(docs, "source", $"tok", 0.5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def sMicro(share: Double) = math.floor(math.pow(share, 0.5) * 1e6 + 0.5).toLong
    val (sa, sb) = (sMicro(0.9), sMicro(0.1))
    assert(got("a") == ((90L, sa, sa * 1000000L / (sa + sb))), s"got ${got("a")}")
    assert(got("b") == ((10L, sb, sb * 1000000L / (sa + sb))), s"got ${got("b")}")
    // temperature property: the 10 %-share source gets > 10 % weight,
    // the big source < 90 %, order preserved
    assert(got("b")._3 > 100000L && got("a")._3 < 900000L && got("a")._3 > got("b")._3)
    // weights sum to ≤ 1e6 (integer-division remainder documented)
    assert(got.values.map(_._3).sum <= 1000000L)
  }

  test("weightedSample: sequential-Poisson priorities are u/w exactly; k smallest win; zero weight raises") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, 10L + i % 7)).toDF("doc_id", "w")
    val got = Sampling.weightedSample(df, "doc_id", $"w", 20)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 20)
    // replicate the priority arithmetic driver-side
    def prio(id: Long, w: Long): Long =
      ((id * Sampling.ScatterA) % operators.TextOps.HashMod) * 1000000L / w
    val want = (1L to 200L).map(i => (i, 10L + i % 7))
      .map { case (i, w) => (i, w, prio(i, w)) }
      .sortBy(t => (t._3, t._1)).take(20)
    assert(got.sortBy(t => (t._3, t._1)) == want, s"got $got")
    // weighting property: the selected set's mean weight exceeds the
    // population mean (heavier rows are preferred)
    val popMean = (1L to 200L).map(i => 10L + i % 7).sum.toDouble / 200
    val selMean = got.map(_._2).sum.toDouble / got.size
    assert(selMean > popMean, s"sel $selMean pop $popMean")
    val e = intercept[Exception] {
      Seq((1L, 0L)).toDF("doc_id", "w")
        .transform(Sampling.weightedSample(_, "doc_id", $"w", 1)).collect()
    }
    assert(e.getMessage.contains("non-positive weight"))
  }

  test("qualityCalibrate: within-stratum per-mille percentiles; singleton stratum calibrates to 0") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L),
      ("b", 4L, 99L)
    ).toDF("src", "id", "score")
    val got = Sampling.qualityCalibrate(df, "src", "id", $"score")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pct_mille")).toMap
    // stratum a, n=3: ranks 1,2,3 → (rk-1)*1000 div 2 = 0, 500, 1000
    assert(got == Map(1L -> 0L, 3L -> 500L, 2L -> 1000L, 4L -> 0L), s"got $got")
  }

  test("selectionCurve: exact cross-multiply cutoffs; zero-denominator rows never pass") {
    import spark.implicits._
    val scored = Seq((1L, -10L, 2L), (2L, -6L, 2L), (3L, -9L, 3L), (4L, 0L, 0L))
      .toDF("id", "num", "den")
    // per-unit scores: id1 → -5, id2 → -3, id3 → -3; id4 has den = 0
    // and must be excluded at EVERY threshold, even t where 0 >= t*0
    val got = Sampling.selectionCurve(scored, "num", "den", Seq(-5L, -4L, -3L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((-5L, 3L, 7L), (-4L, 2L, 5L), (-3L, 2L, 5L)), s"got $got")
    // empty scored set: one ZERO row per threshold (never NULL sums,
    // never zero rows — the oracle's threshold-side LEFT JOIN agrees)
    val empty = Sampling.selectionCurve(
      Seq.empty[(Long, Long, Long)].toDF("id", "num", "den"),
      "num", "den", Seq(-5L, -3L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(empty == Seq((-5L, 0L, 0L), (-3L, 0L, 0L)), s"got $empty")
    // duplicate thresholds would alias agg columns — must fail loudly
    intercept[IllegalArgumentException] {
      Sampling.selectionCurve(scored, "num", "den", Seq(-3L, -3L))
    }
  }

  test("mixRebalance: binding source keeps ~everything, others downsample to the temperature target") {
    import spark.implicits._
    // two sources 90/10 at alpha=0.5: targets ~ sqrt shares; the SMALL
    // source is binding (its share must RISE), so its rate ≈ 1e6
    val docs = Seq(("a", 90L), ("b", 10L)).toDF("source", "tok")
    val got = Sampling.mixRebalance(docs, "source", $"tok", 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (na, wa, ta, ra) = got("a")
    val (nb, wb, tb, rb) = got("b")
    assert(na == 90L && nb == 10L)
    // replicate the arithmetic
    val m = math.min(na * 1000000L / wa, nb * 1000000L / wb)
    assert(ta == m * wa / 1000000L && tb == m * wb / 1000000L, s"got $got")
    assert(ra == ta * 1000000L / na && rb == tb * 1000000L / nb)
    // binding source (b) runs at ~full rate; the heavy source downsamples
    assert(rb > 990000L, s"binding rate $rb")
    assert(ra < rb, s"got $got")
    // realized mix matches the target within integer-division slack
    assert(math.abs(ta * 1000000L / (ta + tb) - wa * 1000000L / (wa + wb)) < 20000L)
  }
}
