package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Dedup edge cases the parquet fixtures can't reach (their docs are all
  * ≥ 3 words): short documents must not enter the LSH bands.
  */
class DedupSpec extends SparkSpec {

  test("short docs (<3 words) get no band buckets and no candidate pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "x"), (4L, ""),
      (5L, "alpha beta gamma delta"), (6L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    // short docs have empty shingle sets → excluded from bands
    val bk = Dedup.bandBuckets(sig)
    assert(bk.filter(col("doc_id") < 5).count() == 0)
    // only the genuinely identical long docs pair up; no null jaccard rows
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 6L)))
    assert(pairs.forall(!_.isNullAt(2)))
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("exact dedup groups identical texts") {
    import spark.implicits._
    val docs = Seq((10L, "same"), (11L, "same"), (12L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 2L), (12L, 1L)))
  }

  test("dedupRates: cross-source copies charge every source except the keeper's") {
    import spark.implicits._
    val docs = Seq((1L, "x", "s1"), (2L, "y", "s1"),
      (3L, "x", "s2"), (4L, "z", "s2")).toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup.dedupRates(docs, "doc_id", "text", "source")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 3 copies doc 1's text; the keeper (min id) lives in s1, so s2
    // carries the redundancy: 1 of its 2 docs → 500000 ppm exactly
    assert(got("s1") == ((2L, 2L, 0L)), s"got $got")
    assert(got("s2") == ((2L, 1L, 500000L)), s"got $got")
  }

  test("viral band bucket (> cap) drops out of candidacy; survivors bounded by cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val boiler = "alpha beta gamma delta epsilon"
    val docs = ((0L until 30L).map(i => (i, boiler)) ++
      Seq((100L, "zeta eta theta iota kappa"), (101L, "zeta eta theta iota kappa")))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text").localCheckpoint()
    // cap=10: the 30-identical cluster floods every one of its buckets past
    // the cap; the small duplicate pair survives untouched
    val maxPop = Dedup.cappedBandBuckets(sig, cap = 10)
      .groupBy("bucket").count()
      .agg(coalesce(max("count"), lit(0L))).head().getLong(0)
    assert(maxPop <= 10)
    val pairs = Dedup.candidatePairs(sig, cap = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L)))
    // default cap keeps the cluster: all C(30,2) pairs plus the small one
    assert(Dedup.candidatePairs(sig).count() == 30L * 29 / 2 + 1)
  }

  test("newAgainstCorpus: exact-duplicate incoming rows are dropped, fresh ones kept") {
    import spark.implicits._
    val corpus = Seq((1L, "the quick brown fox"), (2L, "hello world"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "hello world"),          // exact dup of corpus doc 2 → dropped
      (11L, "hello  world"),         // different text (two spaces) → kept
      (12L, "completely new doc")    // fresh → kept
    ).toDF("doc_id", "text")
    val kept = Dedup.newAgainstCorpus(incoming, corpus, "text")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(11L, 12L), s"kept ${kept.toList}")
  }

  test("contaminatedBy: only docs sharing a word-3-gram with the benchmark are flagged") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "x y alpha beta gamma z"),   // shares (alpha,beta,gamma) → flagged
      (2L, "alpha beta x gamma delta"), // no shared 3-gram → clean
      (3L, "beta gamma delta w"),       // shares (beta,gamma,delta) → flagged
      (4L, "totally unrelated text here")
    ).toDF("doc_id", "text")
    val flagged = Dedup.contaminatedBy(docs, bench, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted
    assert(flagged.toSeq == Seq(1L, 3L), s"flagged ${flagged.toList}")
  }

  test("contaminationSpans: maximal runs extend beyond n, islands split at gaps, short docs are safe") {
    import spark.implicits._
    val bench = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val docs = Seq(
      // shares the full 8-token run starting at doc pos 2 / bench pos 0
      (1L, "x y a b c d e f g h z"),
      // two SEPARATE 4-runs against the same bench doc: (a b c d)@0 and
      // (e f g h)@6 — the q gap must split them into two islands
      (2L, "a b c d q q e f g h"),
      // only a 3-token overlap (c d e): below n=4, no span
      (3L, "c d e zz ww vv uu tt"),
      // shorter than n words: no shingles, no crash
      (4L, "a b c")
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationSpans(docs, bench, "doc_id", "text", n = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == Seq(
      (1L, 100L, 2L, 0L, 8L),
      (2L, 100L, 0L, 0L, 4L),
      (2L, 100L, 6L, 4L, 4L)), s"got ${got.toList}")
  }

  test("selfSpans: cross-doc passage at different offsets, pair orientation, viral cap") {
    import spark.implicits._
    val docs = Seq(
      // docs 1 and 2 share a 6-token passage at DIFFERENT offsets — the
      // case doc-level MinHash and aligned chunk hashing both miss
      (1L, "p q the quick brown fox jumps high r s"),
      (2L, "the quick brown fox jumps high z1 z2 z3 z4"),
      // doc 3 shares nothing long enough (3-token overlap < n=4)
      (3L, "quick brown fox t1 t2 t3 t4 t5"),
      // shorter than n: no shingles, no crash
      (4L, "a b c")
    ).toDF("doc_id", "text")
    val got = Dedup.selfSpans(docs, "doc_id", "text", n = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // exactly one maximal span, oriented doc_a < doc_b: doc 1 offset 2,
    // doc 2 offset 0, length 6
    assert(got.toSeq == Seq((1L, 2L, 2L, 0L, 6L)), s"got ${got.toList}")
    // viral cap: the same passage planted in MORE docs than the cap
    // admits is boilerplate — its shingles drop out of candidacy and no
    // pairs survive (chunk-level dedup owns ubiquitous passages)
    val viral = (0L until 12L).map(i =>
      (i, s"the quick brown fox jumps high tail$i")).toDF("doc_id", "text")
    assert(Dedup.selfSpans(viral, "doc_id", "text", n = 4, cap = 5).count() == 0L)
    // and with a cap that admits them, all 12-choose-2 pairs span
    assert(Dedup.selfSpans(viral, "doc_id", "text", n = 4, cap = 64).count() == 66L)
  }

  test("selfDedupCut: keep-first — the later doc loses the shared passage, the first keeps it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q the quick brown fox jumps high r s"),
      (2L, "the quick brown fox jumps high z1 z2 z3 z4"),
      (3L, "n1 n2 n3 n4 n5 n6 n7 n8")
    ).toDF("doc_id", "text")
    val got = Dedup.selfDedupCut(docs, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 1 (first occurrence) keeps its copy untouched
    assert(got(1L) == (("p q the quick brown fox jumps high r s", 0L)))
    // doc 2 loses exactly the 6-token shared passage
    assert(got(2L) == (("z1 z2 z3 z4", 6L)), got(2L).toString)
    // untouched doc passes whole
    assert(got(3L) == (("n1 n2 n3 n4 n5 n6 n7 n8", 0L)))
  }

  test("decontaminate: covered tokens excised, clean docs untouched, fully-covered doc becomes empty") {
    import spark.implicits._
    val bench = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "x y a b c d e f g h z"), // 8-run removed, edges kept
      (2L, "clean words only in here"), // untouched
      (3L, "a b c d e f g h") // fully covered → empty
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(docs, bench, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "x y z", 8L),
      (2L, "clean words only in here", 0L),
      (3L, "", 8L)), s"got ${got.toList}")
  }

  test("clustersFromPairs: a 5-chain collapses transitively (4 propagation rounds), singleton keeps itself") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("doc_id")
    // chain 1-2-3-4-5: label 1 reaches node 5 only through 4 rounds of
    // propagation; 6 is connected to nothing
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Dedup.clustersFromPairs(nodes, "doc_id", pairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 1L, false), (5L, 1L, false), (6L, 6L, true)), s"got $got")
    // fail-loud when the round bound is tighter than the diameter
    val e = intercept[IllegalArgumentException] {
      Dedup.clustersFromPairs(nodes, "doc_id", pairs, "a", "b", maxRounds = 2)
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("nearDupClusters: identical docs cluster end-to-end through the LSH pair list") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1 → J=1.0
      (3L, "completely different words here now")
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupClusters(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (2L, 1L, false), (3L, 3L, true)), s"got $got")
  }

  test("keepBest: token-richest doc represents the cluster; exact ties fall to the smallest id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // dup of 1, equal tokens → tie → 1
      (3L, "lone unrelated document stands here")
    ).toDF("doc_id", "text")
    val got = Dedup.keepBest(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 5L), (3L, 3L, 5L)), s"got $got")
  }

  test("incrementalNearDup: batch links only against the corpus index, never intra-batch") {
    import spark.implicits._
    val mk = (id: Long, words: String) => (id, words)
    val corpus = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta"),
      mk(2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      mk(10L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of corpus 1
      mk(11L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of corpus 1 AND of 10
      mk(12L, "totally unrelated words appear in this doc here")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(incoming, corpus, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("match_id"))).toSet
    // both incoming dups link to corpus doc 1; the 10-11 intra-batch pair
    // is NOT reported (the batch joins the index, not itself) and the
    // unrelated doc matches nothing
    assert(got == Set((10L, 1L), (11L, 1L)), s"got $got")
  }

  test("LSH candidate-pair recall vs exact Jaccard pairs stays above the floor (seeded near-dups)") {
    import spark.implicits._
    // 15 groups × 3 variants: each variant replaces ONE word of a 40-word
    // base, so intra-group shingle Jaccard sits in the band the 4×4 LSH
    // S-curve is built for (j ≥ ~0.7 → candidate probability ≥ ~0.66).
    // Deterministic seed — the measured recall is a fixed number; the
    // floor is asserted with headroom so a NumHashes/BandSize change that
    // genuinely destroys recall fails loudly while benign jitter cannot.
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 400).map(i => s"w$i")
    val docs = (0 until 15).flatMap { g =>
      val base = Vector.fill(40)(vocab(rnd.nextInt(vocab.size)))
      (0 until 3).map { v =>
        val words =
          if (v == 0) base
          else base.updated(rnd.nextInt(base.size), vocab(rnd.nextInt(vocab.size)))
        ((g * 3 + v).toLong, words.mkString(" "))
      }
    }
    val df = docs.toDF("doc_id", "text")
    // exact ground truth: every pair with shingle-set Jaccard ≥ 0.5
    // (brute force is fine at 45 docs — this is what LSH approximates)
    val sh = Dedup.shingleHashes(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val ids = sh.keys.toSeq.sorted
    val truth = (for {
      a <- ids; b <- ids if a < b
      uni = sh(a).union(sh(b)).size if uni > 0
      j = sh(a).intersect(sh(b)).size.toDouble / uni if j >= 0.5
    } yield (a, b)).toSet
    assert(truth.size >= 20, s"fixture too sparse: ${truth.size} true pairs")
    val cand = Dedup.candidatePairs(Dedup.minhashSignatures(df, "doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val recall = truth.intersect(cand).size.toDouble / truth.size
    info(f"pair recall $recall%.3f over ${truth.size} true pairs, ${cand.size} candidates")
    assert(recall >= 0.8,
      f"LSH pair recall $recall%.3f < 0.8 — a NumHashes/BandSize change destroyed recall")
  }

  test("simhashPairs == brute-force hamming pairs (pigeonhole recall is EXACT for <= 2)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0L until 40L).map { i =>
      // clusters of 4 share a base doc with 0-2 word substitutions →
      // guaranteed hamming-close pairs exist; across clusters vary
      val base = new scala.util.Random(i / 4).shuffle(vocab).take(12).toVector
      val v = (i % 4).toInt
      val words = (0 until v).foldLeft(base)((w, k) =>
        w.updated((i + k).toInt % w.size, vocab(rnd.nextInt(vocab.size))))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same simhashes
    val sims = Dedup.simhashDf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = sims.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(sims(a) ^ sims(b)) if h <= 2
    } yield (a, b, h.toLong)).toSet
    assert(want.nonEmpty, "fixture produced no close pairs")
    assert(got == want, s"got ${got.size} want ${want.size}; diff ${(got diff want) ++ (want diff got)}")
  }

  test("containmentPairs: embedded doc scores C(a→b)=1 while Jaccard understates") {
    import spark.implicits._
    // the long doc extends the short one by ~1/3 — inside the symmetric
    // LSH recall envelope (see scaladoc: J^4 per band), yet asymmetric
    // enough that J sits below a 0.8 dedup cut while C(a→b) = 1
    val short = (1 to 30).map(i => s"w$i").mkString(" ")
    val long  = short + " " + (100 to 110).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("cont_ab"), r.getAs[Double]("cont_ba")))
    assert(got.length == 1, s"expected the embedded pair as an LSH candidate, got ${got.toSeq}")
    val (a, b, cab, cba) = got.head
    assert((a, b) == ((1L, 2L)))
    // every shingle of the short doc appears in the long one
    assert(cab == 1.0, s"cont_ab=$cab")
    assert(cba < 0.8, s"cont_ba=$cba must reflect the uncovered suffix")
    // A ⊆ B makes Jaccard = |A|/|B| = C(b→a): the symmetric score
    // equals the WEAK direction and misses the strong one
    val j = Dedup.jaccardPairs(df, "doc_id", "text")
      .collect().head.getAs[Double]("jaccard")
    assert(j == cba && j < 0.8, s"jaccard=$j cont_ba=$cba")
  }
  test("boilerplateRatio: shared 3-gram scores, unique doc 0, short doc 0/0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown cat sleeps"),
      (3L, "the quick brown dog barks"),
      (4L, "completely different words here now"),
      (5L, "hi there") // < 3 words: no shingles, scores 0 by definition
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateRatio(docs, "doc_id", "text", 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 1-3 have 3 shingles each; only (the,quick,brown) reaches df>=3
    // -> 1 of 3 boilerplate = 333333 ppm exactly (integer div)
    Seq(1L, 2L, 3L).foreach(d => assert(got(d) == ((3L, 1L, 333333L)), s"doc $d: ${got(d)}"))
    assert(got(4L) == ((3L, 0L, 0L)))
    assert(got(5L) == ((0L, 0L, 0L)))
  }
}
