package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.core._
import graft.operators.{Layout, Sampling}
import org.apache.spark.sql.functions._

/** scalacheck property layer over the typed core algebra and the
  * engine's portable arithmetic — the collections-oracle tests in
  * OperatorSpec pin one seeded input each; these pin the LAWS on
  * generated inputs (empty, singleton, negative, duplicate-heavy),
  * which is where ordinal/boundary machinery breaks first.
  *
  * Each generated case runs real Spark jobs, so sizes and case counts
  * are deliberately small (the laws don't need volume — the fixtures
  * in GoldenSpec/CORRECTNESS cover scale).
  */
class PropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(12)
    .withInitialSeed(org.scalacheck.rng.Seed(77L))

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: $res")
  }

  private val smallInts: Gen[List[Int]] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000, 1000)))

  private def src(ys: Seq[Int]): SStream[Int] = Sources.fromSeq(spark, ys)
  private def run[B](s: SStream[B]): List[B] = s.into(Sinks.sinkList[B])

  test("scan law: distributed combine-carry == scanLeft tail, any input") {
    check("scan", Prop.forAll(smallInts) { ys =>
      run(src(ys) |> Pipes.scan[Int, Long](0L)((b, a) => b + a)) ==
        ys.scanLeft(0L)(_ + _).tail
    })
  }

  test("pairs law: boundary exchange == zip with tail, any input") {
    check("pairs", Prop.forAll(smallInts) { ys =>
      run(src(ys) |> Pipes.pairs[Int]) == ys.zip(ys.drop(1))
    })
  }

  test("take/drop partition law: take n ++ drop n == identity, any n") {
    val gen = for {
      ys <- smallInts
      n <- Gen.chooseNum(0L, 70L)
    } yield (ys, n)
    check("takeDrop", Prop.forAll(gen) { case (ys, n) =>
      val t = run(src(ys) |> Pipes.take[Int](n))
      val d = run(src(ys) |> Pipes.suffixAfter(Pipes.drop[Int](n)))
      t ++ d == ys && t == ys.take(n.toInt)
    })
  }

  test("ZipSink Alternative laws: empty is identity, race is first-to-finish, ties left") {
    // reference Data/Conduino.hs:675-687: `empty` (the never-finishing
    // sink) is the identity of `<|>` — it cannot win a race from EITHER
    // side — and a race of two finite prefixes returns whichever
    // terminates on the earlier seq, left-biased when both terminate on
    // the same element (the n1 == n2 draw hits the tie branch).
    val gen = for {
      ys <- smallInts
      n1 <- Gen.chooseNum(0, 70)
      n2 <- Gen.chooseNum(0, 70)
    } yield (ys, n1, n2)
    check("altLaws", Prop.forAll(gen) { case (ys, n1, n2) =>
      val s1 = Sinks.takeList[Int](n1)
      val s2 = Sinks.takeList[Int](n2)
      // collections oracle: take-n finishes on element n (never, if the
      // stream is shorter — then the race is a tie and goes left)
      def fin(n: Int): Long =
        if (n <= 0) Long.MinValue
        else if (ys.length >= n) n.toLong else Long.MaxValue
      val expected = if (fin(n1) <= fin(n2)) ys.take(n1) else ys.take(n2)
      src(ys).into(Sinks.alt(s1, s2)) == expected &&
        src(ys).into(Sinks.alt(Sinks.never[Int, List[Int]], s2)) == ys.take(n2) &&
        src(ys).into(Sinks.alt(s1, Sinks.never[Int, List[Int]])) == ys.take(n1)
    })
  }

  test("ZipSink Applicative law: one-scan product == pair of independent folds") {
    // reference Data/Conduino.hs:654-660: zipSink feeds ONE stream to
    // both folds; its result must equal running each fold alone.
    check("zipSink", Prop.forAll(smallInts) { ys =>
      val sum = Sinks.foldl[Int, Long](0L)(_ + _)
      val cnt = Sinks.foldl[Int, Long](0L)((b, _) => b + 1)
      src(ys).into(sum.zip(cnt)) == ((ys.map(_.toLong).sum, ys.length.toLong)) &&
        src(ys).into(sum.zipWith(cnt)((a, b) => a * 1000 + b)) ==
          ys.map(_.toLong).sum * 1000 + ys.length
    })
  }

  test("chunkByTokens conservation law: chunks partition the corpus exactly, any input") {
    import spark.implicits._
    import graft.operators.TextOps
    val genDocs: Gen[List[String]] =
      Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n,
        Gen.chooseNum(0, 12).flatMap(k => Gen.listOfN(k,
          Gen.chooseNum(1, 6).flatMap(len =>
            Gen.listOfN(len, Gen.alphaLowerChar).map(_.mkString)))
          .map(_.mkString(" ")))))
    val emptyVocab = Seq.empty[(String, Long)].toDF("seq", "freq")
    check("chunkTokens", Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = TextOps.chunkByTokens(docs, "doc_id", "text", emptyVocab, 5L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // with no learned vocab every word costs its characters; the
      // chunks of a doc must partition its words and characters exactly
      val perDoc = chunks.groupBy(_._1).view.mapValues(cs =>
        (cs.map(_._3).sum, cs.map(_._4).sum)).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        if (ws.isEmpty) !perDoc.contains(i.toLong)
        else perDoc(i.toLong) == ((ws.length.toLong, ws.map(_.length.toLong).sum))
      }
    })
  }

  test("takeWhile/dropWhile cut law: first failure consumed, suffix disjoint") {
    check("whileCut", Prop.forAll(smallInts) { ys =>
      val p = (x: Int) => x >= 0
      val t = run(src(ys) |> Pipes.takeWhile[Int](p))
      val d = run(src(ys) |> Pipes.suffixAfter(Pipes.dropWhile[Int](p)))
      t == ys.takeWhile(p) &&
        d == ys.dropWhile(p).drop(1) && // reference consumes the failure
        t.size + d.size == (ys.size - (if (t.size < ys.size) 1 else 0))
    })
  }

  test("concat law: offset union == ++, any two inputs") {
    val gen = Gen.zip(smallInts, smallInts)
    check("concat", Prop.forAll(gen) { case (as, bs) =>
      run(Compose.concatSources(src(as), src(bs))) == as ++ bs
    })
  }

  test("splitExpr is a TOTAL DETERMINISTIC partition of any id set") {
    import spark.implicits._
    val cuts = Seq("a" -> 300, "b" -> 700, "c" -> 1000)
    val genIds = Gen.chooseNum(1, 50).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1000000L)))
    check("split", Prop.forAll(genIds) { ids =>
      val out = ids.distinct.toDF("id")
        .select(col("id"), Sampling.splitExpr(col("id"), cuts).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // total (every id labeled), deterministic (pure id arithmetic),
      // and consistent with the driver-side replica
      def replica(id: Long): String = {
        val b = ((id * Sampling.ScatterA) % graft.operators.TextOps.HashMod) % 1000
        if (b < 300) "a" else if (b < 700) "b" else "c"
      }
      out.size == ids.distinct.size && out.forall { case (id, s) => s == replica(id) }
    })
  }

  test("morton round-trip: de-interleaving the z-value recovers both keys") {
    import spark.implicits._
    val genPts = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L))))
    def unspread(z: Long): Long =
      (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum
    check("morton", Prop.forAll(genPts) { pts =>
      val zs = pts.toDF("x", "y")
        .select(col("x"), col("y"), Layout.morton(col("x"), col("y")).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      zs.forall { case (x, y, z) => unspread(z) == x && unspread(z >> 1) == y }
    })
  }

  test("interleave law: schedule positions are collision-free and order-preserving per side") {
    import spark.implicits._
    val gen = for {
      na <- Gen.chooseNum(0, 40); nb <- Gen.chooseNum(0, 40)
      wa <- Gen.chooseNum(1, 4); wb <- Gen.chooseNum(1, 4)
    } yield (na, nb, wa, wb)
    check("interleave", Prop.forAll(gen) { case (na, nb, wa, wb) =>
      val a = (0 until na).map(i => (i.toLong, s"a$i")).toDF("seq", "v")
      val b = (0 until nb).map(i => (i.toLong, s"b$i")).toDF("seq", "v")
      val out = Sampling.interleave(a, b, wa, wb)
        .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
      val seqs = out.map(_._1)
      val aOrder = out.filter(_._2.startsWith("a")).map(_._2)
      val bOrder = out.filter(_._2.startsWith("b")).map(_._2)
      seqs.distinct.length == seqs.length &&
        aOrder.sameElements((0 until na).map(i => s"a$i")) &&
        bOrder.sameElements((0 until nb).map(i => s"b$i"))
    })
  }

  test("triangle law: degree-oriented count == brute-force triple enumeration, any graph") {
    import spark.implicits._
    val graphGen: Gen[List[(Long, Long)]] =
      Gen.chooseNum(0, 20).flatMap(n =>
        Gen.listOfN(n, for {
          a <- Gen.chooseNum(0L, 8L); b <- Gen.chooseNum(0L, 8L)
        } yield (a, b)))
    check("triangles", Prop.forAll(graphGen) { es =>
      val undirected = es.filter { case (a, b) => a != b }
        .map { case (a, b) => (a min b, a max b) }.distinct.toSet
      val nodes = undirected.flatMap(e => Seq(e._1, e._2)).toList.sorted
      val brute = nodes.combinations(3).count {
        case List(x, y, z) =>
          undirected((x, y)) && undirected((y, z)) && undirected((x, z))
        case _ => false
      }
      val got = graft.operators.Graph.triangleCount(es.toDF("src", "dst"))
        .as[Long].collect().head
      got == brute.toLong
    })
  }

  test("drift law: ppm columns each sum to ~1e6 (floor slack < |bins|) and deltas to ~0") {
    import spark.implicits._
    val sideGen = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 6L)))
    check("drift", Prop.forAll(sideGen, sideGen) { (as, bs) =>
      val rows = graft.operators.Diagnostics
        .distributionDrift(as.toDF("v"), bs.toDF("v"), col("v"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      val bins = rows.length
      val sa = rows.map(_._4).sum; val sb = rows.map(_._5).sum
      val sd = rows.map(_._6).sum
      sa > 1000000L - bins && sa <= 1000000L &&
        sb > 1000000L - bins && sb <= 1000000L &&
        math.abs(sd) < bins
    })
  }
}
