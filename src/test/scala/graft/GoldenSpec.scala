package graft

import graft.core._

/** The reference's executable doc examples (SURVEY.md §5) — golden
  * input→output pairs, each cited to /root/reference.
  */
class GoldenSpec extends SparkSpec {

  private def src(xs: Seq[Int]): SStream[Int] =
    Sources.fromSeq(spark, xs)

  // README.md:17-20; Data/Conduino.hs:35-38; Combinators.hs:357-361
  test("scan (+) 0 over [1..10] == running sums") {
    val got = (src(1 to 10) |> Pipes.scan(0)((b: Int, a: Int) => b + a))
      .into(Sinks.sinkList)
    assert(got == List(1, 3, 6, 10, 15, 21, 28, 36, 45, 55))
  }

  test("scanCombine matches sequential scan") {
    val got = (src(1 to 10) |> Pipes.scanCombine(0)((b: Int, a: Int) => b + a)(_ + _))
      .into(Sinks.sinkList)
    assert(got == List(1, 3, 6, 10, 15, 21, 28, 36, 45, 55))
  }

  // Combinators.hs:153-166
  test("iterate succ 0 .| take 5 == [1..5]") {
    val it = Sources.iterate(spark, (x: Int) => x + 1, 0, 100)
    val got = (it |> Pipes.take[Int](5)).into(Sinks.sinkList)
    assert(got == List(1, 2, 3, 4, 5))
  }

  // Combinators.hs:375-378
  test("pairs over [1..5] == [(1,2),(2,3),(3,4),(4,5)]") {
    val got = (src(1 to 5) |> Pipes.pairs[Int]).into(Sinks.sinkList)
    assert(got == List((1, 2), (2, 3), (3, 4), (4, 5)))
  }

  // Combinators.hs:392-403 — L+1 windows, starting empty, window BEFORE
  // each element plus one final window.
  test("consecutive 3 over [1..6] == leading partial windows + final") {
    val got = (src(1 to 6) |> Pipes.consecutive[Int](3)).into(Sinks.sinkList)
    assert(got == List(
      Seq(), Seq(1), Seq(1, 2), Seq(1, 2, 3), Seq(2, 3, 4), Seq(3, 4, 5), Seq(4, 5, 6)))
  }

  // Combinators.hs:398-403 — filtered-full variant
  test("consecutive 3 .| filter(size==3) == full windows only") {
    val got = (src(1 to 6) |> Pipes.consecutive[Int](3)
      |> Pipes.filter[Seq[Int]](_.size == 3)).into(Sinks.sinkList)
    assert(got == List(Seq(1, 2, 3), Seq(2, 3, 4), Seq(3, 4, 5), Seq(4, 5, 6)))
  }

  // Combinators.hs:417-422 — monadic sequencing takeover
  test("(take 3 .| map (*2)) >> map negate over [1..8]") {
    val p = Pipes.take[Int](3).thenPipe(Pipes.map[Int, Int](_ * 2))
      .andThen(Pipes.map[Int, Int](-_))
    val got = (src(1 to 8) |> p).into(Sinks.sinkList)
    assert(got == List(2, 4, 6, -4, -5, -6, -7, -8))
  }

  // Combinators.hs:525-527
  test("drop 3 >> sinkList over [1..8] == [4..8]") {
    val p = Pipes.suffixAfter(Pipes.drop[Int](3))
    val got = (src(1 to 8) |> p).into(Sinks.sinkList)
    assert(got == List(4, 5, 6, 7, 8))
  }

  // Combinators.hs:500-506 — foldMap recipes
  test("foldMap sum and maximum") {
    val s = src(Seq(3, 1, 4, 1, 5, 9, 2, 6))
    assert(s.into(Sinks.foldMap[Int, Int](identity, 0)(_ + _)) == 31)
    assert(s.into(Sinks.foldMap[Int, Int](identity, Int.MinValue)(math.max)) == 9)
  }

  // nested monadic sequencing — the ADVICE bit-62 regression case
  test("nested andThen keeps global order") {
    // (take 2 >> (take 2 >> id)) over [1..8]: first 2 as-is, then next 2
    // negated, then rest +100
    val inner = Pipes.take[Int](2).thenPipe(Pipes.map[Int, Int](-_))
      .andThen(Pipes.map[Int, Int](_ + 100))
    val p = Pipes.take[Int](2).andThen(inner)
    val got = (src(1 to 8) |> p).into(Sinks.sinkList)
    assert(got == List(1, 2, -3, -4, 105, 106, 107, 108))
  }
}
