package graft

import graft.core._
import graft.streaming._

/** The reference's incremental contract (`feedPipe`/`squeezePipe`,
  * `Data/Conduino.hs:229-296`): feeding the same inputs quantum by
  * quantum must produce the same outputs as the batch run (SURVEY.md
  * §5.4), with outputs drained per quantum.
  */
class StreamingSpec extends SparkSpec {

  test("incremental map+filter ≡ batch (outputs drained per quantum)") {
    val pipe = Pipes.map[Int, Int](_ * 2) |> Pipes.filter[Int](_ % 3 != 0)
    val f = Incremental.open(spark, pipe, "inc_map_filter")
    try {
      val out1 = f.feed(Seq(1, 2, 3))       // 2, 4 (6 filtered)
      val out2 = f.feed(Seq(4, 5))          // 8, 10
      val out3 = f.feed(Seq.empty)          // nothing
      val out4 = f.feed(Seq(6, 7))          // 14 (12 filtered)
      val batch = (Sources.fromSeq(spark, Seq(1, 2, 3, 4, 5, 6, 7))
        |> pipe).into(Sinks.sinkList)
      assert(out1 == Seq(2, 4) && out2 == Seq(8, 10) && out3.isEmpty && out4 == Seq(14))
      assert((out1 ++ out2 ++ out3 ++ out4) == batch)
    } finally f.stop()
  }

  test("incremental concatMap ≡ batch") {
    val pipe = Pipes.concatMap[Int, Int](x => Seq.fill(x % 3)(x))
    val f = Incremental.open(spark, pipe, "inc_concat")
    try {
      val got = Seq(Seq(1, 2), Seq(3, 4), Seq(5)).flatMap(q => f.feed(q))
      val batch = (Sources.fromSeq(spark, Seq(1, 2, 3, 4, 5)) |> pipe).into(Sinks.sinkList)
      assert(got == batch)
    } finally f.stop()
  }

  test("incremental stateful scan ≡ batch scan (state carried across quanta)") {
    val inputs = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val pipe = StreamPipes.scanStateful(0)((b: Int, a: Int) => b + a)
    val f = Incremental.open(spark, pipe, "inc_scan")
    try {
      val o1 = f.feed(inputs.take(4))
      val o2 = f.feed(inputs.slice(4, 7))
      val o3 = f.feed(inputs.drop(7))
      val batch = (Sources.fromSeq(spark, inputs)
        |> Pipes.scan(0)((b: Int, a: Int) => b + a)).into(Sinks.sinkList)
      assert((o1 ++ o2 ++ o3) == batch)
      // the doc-example values, as a belt-and-braces check
      assert(batch == List(1, 3, 6, 10, 15, 21, 28, 36, 45, 55))
    } finally f.stop()
  }

  test("incremental mapAccum ≡ batch mapAccum") {
    val inputs = Seq(5, 1, 7, 2, 9)
    val f = Incremental.open(spark,
      StreamPipes.mapAccumStateful(0)((a: Int, s: Int) => (s + a, s + a)), "inc_acc")
    try {
      val got = Seq(inputs.take(2), inputs.slice(2, 4), inputs.drop(4)).flatMap(q => f.feed(q))
      val batch = (Sources.fromSeq(spark, inputs)
        |> Pipes.mapAccum(0)((a: Int, s: Int) => (s + a, s + a))).into(Sinks.sinkList)
      assert(got == batch)
    } finally f.stop()
  }

  test("squeeze with no new input yields nothing (squeezePipe contract)") {
    val f = Incremental.open(spark, Pipes.map[Int, Int](_ + 1), "inc_squeeze")
    try {
      assert(f.squeeze().isEmpty)
      assert(f.feed(Seq(1)) == Seq(2))
      assert(f.squeeze().isEmpty)
    } finally f.stop()
  }
}
