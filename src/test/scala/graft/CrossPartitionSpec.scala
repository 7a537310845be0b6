package graft

import graft.core._
import graft.operators._
import org.apache.spark.sql.functions._

/** Cross-partition stress: the distributed order schemes (prefix-combine,
  * boundary exchange, cut filters) against the list oracle on inputs
  * large enough to span every shuffle partition — the failure mode unit
  * examples can't catch (wrong carry at a partition boundary).
  */
class CrossPartitionSpec extends SparkSpec {

  private val N = 50000
  private val rnd = new scala.util.Random(7)
  private val xs: Vector[Long] = Vector.fill(N)(rnd.nextInt(1000).toLong - 500)

  private lazy val src: SStream[Long] = Sources.fromSeq(spark, xs)

  test("scanCombine across partitions == sequential scanLeft") {
    val got = (src |> Pipes.scanCombine(0L)((b: Long, a: Long) => b + a)(_ + _))
      .into(Sinks.sinkList)
    assert(got == xs.scanLeft(0L)(_ + _).tail.toList)
  }

  test("pairs across partitions == xs.zip(xs.tail)") {
    val got = (src |> Pipes.pairs[Long]).into(Sinks.sinkList)
    assert(got == xs.zip(xs.tail).toList)
  }

  test("consecutive across partitions == sliding with leading partials + final") {
    val n = 4
    val got = (src |> Pipes.consecutive[Long](n)).into(Sinks.sinkList)
    val expect = (0 to N).map(i => xs.slice(math.max(0, i - n), i).toSeq).toList
    assert(got == expect)
  }

  test("take/drop cuts land exactly at arbitrary positions") {
    for (k <- Seq(1L, 12499L, 25000L, 49999L, 50000L)) {
      assert((src |> Pipes.take[Long](k)).into(Sinks.count) == k.min(N))
      assert((src |> Pipes.suffixAfter(Pipes.drop[Long](k))).into(Sinks.count) == (N - k).max(0))
    }
  }

  test("columnar running sum across partitions == prefix sums") {
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("seq", "v")
      .repartition(8)
    val got = RowExec.runningSumLong(df, col("v"), "rs")
      .orderBy("seq").select("rs").collect().map(_.getLong(0)).toList
    assert(got == xs.scanLeft(0L)(_ + _).tail.toList)
  }

  test("foldr on a large reversed stream == foldRight") {
    // order-sensitive non-commutative fold: subtraction
    val small = xs.take(5000)
    val got = Sources.fromSeq(spark, small)
      .into(Sinks.foldr(0L)((a: Long, b: Long) => a - b))
    assert(got == small.foldRight(0L)(_ - _))
  }

  test("foldrCombine across partitions == foldRight (non-commutative affine composition, N=50k)") {
    // element v ↦ affine map x → αx+β (mod M); foldr composes
    // g_first ∘ … ∘ g_last — composition is associative with identity
    // but NOT commutative, so any partition-order slip is caught
    val M = 1000000007L
    type Aff = (Long, Long)
    val id: Aff = (1L, 0L)
    def mk(v: Long): Aff = ((v % 97) + 2, (v % 1003) + 1)
    def compose(f: Aff, g: Aff): Aff = ((f._1 * g._1) % M, (f._1 * g._2 + f._2) % M)
    val got = src.into(
      Sinks.foldrCombine(id)((v: Long, acc: Aff) => compose(mk(v), acc))(compose))
    assert(got == xs.foldRight(id)((v, acc) => compose(mk(v), acc)))
  }

  test("foldrCombine reverse-concat == sequential foldr (flipped combine)") {
    val strs = (0 until 2000).map(i => ('a' + i % 26).toChar.toString)
    val got = Sources.fromSeq(spark, strs)
      .into(Sinks.foldrCombine("")((x: String, acc: String) => acc + x)((a, b) => b + a))
    assert(got == strs.foldRight("")((x, acc) => acc + x))
  }
}
