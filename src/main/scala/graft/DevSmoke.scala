package graft

import org.apache.spark.sql.SparkSession
import graft.core._

/** Manual end-to-end smoke drive of the distributed ordered-exec paths
  * (scanCombine prefix-combine, FoldSink combine path) through the public
  * API. Run: sbt "runMain graft.DevSmoke".
  */
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // README flagship: sourceList [1..10] .| scan (+) 0 .| sinkList
    val src = Sources.fromSeq(spark, (1 to 10).map(_.toLong))
    val scanned = src |> Pipes.scanCombine(0L)((b: Long, a: Long) => b + a)(_ + _)
    val got = scanned.into(Sinks.sinkList)
    println(s"SCAN RESULT: $got")
    assert(got == List(1L, 3, 6, 10, 15, 21, 28, 36, 45, 55), s"scan mismatch: $got")

    // distributed fold (combine path) over 100k elements, 8 partitions
    val big = Sources.fromSeq(spark, (1L to 100000L))
    val sum = big.into(Sinks.foldlCombine(0L)((b: Long, a: Long) => b + a)(_ + _))
    println(s"FOLD RESULT: $sum")
    assert(sum == 5000050000L, s"fold mismatch: $sum")

    // non-commutative combine: string concat in order, across partitions
    val sSrc = Sources.fromSeq(spark, (1 to 26).map(i => ('a' + i - 1).toChar.toString))
    val cat = sSrc.into(Sinks.foldlCombine("")((b: String, a: String) => b + a)(_ + _))
    println(s"CONCAT RESULT: $cat")
    assert(cat == "abcdefghijklmnopqrstuvwxyz", s"concat mismatch: $cat")

    // probe: empty stream through both distributed paths
    val empty = Sources.fromSeq(spark, Seq.empty[Long])
    val emptyScan = (empty |> Pipes.scanCombine(0L)((b: Long, a: Long) => b + a)(_ + _)).into(Sinks.sinkList)
    val emptyFold = empty.into(Sinks.foldlCombine(0L)((b: Long, a: Long) => b + a)(_ + _))
    println(s"EMPTY RESULT: scan=$emptyScan fold=$emptyFold")
    assert(emptyScan == Nil && emptyFold == 0L, s"empty mismatch: $emptyScan / $emptyFold")

    // driver smoke contract: entry() must return rows > 0 on sf0.001
    val entryRows = SparkEntry.entry(spark).count()
    println(s"ENTRY RESULT: $entryRows rows")
    assert(entryRows > 0, "entry() returned no rows")

    println("DEVSMOKE OK")
    spark.stop()
  }
}
