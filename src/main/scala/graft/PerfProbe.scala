package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Scratch perf probe (manual): times stages of the hot queries. */
object PerfProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = ColOps.withSeq(ColOps.table(spark, dir, "events"), col("event_id"))
      .select(col("seq"), floor(col("value") * 100 + 0.5).cast("long").as("ival"))

    time("events count")(ev.count())
    time("consecutiveDf full")(RowExec.consecutiveDf(ev, "ival", 3).count())
    time("consecutiveDf again")(RowExec.consecutiveDf(ev, "ival", 3).count())
    val sorted = ev.repartitionByRange(4, col("seq")).sortWithinPartitions(col("seq"))
    time("sort only")(sorted.count())
    time("sort+persist+count")({ val p = sorted.persist(); p.count(); p.unpersist(); () })
    time("windowed alternative")({
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("seq")).rowsBetween(-3, -1)
      ev.select(col("seq"), collect_list(col("ival")).over(w).as("window")).count()
    })
    val docs = ColOps.table(spark, dir, "documents")
    val sig = time("sig localCheckpoint")(
      Dedup.minhashSignatures(docs, "doc_id", "text").localCheckpoint())
    val pairs = time("candidatePairs")(
      { val p = Dedup.candidatePairs(sig).localCheckpoint(); println(s"PROBE pairs rows: ${p.count()}"); p })
    time("jaccard join")({
      val sa = sig.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val sb = sig.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select((size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
                 size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
        .count()
    })
    time("jaccardPairs full")(Dedup.jaccardPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
