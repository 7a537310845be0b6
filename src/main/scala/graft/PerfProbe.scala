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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def counts(label: String): Unit =
      println(s"COUNTS $label: jobs=${jobs.getAndSet(0)} stages=${stages.getAndSet(0)} tasks=${tasks.getAndSet(0)}")
    spark.range(100000).selectExpr("sum(id)").collect()
    counts("warmup")
    val names = sys.env.getOrElse("GRAFT_PROBE_QUERIES",
      "q_langid_train,q_langid_score").split(",").map(_.trim).filter(_.nonEmpty)
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "1").toInt
    names.foreach { n =>
      (1 to reps).foreach { i =>
        time(s"$n#$i")(SparkEntry.queries(n)(spark, dir).count())
        counts(s"$n#$i")
      }
    }
    if (sys.env.get("GRAFT_PROBE_FIT2").contains("1")) {
      val docs = ColOps.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      time("QM fit #1")(QualityModel.fit(docs, "doc_id", "text"))
      time("QM fit #2")(QualityModel.fit(docs, "doc_id", "text"))
      time("QM fit #3")(QualityModel.fit(docs, "doc_id", "text"))
    }
    spark.stop()
  }
}
