package graft

import org.apache.spark.sql.functions._

import graft.operators.{ColOps, Layout}

/** Physical-layout maintenance: the properties the oracle can't see.
  * q_compact / q_range_layout prove CONTENT identity; these assert the
  * layout itself — file counts actually collapse, range files are
  * actually disjoint — i.e. the maintenance did its job, not just
  * preserved rows.
  */
class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("compactParquet: 64 tiny files collapse to the size-targeted count, rows preserved") {
    val base = SparkEntry.stagedCompacted(spark, dir)
    val small = base.resolve("small").toString
    val compacted = base.resolve("compacted").toString
    val before = Layout.dataFiles(spark, small)
    val after = Layout.dataFiles(spark, compacted)
    assert(before == 64, s"fixture should stage 64 small files, got $before")
    // bytes/target sizing: quarter-of-input target → single-digit files
    assert(after >= 1 && after <= 8, s"compaction left $after files")
    assert(spark.read.parquet(compacted).count() ==
      spark.read.parquet(small).count())
  }

  test("compactParquet: file count tracks the byte target (half target -> about twice the files)") {
    val base = SparkEntry.stagedCompacted(spark, dir)
    val small = base.resolve("small").toString
    val bytes = Layout.dataBytes(spark, small)
    val out = java.nio.file.Files.createTempDirectory("graft_compact_half_").toString
    Layout.compactParquet(spark, small, out, targetBytes = math.max(1L, bytes / 8))
    val n = Layout.dataFiles(spark, out)
    assert(n >= 6 && n <= 12, s"bytes/8 target should give ~8 files, got $n")
  }

  test("rangeLayout: every output file owns a DISJOINT n_chars range") {
    val laid = SparkEntry.stagedRangeLayout(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(laid.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(laid.toString)))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
    assert(files.length >= 2, s"range layout produced ${files.length} files")
    // per-file (min, max) of the layout key, read file-by-file
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("n_chars")), max(col("n_chars"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2,
          s"file ranges overlap: [..,$hi1] vs [$lo2,..] in $ranges")
      case _ => ()
    }
  }

  test("morton: bit-exact against a reference interleave; preserves 2-D locality") {
    import spark.implicits._
    def refMorton(x: Long, y: Long): Long = {
      def spread(v: Long): Long =
        (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).sum
      spread(x & 0xFFFF) | (spread(y & 0xFFFF) << 1)
    }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L)) // >16-bit x masks
    val got = pts.toDF("x", "y")
      .select(Layout.morton(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == pts.map { case (x, y) => refMorton(x, y) }, s"got $got")
  }

  test("zorderLayout: every output file owns a DISJOINT z-range (staged events layout)") {
    val laid = SparkEntry.stagedZorderLayout(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(laid.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(laid.toString)))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
    assert(files.length >= 2, s"zorder layout produced ${files.length} files")
    val stats = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("zval")), max(col("zval"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    stats.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"z-ranges overlap: $stats")
      case _ => ()
    }
  }

  test("zorderLayout: BOTH dimensions gain per-file locality on a 64x64 grid") {
    import spark.implicits._
    // the staged events fixture has too few users at this sf to show
    // spans; the property is asserted on a full 2-D grid — a contiguous
    // z-interval of 1/16 of a 64×64 space confines both coordinates
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("graft_zgrid_")
    val laid = Layout.zorderLayout(grid, out.toString, 16, "x", "y")
    assert(laid.count() == 64L * 64L) // content preserved
    val fs = new org.apache.hadoop.fs.Path(out.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(out.toString)))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
    assert(files.length >= 8, s"grid layout produced ${files.length} files")
    def medianSpan(c: String): Long = {
      val spans = files.map { f =>
        val r = spark.read.parquet(f).agg(max(col(c)) - min(col(c))).collect()(0)
        r.getLong(0)
      }.sorted
      spans(spans.length / 2)
    }
    // a 1-D range layout on x would give y-span 63 in EVERY file; the
    // z-layout confines the median file to well under half of each axis
    assert(medianSpan("x") <= 31, s"x span ${medianSpan("x")}")
    assert(medianSpan("y") <= 31, s"y span ${medianSpan("y")}")
  }

  test("quantileBins: equal-population bins, exact boundaries, no Window in the plan") {
    import spark.implicits._
    // 40 rows, values 0..39 with id = value → 4 bins of exactly 10
    val df = (0L until 40L).map(i => (i, i)).toDF("v", "id")
    val got = ColOps.quantileBins(df, "v", "id", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 10L, 0L, 9L), (1L, 10L, 10L, 19L),
      (2L, 10L, 20L, 29L), (3L, 10L, 30L, 39L)), s"got $got")
    // the scale property: no Window operator anywhere (ntile's global
    // sort is exactly what this op exists to avoid)
    val plan = ColOps.quantileBins(df, "v", "id", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"quantileBins planned a window:\n$plan")
  }

  test("quantileBins: ragged split (n not divisible by bins) floors like the oracle") {
    import spark.implicits._
    // 7 rows into 3 bins: rank*3 div 7 → sizes 3,2,2 (floor arithmetic)
    val df = (0L until 7L).map(i => (i * 5, i)).toDF("v", "id")
    val got = ColOps.quantileBins(df, "v", "id", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 3L), (1L, 2L), (2L, 2L)), s"got $got")
  }

  test("partitionedLayout: content round-trips and a partition predicate prunes to its directory") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_hive_test_").toString
    val df = Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L),
      (4L, "fr", 40L), (5L, "de", 50L)).toDF("id", "lang", "n")
    val back = Layout.partitionedLayout(df, tmp, "lang")
    // content identity (partition col values come back from dir names)
    val got = back.select("id", "lang", "n").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L),
      (4L, "fr", 40L), (5L, "de", 50L)), s"got $got")
    // one directory per value
    val dirs = new java.io.File(tmp).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("lang=de", "lang=en", "lang=fr"), s"dirs $dirs")
    // directory elimination: the lang predicate must plan as a
    // PartitionFilter on the scan (pruned before any file is opened),
    // not a post-scan data filter — inputFiles can't show this (it
    // lists the unpruned relation), the scan node can
    val p = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]* = en\\)\\].*"),
      s"lang predicate did not become a partition filter:\n$p")
  }
}
