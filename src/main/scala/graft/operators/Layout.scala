package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout maintenance for parquet corpora — the jobs a 100 TB
  * deployment schedules nightly, proven here at test scale with the
  * exact production plumbing. Extends the LLM-data family (SURVEY.md §2
  * LLM-data section); no conduino counterpart (the reference never
  * owns storage layout — but any corpus its pipelines feed does).
  *
  *  - '''Compaction''': streaming ingest (e.g. [[graft.streaming.Maintain]]
  *    upserts, per-batch appends) leaves thousands of KB-sized files;
  *    every reader then pays one task + one open per file (the
  *    "small-files problem"). Compaction rewrites a directory into
  *    size-targeted files: read → `repartition(ceil(bytes/target))` →
  *    write. Content is byte-identical (the oracle proves it) — only
  *    the file boundaries move.
  *  - '''Range layout''': `repartitionByRange(sortCols) +
  *    sortWithinPartitions` before the write gives every output file a
  *    DISJOINT key range (LayoutSpec asserts), so parquet row-group
  *    min/max stats line up with the sort key and a pushed range
  *    predicate skips whole row groups / lets a lakehouse file index
  *    skip whole files. The same rewrite is what `OPTIMIZE ... ZORDER`
  *    does for one dimension.
  *
  * Both run as plain Spark jobs over the public FileSystem API — on a
  * cluster the identical code compacts an object-store prefix.
  */
object Layout {

  /** Total byte size of the data files under `dir` (public Hadoop FS
    * API — works for any scheme the session can read).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  /** Number of data files under `dir`. */
  def dataFiles(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_"))
  }

  /** Compact the parquet directory `inDir` into `outDir` with files of
    * roughly `targetBytes` (compaction keeps content identical, so the
    * file count is sized from the INPUT's on-disk bytes — parquet in,
    * parquet out). `repartition(n)` is the right spread: round-robin
    * rows into equal files with one shuffle; `coalesce(n)` would skip
    * the shuffle but inherit the input's skew (a 1-file-per-partition
    * merge of skewed inputs reproduces the skew it was meant to fix).
    * Returns the compacted directory read back.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "compactParquet: targetBytes must be positive")
    val nFiles = math.max(1L,
      (dataBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Rewrite `df` into `outDir` as `nFiles` parquet files with DISJOINT
    * `sortCols` ranges (range partition + in-partition sort). The
    * clustering rewrite that makes range predicates on `sortCols`
    * skippable; see the object scaladoc.
    */
  def rangeLayout(df: DataFrame, outDir: String, nFiles: Int,
                  sortCols: String*): DataFrame = {
    require(nFiles > 0 && sortCols.nonEmpty)
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }

  /** Hive-style STATIC partitioning — the third layout scheme after
    * size compaction and range/Z clustering: rows land under one
    * directory per `partCol` value (`.write.partitionBy`), so a
    * predicate on the partition column is answered by DIRECTORY
    * elimination before any file is opened — coarser but cheaper than
    * min/max skipping, and the standard layout for low-cardinality
    * pipeline axes (language, source, date). The partition column's
    * values come back from the directory names on read; content is
    * otherwise identical (LayoutSpec asserts the pruned-scan file set,
    * the oracle checks content identity through the round-trip).
    * `partCol` must be low-cardinality — every distinct value is a
    * directory and at least one file.
    */
  def partitionedLayout(df: DataFrame, outDir: String,
                        partCol: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(partCol).parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }

  /** 16→32-bit Morton spread: the bits of the low 16 move to the even
    * positions (the standard magic-mask cascade — pure integer shifts
    * and masks, so the SAME arithmetic runs in any engine).
    */
  private def spread16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton (Z-order) interleave of two 16-bit keys into one 32-bit
    * locality key: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1, so rows close in BOTH dimensions get close z-values. Inputs
    * beyond 16 bits are masked (callers bucket/pmod first — the
    * clustering key needs locality, not injectivity).
    */
  def morton(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
  }

  /** DuckDB mirror of [[morton]] (same mask cascade, engine-neutral). */
  def mortonSql(x: String, y: String): String = {
    def spread(v: String): String = {
      val a = s"(($v) & 65535)"
      val b = s"(($a | ($a << 8)) & 16711935)"
      val d = s"(($b | ($b << 4)) & 252645135)"
      val e = s"(($d | ($d << 2)) & 858993459)"
      s"(($e | ($e << 1)) & 1431655765)"
    }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }

  /** Z-order clustering rewrite — the TWO-dimensional [[rangeLayout]]:
    * range-partition + sort on the Morton key of (xCol, yCol), so every
    * output file owns a DISJOINT z-range and therefore a COMPACT
    * rectangle-ish region of the (x, y) plane — parquet min/max stats
    * on BOTH columns become selective and a predicate on EITHER
    * dimension (or a box on both) skips most files, which 1-D range
    * layout only delivers for its leading column. The rewrite is the
    * heart of `OPTIMIZE ... ZORDER BY (x, y)`; same one-shuffle
    * plan shape as rangeLayout.
    */
  def zorderLayout(df: DataFrame, outDir: String, nFiles: Int,
                   xCol: String, yCol: String): DataFrame = {
    require(nFiles > 0)
    import org.apache.spark.sql.functions.col
    val z = df.withColumn("zval", morton(col(xCol), col(yCol)))
    z.repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }
}
