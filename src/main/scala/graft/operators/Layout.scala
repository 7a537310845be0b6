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
}
