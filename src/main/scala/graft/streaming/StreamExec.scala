package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.core._

/** Execute a streaming-capable pipe END-TO-END through Structured
  * Streaming and hand back the landed result as a DataFrame — the
  * proof-surface for the reference's incremental contract
  * (`feedPipe`/`squeezePipe`, `/root/reference/src/Data/Conduino.hs:229-296`)
  * under the driver's batch oracle: the same query text that checks the
  * batch `q_scan` checks the streaming `q_scan_stream`, because a pipe's
  * semantics must not depend on which engine path ran it.
  *
  * Mechanics: the input rows become a [[MemoryStream]] fed in fixed-size
  * quanta (each quantum = one micro-batch, so cross-batch state carry in
  * the `transformWithState` store is genuinely exercised — with the
  * default quantum a sf0.01 run takes 3 micro-batches, sf0.1 takes 25);
  * the memory sink accumulates Append-mode output; the sink table is the
  * returned DataFrame.
  *
  * Scale note: the driver-side feed is the correctness fixture's shape,
  * not the deployment shape — a production run replaces MemoryStream with
  * `spark.readStream` (Kafka/files) and the memory sink with a real sink,
  * and the pipe in between is unchanged. The single-key stateful ops
  * serialize by the reference's own ordered-stream contract; keyed
  * deployments shard first (see [[StreamPipes]] scaladoc).
  */
object StreamExec {

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The previous run's memory-sink table, dropped when the NEXT run
    * starts: callers consume each result before building the next query
    * (Verify writes, Bench counts), so at most one finished sink stays
    * registered — repeated runs can't accumulate full result copies in
    * driver memory.
    */
  @volatile private var lastSinkTable: Option[String] = None

  /** Physical plan of the last micro-batch of the most recent
    * [[runStreaming]] call — lets specs assert the stateful operator
    * (TransformWithStateExec / StateStore) actually executed, which a
    * batch read of the memory sink cannot show.
    */
  @volatile private[graft] var lastStreamingPlan: String = ""

  private val RocksKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `pipe` over `elems` via Structured Streaming (quantum rows per
    * micro-batch) and return the memory-sink table. The RocksDB state
    * store provider is set for the run and restored after (required by
    * `transformWithState`).
    */
  def runStreaming[A: TypeTag, B: TypeTag](
      spark: SparkSession, elems: Seq[Elem[A]], pipe: Pipe[A, B],
      quantum: Int = 4096): DataFrame = {
    lastSinkTable.foreach(spark.catalog.dropTempView)
    val prev = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey, RocksProvider)
    try {
      implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
      implicit val sq: SQLContext = spark.sqlContext
      val input = MemoryStream[Elem[A]]
      val out = pipe(SStream(input.toDS())).ds
      val name = s"graft_stream_${nameCounter.incrementAndGet()}"
      val query = out.writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append())
        .start()
      try {
        elems.grouped(quantum).foreach { chunk =>
          input.addData(chunk)
          query.processAllAvailable()
        }
        lastStreamingPlan = capturedExplain(query)
      } finally query.stop()
      lastSinkTable = Some(name)
      spark.table(name)
    } finally prev match {
      case Some(v) => spark.conf.set(RocksKey, v)
      case None    => spark.conf.unset(RocksKey)
    }
  }

  /** Run the streaming zipSource end-to-end: two MemoryStreams fed in
    * quanta (sides may advance at different rates within a quantum round)
    * through [[StreamPipes.zipSourcesStream]]'s stream-stream join, landed
    * in the memory sink. Both sides' seqs must be dense positions (the
    * zip's documented precondition); quanta are ordered prefix chunks.
    */
  def runStreamingZip[A: TypeTag, B: TypeTag](
      spark: SparkSession, as: Seq[Elem[A]], bs: Seq[Elem[B]],
      quantum: Int = 4096): DataFrame = {
    lastSinkTable.foreach(spark.catalog.dropTempView)
    implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
    implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
    implicit val sq: SQLContext = spark.sqlContext
    val ia = MemoryStream[Elem[A]]
    val ib = MemoryStream[Elem[B]]
    val out = StreamPipes.zipSourcesStream(SStream(ia.toDS()), SStream(ib.toDS())).ds
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val query = out.writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append())
      .start()
    try {
      val ca = as.grouped(quantum).toSeq
      val cb = bs.grouped(quantum).toSeq
      (0 until math.max(ca.size, cb.size)).foreach { i =>
        if (i < ca.size) ia.addData(ca(i))
        if (i < cb.size) ib.addData(cb(i))
        query.processAllAvailable()
      }
      lastStreamingPlan = capturedExplain(query)
    } finally query.stop()
    lastSinkTable = Some(name)
    spark.table(name)
  }

  /** `query.explain()` prints to stdout; capture it (public API — avoids
    * reaching into StreamExecution internals for the executed plan).
    */
  private[graft] def capturedExplain(query: org.apache.spark.sql.streaming.StreamingQuery): String = {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { query.explain() }
    buf.toString("UTF-8")
  }
}
