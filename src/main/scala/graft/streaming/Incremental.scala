package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.core._

/** The reference's incremental-execution contract
  * (`squeezePipe`/`feedPipe`, `src/Data/Conduino.hs:229-296`) on
  * Structured Streaming.
  *
  * `feedPipe xs p` feeds a pipe its inputs one quantum at a time,
  * draining all available outputs between quanta, with the pipe's state
  * suspended in between — exactly Structured Streaming's micro-batch
  * model. Here: a [[MemoryStream]] is the input queue, `feed()` is
  * `addData + processAllAvailable` (one micro-batch), the streaming
  * query's operator state is the suspended continuation, and the memory
  * sink holds the drained outputs (`squeeze()` reads the increment).
  *
  * Stateless pipes (map/filter/concatMap — the `graft.core.Pipes`
  * closures) run unchanged on the streaming Dataset. Ordered-stateful
  * scan/mapAccum run via [[StreamPipes.scanStateful]]
  * (flatMapGroupsWithState), whose GroupState is the carried fold
  * accumulator.
  *
  * Scale note: this single-key scan serializes by design — the reference
  * semantics are a strictly ordered stream. Real 100-TB streaming jobs
  * shard by key first (`groupByKey(k)` + the same stateful op per key),
  * which this implementation supports by construction
  * (flatMapGroupsWithState is already keyed); the single-key instance is
  * the faithful port of the reference's contract.
  */
object Incremental {

  /** An open incremental run of `pipe` — the continuation value of
    * `feedPipe` (`Data/Conduino.hs:253-256`). Feed quanta, squeeze
    * outputs, stop.
    */
  final class Feeder[A, B] private[Incremental] (
      spark: SparkSession,
      input: MemoryStream[Elem[A]],
      query: StreamingQuery,
      sinkTable: String,
      rowsToElems: Seq[Row] => Seq[Elem[B]],
      cut: Option[StreamPipes.CutPipe[_, _]]) {

    private var fed = 0L
    private var lastDrainedSeq = Long.MinValue

    /** Feed one input quantum (assign seqs continuing the stream) and run
      * one micro-batch (`feedPipeEither` step, lines 253-256).
      */
    def feed(xs: Seq[A]): Seq[B] = {
      input.addData(xs.map { a => val e = Elem(fed, a); fed += 1; e })
      query.processAllAvailable()
      squeeze()
    }

    /** The full `feedPipe` contract (reference `Data/Conduino.hs:253-256`):
      * feed a quantum, then report which branch the pipe is on.
      * `Left(outputs)` — the pipe is still awaiting input.
      * `Right((leftovers, outputs))` — the pipe TERMINATED during (or
      * before) this feed; `leftovers` are the inputs of THIS quantum it
      * never consumed, in feed order — the reference's leftover-inputs
      * branch. Requires the pipe to have been opened as a
      * [[StreamPipes.CutPipe]] (take/takeWhile streaming twins); a
      * non-cut pipe never terminates on an open stream, so it is always
      * `Left`.
      */
    def feedEither(xs: Seq[A]): Either[Seq[B], (Seq[A], Seq[B])] = {
      val startSeq = fed
      val outs = feed(xs)
      cut.flatMap(_.terminalSeq) match {
        case Some(t) =>
          val leftover = xs.zipWithIndex.collect {
            case (a, i) if startSeq + i > t => a
          }
          Right((leftover, outs))
        case None => Left(outs)
      }
    }

    /** Rows collected by the most recent squeeze — exposed so the spec
      * can assert only the DRAINED increment crosses the driver, never
      * the whole sink table.
      */
    private[graft] var lastSqueezeRowCount: Int = -1

    /** Drain outputs produced since the last squeeze
      * (`squeezePipe`, lines 265-278): all output available without
      * feeding more input. Drained rows are identified BY SEQ, not by
      * position: input seqs are assigned monotonically by `feed` and
      * every streaming-capable pipe preserves seq monotonicity, so
      * `seq > lastDrainedSeq` selects exactly the rows appended since the
      * last drain — exactly-once even if the memory sink's collect order
      * is not stable append order. The seq predicate is pushed into the
      * table read BEFORE collect, so driver traffic is O(fresh rows) per
      * call, not O(all outputs ever) — a long-lived Feeder stays linear,
      * not quadratic. One batched decode per call (fresh rows only).
      * Known residency cost: the Append-mode memory SINK itself retains
      * every output row until [[stop]] (Spark's memory sink has no trim
      * API), so the linearity claim is about per-call collect traffic,
      * not sink memory — bound very-long-lived feeds or reopen the
      * Feeder periodically.
      */
    def squeeze(): Seq[B] = {
      import org.apache.spark.sql.functions.col
      val fresh = spark.table(sinkTable)
        .filter(col("seq") > lastDrainedSeq).collect().toSeq
      lastSqueezeRowCount = fresh.size
      val elems = rowsToElems(fresh).sortBy(_.seq)
      if (elems.nonEmpty) lastDrainedSeq = elems.last.seq
      elems.map(_.value)
    }

    def stop(): Unit = query.stop()
  }

  /** Open a pipe for incremental feeding (`feedPipe`'s loop). The pipe
    * must be streaming-capable (stateless core pipes and
    * [[StreamPipes]] stateful ones are; cut/iterative pipes are batch
    * constructs).
    */
  private val RocksKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def open[A: TypeTag, B: TypeTag](spark: SparkSession, pipe: Pipe[A, B],
                                   name: String): Feeder[A, B] = {
    implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
    implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
    implicit val sq: SQLContext = spark.sqlContext
    val input = MemoryStream[Elem[A]]
    val out = pipe(SStream(input.toDS())).ds
    // scope the RocksDB provider around query START (the query captures
    // the conf then) — the same uniform-backend contract as
    // StreamExec.runProtocol, so no caller has to hand-set it
    val prev = spark.conf.getOption(RocksKey)
    spark.conf.set(RocksKey, RocksProvider)
    val query =
      try out.writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append())
        .start()
      finally prev match {
        case Some(v) => spark.conf.set(RocksKey, v)
        case None    => spark.conf.unset(RocksKey)
      }
    val cut = pipe match {
      case c: StreamPipes.CutPipe[_, _] =>
        // a reused CutPipe instance would otherwise report the PREVIOUS
        // stream's termination boundary against this Feeder's restarted
        // seq counter — stale-state, silently wrong feedEither branch
        c.acc.reset()
        Some(c)
      case _ => None
    }
    new Feeder[A, B](spark, input, query, name,
      rowFromMemory[B](spark, out.schema), cut)
  }

  /** Rows strictly after the last drained seq — the squeeze selection,
    * factored out so StreamingSpec can assert exactly-once delivery under
    * a PERMUTED collect order.
    */
  private[graft] def freshBySeq(rows: Seq[Row], lastDrainedSeq: Long): Seq[Row] =
    rows.filter(_.getAs[Long]("seq") > lastDrainedSeq)

  /** Batched Row decoder for the memory sink — driver-LOCAL: the rows
    * were already collected to the driver, so re-parallelizing them
    * into a DataFrame just to run the Elem encoder would launch a full
    * Spark job per squeeze (roughly doubling per-quantum latency at
    * fine quanta). A bound ExpressionEncoder deserializer over the
    * Catalyst converter does the identical decode with zero jobs.
    */
  private def rowFromMemory[B: TypeTag](spark: SparkSession,
                                        schema: org.apache.spark.sql.types.StructType): Seq[Row] => Seq[Elem[B]] = {
    val deser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Elem[B]]()
      .resolveAndBind().createDeserializer()
    val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    (rs: Seq[Row]) =>
      rs.map(r => deser(toCatalyst(r)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]))
  }
}

/** Streaming-capable stateful pipes (the `transformWithState`/
  * `flatMapGroupsWithState` side of SURVEY.md §2.4).
  */
object StreamPipes {

  /** Min-over-updates accumulator holding a cut pipe's termination
    * boundary: the seq of the LAST input the pipe consumed before
    * terminating (`-1` if it consumed nothing). Min-merge makes it safe
    * under task retries and speculative duplicates — every update for a
    * given stream reports the same deterministic boundary or a later
    * over-approximation, and min keeps the true one.
    */
  final class MinSeqAcc
    extends org.apache.spark.util.AccumulatorV2[Long, Long] {
    private var v: Long = Long.MaxValue
    def isZero: Boolean = v == Long.MaxValue
    def copy(): MinSeqAcc = { val c = new MinSeqAcc; c.v = v; c }
    def reset(): Unit = v = Long.MaxValue
    def add(x: Long): Unit = v = math.min(v, x)
    def merge(o: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
      if (!o.isZero) add(o.value)
    def value: Long = v
  }

  /** A pipe that can TERMINATE mid-stream (take/takeWhile cuts) and
    * reports where: `terminalSeq` is the seq of the last consumed input
    * once the pipe has terminated, `None` while it still awaits input —
    * the observable needed for `feedPipe`'s leftover-inputs branch
    * (reference `Data/Conduino.hs:253-256`). Composing downstream with
    * `|>` preserves the cut boundary: a downstream transform consumes
    * everything the cut lets through, so the leftover set is unchanged.
    * UPSTREAM composition (`somePipe |> cutPipe`) is NOT tracked — the
    * cut's seq boundary then counts the upstream's outputs, not the
    * original inputs (a concatMap upstream makes the two differ);
    * construct the cut first and compose downstream of it.
    */
  final class CutPipe[A, B] private[streaming] (
      inner: Pipe[A, B], private[streaming] val acc: MinSeqAcc)
    extends Pipe[A, B] {
    def apply(in: SStream[A]): SStream[B] = inner(in)
    def terminalSeq: Option[Long] = if (acc.isZero) None else Some(acc.value)
    override def |>[C](q: Pipe[B, C]): Pipe[A, C] =
      new CutPipe[A, C](super.|>(q), acc)
  }

  private def newCutAcc(spark: SparkSession, name: String): MinSeqAcc = {
    val acc = new MinSeqAcc
    spark.sparkContext.register(acc, name)
    acc
  }

  /** [[takeTws]] with the termination boundary reported: consuming the
    * n-th element records its seq as terminal (the reference's take
    * returns right after the n-th await); any element dropped after the
    * cut records `seq - 1` (it was never consumed) — min of both views
    * is the exact boundary, so feeding EXACTLY n elements already
    * reports termination with zero leftovers.
    */
  def takeTwsCut[A: TypeTag](spark: SparkSession, n: Long): CutPipe[A, A] = {
    val acc = newCutAcc(spark, s"graft_cut_take_$n")
    val p = twsPipe[A, Long, A](0L) { (cnt, e) =>
      if (cnt < n) {
        if (cnt + 1 == n) acc.add(e.seq)
        (cnt + 1, Seq(e))
      } else { acc.add(e.seq - 1); (cnt, Nil) }
    }
    new CutPipe(p, acc)
  }

  /** [[takeWhileTws]] with the termination boundary reported: the first
    * failing element is CONSUMED (the reference awaits it to test it —
    * same convention as [[dropWhileTws]]) and records its seq as
    * terminal; later drops record `seq - 1`.
    */
  def takeWhileTwsCut[A: TypeTag](spark: SparkSession, p: A => Boolean): CutPipe[A, A] = {
    val acc = newCutAcc(spark, "graft_cut_takewhile")
    val inner = twsPipe[A, Boolean, A](false) { (cutSeen, e) =>
      if (cutSeen) { acc.add(e.seq - 1); (true, Nil) }
      else if (!p(e.value)) { acc.add(e.seq); (true, Nil) }
      else (false, Seq(e))
    }
    new CutPipe(inner, acc)
  }

  /** scan over a streaming Dataset: flatMapGroupsWithState holds the
    * accumulator; within each micro-batch rows are folded in seq order.
    * Output seq = input seq (same convention as the batch scan).
    */
  def scanStateful[A: TypeTag, B: TypeTag](zero: B)(step: (B, A) => B): Pipe[A, B] =
    new Pipe[A, B] {
      def apply(in: SStream[A]): SStream[B] = {
        implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
        implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
        implicit val encBraw: Encoder[B] =
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[B]()
        implicit val encKey: Encoder[Int] = Encoders.scalaInt
        val out = in.ds.groupByKey(_ => 0)
          .flatMapGroupsWithState[B, Elem[B]](
            OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
            (_: Int, rows: Iterator[Elem[A]], state: GroupState[B]) =>
              var acc = state.getOption.getOrElse(zero)
              val outs = rows.toSeq.sortBy(_.seq).map { e =>
                acc = step(acc, e.value); Elem(e.seq, acc)
              }
              state.update(acc)
              outs.iterator
          }
        SStream(out)
      }
    }

  /** mapAccum over a streaming Dataset (same machinery, outputs only). */
  def mapAccumStateful[A: TypeTag, S: TypeTag, B: TypeTag](s0: S)(
      f: (A, S) => (S, B)): Pipe[A, B] =
    new Pipe[A, B] {
      def apply(in: SStream[A]): SStream[B] = {
        implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
        implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
        implicit val encS: Encoder[S] =
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[S]()
        implicit val encKey: Encoder[Int] = Encoders.scalaInt
        val out = in.ds.groupByKey(_ => 0)
          .flatMapGroupsWithState[S, Elem[B]](
            OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
            (_: Int, rows: Iterator[Elem[A]], state: GroupState[S]) =>
              var s = state.getOption.getOrElse(s0)
              val outs = rows.toSeq.sortBy(_.seq).map { e =>
                val (s2, b) = f(e.value, s); s = s2; Elem(e.seq, b)
              }
              state.update(s)
              outs.iterator
          }
        SStream(out)
      }
    }

  // ----- transformWithState variants (SURVEY §1.2/§7.6) -----
  //
  // The non-deprecated arbitrary-state API. Requires the RocksDB state
  // store provider on the session:
  //   spark.sql.streaming.stateStore.providerClass =
  //     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
  // Within a micro-batch rows fold in seq order; the ValueState carries
  // the accumulator across batches — exactly the suspended continuation
  // of the reference's feedPipe.

  /** Single-key ordered stateful processor: fold rows in seq order
    * through `f: (state, elem) → (state', outputs)`.
    */
  private class OrderedProcessor[A, S, B](
      zero: S, stateEnc: Encoder[S],
      f: (S, Elem[A]) => (S, Seq[Elem[B]]))
    extends StatefulProcessor[Int, Elem[A], Elem[B]] {

    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[S]("graft_state", stateEnc, TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[Elem[A]],
                                 tv: TimerValues): Iterator[Elem[B]] = {
      var s = if (st.exists()) st.get() else zero
      // force the fold BEFORE updating state (iterators are lazy)
      val out = rows.toSeq.sortBy(_.seq).flatMap { e =>
        val (s2, bs) = f(s, e); s = s2; bs
      }
      st.update(s)
      out.iterator
    }
  }

  private def twsPipe[A: TypeTag, S: TypeTag, B: TypeTag](zero: S)(
      f: (S, Elem[A]) => (S, Seq[Elem[B]])): Pipe[A, B] =
    new Pipe[A, B] {
      def apply(in: SStream[A]): SStream[B] = {
        implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
        implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
        implicit val encKey: Encoder[Int] = Encoders.scalaInt
        // resolveAndBind: composite state types (Seq/Option) otherwise
        // reach getValueState with an UnresolvedMapObjects deserializer
        val encS: Encoder[S] =
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[S]().resolveAndBind()
        SStream(in.ds.groupByKey(_ => 0)
          .transformWithState(new OrderedProcessor[A, S, B](zero, encS, f),
            TimeMode.None(), OutputMode.Append()))
      }
    }

  /** scan on transformWithState (streaming twin of `Pipes.scan`). */
  def scanTws[A: TypeTag, B: TypeTag](zero: B)(step: (B, A) => B): Pipe[A, B] =
    twsPipe[A, B, B](zero) { (s, e) =>
      val s2 = step(s, e.value); (s2, Seq(Elem(e.seq, s2)))
    }

  /** mapAccum on transformWithState. */
  def mapAccumTws[A: TypeTag, S: TypeTag, B: TypeTag](s0: S)(
      f: (A, S) => (S, B)): Pipe[A, B] =
    twsPipe[A, S, B](s0) { (s, e) =>
      val (s2, b) = f(e.value, s); (s2, Seq(Elem(e.seq, b)))
    }

  /** take(n) as a streaming pipe: pass the first n elements, drop the
    * rest (a stream never "terminates upstream", so the cut is a
    * stateful drop — the reference's take semantics on an open stream).
    */
  def takeTws[A: TypeTag](n: Long): Pipe[A, A] =
    twsPipe[A, Long, A](0L) { (cnt, e) =>
      if (cnt < n) (cnt + 1, Seq(e)) else (cnt, Nil)
    }

  /** pairs as a streaming pipe: (previous, current) per element after the
    * first — state is the last element seen, carried across quanta.
    */
  def pairsTws[A: TypeTag]: Pipe[A, (A, A)] =
    twsPipe[A, Option[A], (A, A)](Option.empty[A]) { (prev, e) =>
      (Some(e.value), prev.toSeq.map(p => Elem(e.seq, (p, e.value))))
    }

  /** consecutive(n) as a streaming pipe: for each element, the window of
    * up to n elements BEFORE it (the reference's off-by-one, matching
    * `Pipes.consecutive` minus the end-of-stream window — an open stream
    * has no end).
    */
  def consecutiveTws[A: TypeTag](n: Int): Pipe[A, Seq[A]] =
    twsPipe[A, Seq[A], Seq[A]](Vector.empty[A]) { (win, e) =>
      ((win :+ e.value).takeRight(n), Seq(Elem(e.seq, win)))
    }

  /** takeWhile as a streaming pipe (reference
    * `Data/Conduino/Combinators.hs:432-440`): pass elements while `p`
    * holds; the first failing element sets a PERSISTENT cut — it and
    * everything after (across quanta) is dropped. An open stream never
    * "terminates upstream", so like [[takeTws]] the cut is a stateful
    * drop.
    */
  def takeWhileTws[A: TypeTag](p: A => Boolean): Pipe[A, A] =
    twsPipe[A, Boolean, A](false) { (cut, e) =>
      if (cut || !p(e.value)) (true, Nil) else (false, Seq(e))
    }

  /** The streaming form of `dropWhile p >> id` (`Combinators.hs:537-547`
    * composed with the identity tail — the form users run; standalone
    * batch `Pipes.dropWhile` is a consumer yielding nothing): drop the
    * longest prefix satisfying `p` AND the first failing element (the
    * reference consumes it, no leftovers); everything after passes,
    * across quanta.
    */
  def dropWhileTws[A: TypeTag](p: A => Boolean): Pipe[A, A] =
    twsPipe[A, Boolean, A](false) { (cutSeen, e) =>
      if (cutSeen) (true, Seq(e))
      else if (!p(e.value)) (true, Nil) // first failing element: consumed, not emitted
      else (false, Nil)
    }

  /** Positional zip of two STREAMING sources (reference zipSource,
    * `Data/Conduino.hs:512-521`): a stream-stream inner equi-join on seq.
    *
    * PRECONDITION (unlike batch `Compose.zipSources`, which re-ranks
    * sparse seqs with `dense()` first): both sides' seqs must already BE
    * the positions — aligned dense counters, as assigned by a Feeder's
    * `feed` or any unfiltered source. A dense re-rank is a global
    * ordering pass that has no bounded-state streaming analog, so a
    * filtered stream must be re-sequenced upstream before zipping.
    *
    * Scale shape: the join key includes a WATERMARKED synthetic
    * event-time column derived from seq (`timestamp_micros(seq)`), so
    * Spark purges matched join state as the watermark advances instead
    * of buffering both streams forever — state is bounded by
    * `delayThreshold` worth of un-arrived positions, the requirement for
    * a long-lived zip of unbounded streams.
    */
  /** Synthetic event-time base for [[zipSourcesStream]]: seq 0 must not
    * land ON the epoch — the initial watermark is the epoch, and a row
    * whose event time equals the watermark is dropped as late before it
    * can join. One day clears any delayThreshold a zip would use.
    */
  private val ZipEpochOffsetUs = 86400000000L

  def zipSourcesStream[A: TypeTag, B: TypeTag](
      a: SStream[A], b: SStream[B],
      delayThreshold: String = "1 hour"): SStream[(A, B)] = {
    implicit val encAB: Encoder[Elem[(A, B)]] = Elem.enc[(A, B)]
    import org.apache.spark.sql.functions._
    val da = a.ds.toDF()
      .withColumn("__ts", timestamp_micros(col("seq") + lit(ZipEpochOffsetUs)))
      .withWatermark("__ts", delayThreshold)
    val db = b.ds.toDF()
      .select(col("seq").as("__bseq"), col("value").as("__bvalue"))
      .withColumn("__bts", timestamp_micros(col("__bseq") + lit(ZipEpochOffsetUs)))
      .withWatermark("__bts", delayThreshold)
    val joined = da.join(db,
      col("__ts") === col("__bts") && col("seq") === col("__bseq"))
    SStream(joined
      .select(col("seq"),
        struct(col("value").as("_1"), col("__bvalue").as("_2")).as("value"))
      .as[Elem[(A, B)]])
  }

  /** LEFT-OUTER streaming zip: every left position is kept, paired with
    * `None` once the watermark PROVES the right position cannot arrive —
    * the streaming form of zipping against a sparser side without
    * truncating at it (the inner [[zipSourcesStream]] is the reference's
    * shorter-side-truncating zip, `Data/Conduino.hs:331-339`; the outer
    * form answers "which positions were missing", which a truncating zip
    * erases).
    *
    * Structured Streaming's outer-join contract drives the shape:
    * unmatched preserved-side rows emit only after BOTH watermarks pass
    * their event time, so a bounded feed must push sentinel rows through
    * both sides to flush the tail (see StreamExec.runStreamingZipLeft).
    * `maxSeq` bounds the REAL positions: rows at seq ≥ maxSeq are
    * watermark-advancing sentinels, excluded from the output by a
    * predicate on the left EVENT-TIME attribute — Catalyst cannot push
    * that below the EventTimeWatermark node, so sentinels still advance
    * the watermark before being dropped (a predicate on `seq` WOULD be
    * pushed below it and the tail would silently never flush).
    */
  def zipSourcesStreamLeft[A: TypeTag, B: TypeTag](
      a: SStream[A], b: SStream[B], maxSeq: Long,
      delayThreshold: String = "1 hour"): SStream[(A, Option[B])] = {
    implicit val encAB: Encoder[Elem[(A, Option[B])]] = Elem.enc[(A, Option[B])]
    import org.apache.spark.sql.functions._
    val da = a.ds.toDF()
      .withColumn("__ts", timestamp_micros(col("seq") + lit(ZipEpochOffsetUs)))
      .withWatermark("__ts", delayThreshold)
    val db = b.ds.toDF()
      .select(col("seq").as("__bseq"), col("value").as("__bvalue"))
      .withColumn("__bts", timestamp_micros(col("__bseq") + lit(ZipEpochOffsetUs)))
      .withWatermark("__bts", delayThreshold)
    val joined = da.join(db,
      col("__ts") === col("__bts") && col("seq") === col("__bseq"), "left_outer")
    SStream(joined
      .filter(col("__ts") < timestamp_micros(lit(maxSeq + ZipEpochOffsetUs)))
      .select(col("seq"),
        struct(col("value").as("_1"), col("__bvalue").as("_2")).as("value"))
      .as[Elem[(A, Option[B])]])
  }
}
