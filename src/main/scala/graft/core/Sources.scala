package graft.core

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Stream constructors — the port of conduino's source combinators
  * (reference `src/Data/Conduino/Combinators.hs:97-320`). A source is a
  * `Pipe () o u m a`; here it is a constructor of `SStream[O]`.
  *
  * Unbounded sources (`repeat`, `iterate`, `unfold` with no stop) exist in
  * the reference because pipes are lazy; a batch Dataset is finite, so the
  * unbounded variants take an explicit element budget `n` (the prefix a
  * downstream `take n` would demand — limit pushdown made explicit). Their
  * genuinely-unbounded forms live in graft.streaming over readStream.
  */
object Sources {

  /** sourceList (reference `Combinators.hs:175-177`): yield every element
    * of a collection in order. seq = list index.
    */
  def fromSeq[A: TypeTag](spark: SparkSession, xs: Seq[A]): SStream[A] = {
    implicit val e: Encoder[Elem[A]] = Elem.enc[A]
    SStream(spark.createDataset(
      xs.iterator.zipWithIndex.map { case (x, i) => Elem(i.toLong, x) }.toSeq))
  }

  /** A table/Dataset as a stream, ordered by the given sort columns
    * (scalable two-phase ordinal, no global window).
    */
  def fromDataset[A](ds: Dataset[A], sortCols: Seq[Column])
                    (implicit enc: Encoder[Elem[A]]): SStream[A] =
    SStream(Ordinals.zipWithOrdinal(ds, sortCols))

  /** A DataFrame that already carries (or can derive) its ordinal from an
    * existing unique key expression — the zero-shuffle scale path.
    */
  def fromKeyedDataFrame(df: DataFrame, seqExpr: Column): DataFrame =
    Ordinals.byExpression(df, seqExpr)

  /** replicate (reference `Combinators.hs:185-187`): n copies of x. */
  def replicate[A: TypeTag](spark: SparkSession, n: Long, x: A): SStream[A] = {
    implicit val e: Encoder[Elem[A]] = Elem.enc[A]
    SStream(spark.range(n).map(i => Elem(i, x)))
  }

  /** repeat (reference `Combinators.hs:180-182`), bounded to n elements. */
  def repeat[A: TypeTag](spark: SparkSession, x: A, n: Long): SStream[A] =
    replicate(spark, n, x)

  /** iterate (reference `Combinators.hs:167-172`): x0 excluded, yields
    * f(x0), f(f(x0)), … — bounded to n. When `f` is expressible as a
    * closed form over the index, prefer `iterateClosedForm`: it is a pure
    * distributed projection over `spark.range` with no sequential driver
    * work.
    */
  def iterate[A: TypeTag](spark: SparkSession, f: A => A, x0: A, n: Long): SStream[A] = {
    // fail fast, never truncate: (3e9).toInt is negative and take(<0)
    // would silently return an EMPTY stream; past-Int budgets belong on
    // the distributed paths (iterateClosedForm / iterateJump)
    require(n <= Int.MaxValue,
      s"iterate generates on the driver (n=$n > Int.MaxValue); use iterateClosedForm/iterateJump")
    fromSeq(spark, Iterator.iterate(x0)(f).drop(1).take(n.toInt).toSeq)
  }

  /** iterate when f^k(x0) has a closed form g(k) (k = 1-based step count):
    * fully distributed generation. e.g. succ → g(k) = x0 + k.
    */
  def iterateClosedForm(spark: SparkSession, n: Long, g: Column => Column): DataFrame =
    spark.range(n).select(col("id").as("seq"), g(col("id") + 1).as("value"))

  /** iterate, distributed by CHUNK (the leapfrog / skip-ahead pattern):
    * each partition of `spark.range` computes its own starting state with
    * `jump(x0, k) = f^k(x0)` and then iterates `f` locally — no driver
    * generation at any n. This covers the cases between [[iterate]]
    * (driver-bound, needs nothing) and [[iterateClosedForm]] (fully
    * distributed, needs a FULL closed form): affine recurrences / LCGs
    * (see [[affineJump]]), geometric sequences, matrix powers — anywhere
    * f^k is computable in O(log k) even though g(k) alone isn't handy.
    * Output convention matches `iterate`: x0 excluded, seq i holds
    * f^(i+1)(x0).
    */
  def iterateJump[A: TypeTag](spark: SparkSession, f: A => A, x0: A, n: Long,
                              jump: (A, Long) => A, numSlices: Int = 0): SStream[A] = {
    implicit val e: Encoder[Elem[A]] = Elem.enc[A]
    val slices = if (numSlices > 0) numSlices
                 else spark.sparkContext.defaultParallelism
    SStream(spark.range(0, n, 1, slices).mapPartitions { it =>
      val buf = it.buffered
      if (!buf.hasNext) Iterator.empty
      else {
        var x = jump(x0, buf.head + 1) // range partitions are contiguous
        buf.map { i => val out = Elem(i, x); x = f(x); out }
      }
    })
  }

  /** Jump function for the affine recurrence x ↦ (a·x + c) mod m:
    * composes the map k times by fast exponentiation of the (a, c) pair
    * ((a,c)∘(a',c') = (a·a', a·c' + c)) — O(log k), no modular inverse
    * needed (works for any m, unlike the geometric-series closed form).
    * Requires a, c, x < m and m² within Long (m ≤ ~3·10⁹ is safe).
    */
  def affineJump(a: Long, c: Long, m: Long): (Long, Long) => Long = {
    (x: Long, k: Long) =>
      var (ra, rc) = (1L, 0L) // identity map
      var (ba, bc) = (a % m, c % m)
      var kk = k
      while (kk > 0) {
        if ((kk & 1L) == 1L) { val t = ((ba * ra) % m, (ba * rc + bc) % m); ra = t._1; rc = t._2 }
        val s = ((ba * ba) % m, (ba * bc + bc) % m); ba = s._1; bc = s._2
        kk >>= 1
      }
      (ra * (x % m) + rc) % m
  }

  /** unfold (reference `Combinators.hs:121-130`), bounded to n elements.
    * General s -> (o, s) is inherently sequential: generated on the driver
    * and parallelized. Used for small control streams; large generated
    * streams should use `spark.range` + closed forms, or [[iterateJump]]
    * when a skip-ahead exists, instead.
    */
  def unfold[A: TypeTag, S](spark: SparkSession, f: S => (A, S), s0: S, n: Long): SStream[A] = {
    // fail fast, never truncate (see iterate): past-Int budgets belong
    // on the distributed segment-replay path (unfoldSegmented)
    require(n <= Int.MaxValue,
      s"unfold generates on the driver (n=$n > Int.MaxValue); use unfoldSegmented")
    val it = new Iterator[A] {
      private var s = s0
      def hasNext = true
      def next() = { val (a, s2) = f(s); s = s2; a }
    }
    fromSeq(spark, it.take(n.toInt).toSeq)
  }

  /** unfold, DISTRIBUTED for bounded general recurrences (reference
    * `Combinators.hs:121-130`): partition i of `segments` REPLAYS the
    * pure state transition past its first i·segLen steps WITHOUT
    * materializing elements, then generates exactly its own segment.
    * A general s → (a, s) recurrence is inherently sequential, so the
    * total step-call count is O(n·segments/2) — but each task makes at
    * most n calls and they run in PARALLEL, and element construction,
    * encoding, and everything downstream is fully distributed. The
    * right trade when the step is cheap arithmetic and the element /
    * downstream work dominates; [[unfold]] stays the driver-side form
    * for expensive steps, [[iterateJump]] the O(log k) form when a
    * skip-ahead exists. `f` and `s0` ship to tasks — they must be
    * serializable and PURE (each partition replays the same prefix).
    */
  def unfoldSegmented[A: TypeTag, S](spark: SparkSession, f: S => (A, S),
                                     s0: S, n: Long,
                                     segments: Int = 32): SStream[A] = {
    require(segments > 0, s"unfoldSegmented: segments=$segments")
    require(n >= 0, s"unfoldSegmented: n=$n")
    implicit val e: Encoder[Elem[A]] = Elem.enc[A]
    val segLen = (n + segments - 1) / math.max(1, segments)
    val ds = spark.range(0, segments.toLong, 1, segments).flatMap { i =>
      val start = i * segLen
      val end = math.min(n, start + segLen)
      if (start >= end) Iterator.empty[Elem[A]]
      else {
        var s = s0
        var k = 0L
        while (k < start) { s = f(s)._2; k += 1 }
        new Iterator[Elem[A]] {
          private var st = s
          private var pos = start
          def hasNext: Boolean = pos < end
          def next(): Elem[A] = {
            val (a, s2) = f(st); st = s2
            val el = Elem(pos, a); pos += 1; el
          }
        }
      }
    }
    SStream(ds)
  }

  /** unfoldMaybe (reference `Combinators.hs:110-115`): unfold until None. */
  def unfoldMaybe[A: TypeTag, S](spark: SparkSession, f: S => Option[(A, S)], s0: S): SStream[A] = {
    val buf = Seq.newBuilder[A]
    var s = s0
    var continue = true
    while (continue) f(s) match {
      case Some((a, s2)) => buf += a; s = s2
      case None          => continue = false
    }
    fromSeq(spark, buf.result())
  }

  /** unfoldEither (reference `Combinators.hs:97-106`): unfold until Left r;
    * returns the stream plus the terminal result.
    */
  def unfoldEither[A: TypeTag, S, R](spark: SparkSession, f: S => Either[R, (A, S)], s0: S): (SStream[A], R) = {
    val buf = Seq.newBuilder[A]
    var s = s0
    var res: Option[R] = None
    while (res.isEmpty) f(s) match {
      case Right((a, s2)) => buf += a; s = s2
      case Left(r)        => res = Some(r)
    }
    (fromSeq(spark, buf.result()), res.get)
  }

  /** iterateMaybe (reference `Combinators.hs:143-148`): yields f(x0),
    * f(f(x0)), … until None (x0 itself excluded, as in `iterate`).
    */
  def iterateMaybe[A: TypeTag](spark: SparkSession, f: A => Option[A], x0: A): SStream[A] =
    unfoldMaybe[A, A](spark, (s: A) => f(s).map(y => (y, y)), x0)

  /** iterateEither (reference `Combinators.hs:134-139`): iterate until
    * Left r; returns the stream plus the terminal result.
    */
  def iterateEither[A: TypeTag, R](spark: SparkSession, f: A => Either[R, A], x0: A): (SStream[A], R) =
    unfoldEither[A, A, R](spark, (s: A) => f(s).map(y => (y, y)), x0)

  /** replicateM (reference `Combinators.hs:218-224`): run an effect n
    * times, yielding each result. The effect runs task-side, once per
    * element, distributed over `spark.range` partitions.
    */
  def replicateM[A: TypeTag](spark: SparkSession, n: Long, eff: () => A): SStream[A] = {
    implicit val e: Encoder[Elem[A]] = Elem.enc[A]
    SStream(spark.range(n).mapPartitions(_.map(i => Elem(i, eff()))))
  }

  /** repeatM (reference `Combinators.hs:313-320`), bounded: alias of
    * replicateM (the unbounded form is the streaming rate source).
    */
  def repeatM[A: TypeTag](spark: SparkSession, eff: () => A, n: Long): SStream[A] =
    replicateM(spark, n, eff)

  /** The TRUE unbounded monadic source (the `u = Void` infinite-upstream
    * cell of the reference's type table — `repeatM`/`iterate` run forever,
    * `Combinators.hs:313-320,126-131`): Structured Streaming's rate
    * source emits the counter 0, 1, 2, … indefinitely; seq = value = the
    * iterate position. Nothing downstream of this source ever sees an
    * end-of-stream — only a cut pipe or stopping the query terminates,
    * exactly the reference's semantics. Run it via
    * `StreamExec.runRateStream` (bounded prefix under the oracle) or any
    * `writeStream` sink.
    *
    * `numPartitions` defaults to 1 because the counter IS the seq — the
    * ordered-stream contract. A production unbounded ingest shards by key
    * first and uses per-key seqs (see StreamPipes scaladoc).
    */
  def rateCounter(spark: SparkSession, rowsPerSecond: Long = 50000,
                  numPartitions: Int = 1): SStream[Long] = {
    implicit val e: Encoder[Elem[Long]] = Elem.enc[Long]
    SStream(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", numPartitions)
      .load()
      .select(col("value").as("seq"), col("value").as("value"))
      .as[Elem[Long]])
  }

  /** repeatMaybeM (reference `Combinators.hs:206-211`): repeat a
    * driver-side effect, yielding results, until it returns None. The
    * effect is inherently sequential (each call decides whether to
    * continue) — a control stream, driver-generated then parallelized.
    */
  def repeatMaybeM[A: TypeTag](spark: SparkSession, eff: () => Option[A]): SStream[A] = {
    val buf = Seq.newBuilder[A]
    var continue = true
    while (continue) eff() match {
      case Some(a) => buf += a
      case None    => continue = false
    }
    fromSeq(spark, buf.result())
  }

  /** repeatEitherM (reference `Combinators.hs:190-199`): repeat until the
    * effect returns Left r; yields the Rights, returns the terminal r.
    */
  def repeatEitherM[A: TypeTag, R](spark: SparkSession, eff: () => Either[R, A]): (SStream[A], R) = {
    val buf = Seq.newBuilder[A]
    var res: Option[R] = None
    while (res.isEmpty) eff() match {
      case Right(a) => buf += a
      case Left(r)  => res = Some(r)
    }
    (fromSeq(spark, buf.result()), res.get)
  }

  /** genSource (reference `src/Data/Conduino.hs:570-577`): build a source
    * from a church-encoded generator — in this engine a driver-side
    * callback emitting elements until None, i.e. exactly
    * [[repeatMaybeM]]'s shape (the generator ≅ effectful unfold).
    */
  def genSource[A: TypeTag](spark: SparkSession, gen: () => Option[A]): SStream[A] =
    repeatMaybeM(spark, gen)

  /** sourceHandleLines / sourceHandleLinesText
    * (reference `Combinators.hs:245-275`): one element per text line, seq =
    * global line number (file order).
    */
  def textLines(spark: SparkSession, path: String): SStream[String] = {
    implicit val e: Encoder[Elem[String]] = Elem.enc[String]
    // file order = (file name, offset within file); the two-phase ordinal
    // (no global window, no extra zipWithIndex pass) stamps dense seqs
    val withPos = spark.read.textFile(path)
      .select(col("value"),
        input_file_name().as("__f"),
        monotonically_increasing_id().as("__off"))
    val ordered = graft.operators.RowExec
      .withDenseSeq(withPos, Seq(col("__f"), col("__off")))
    SStream(ordered.select(col("seq"), col("value")).as[Elem[String]])
  }

  /** stdinLines semantics (reference `Combinators.hs:228-231`): lines until
    * the first empty line — a composed source `.| takeWhile (not null)`.
    */
  def linesUntilBlank(spark: SparkSession, path: String): SStream[String] =
    textLines(spark, path) |> Pipes.takeWhile[String](_.nonEmpty)

  /** stdinLines over the REAL stdin (reference `Combinators.hs:228-231`):
    * driver-side console read until EOF or the first empty line, then
    * parallelized — stdin is a driver resource, not a distributed one.
    */
  def stdinLines(spark: SparkSession): SStream[String] = {
    // read System.in at CALL time (scala.io.StdIn captures the stream at
    // class-init, which breaks redirected/late-bound stdin)
    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    val buf = Seq.newBuilder[String]
    var line = reader.readLine()
    while (line != null && line.nonEmpty) { buf += line; line = reader.readLine() }
    fromSeq(spark, buf.result())
  }

  /** stdin as raw chunks (reference `Combinators.hs:235-237`): fixed-size
    * byte chunks off the driver's System.in until EOF.
    */
  def stdinChunks(spark: SparkSession, chunkSize: Int = 32 * 1024): SStream[Array[Byte]] = {
    val buf = Seq.newBuilder[Array[Byte]]
    val arr = new Array[Byte](chunkSize)
    var n = System.in.read(arr)
    while (n > 0) { buf += java.util.Arrays.copyOf(arr, n); n = System.in.read(arr) }
    fromSeq(spark, buf.result())
  }

  /** sourceHandle with a FIXED chunk size (reference
    * `Combinators.hs:280-288` reads a handle in fixed-size chunks): the
    * file's bytes as consecutive `chunkSize`-byte chunks, one row per
    * chunk, seq = chunk index. A columnar fan-out (posexplode over
    * binary substrings) on top of the binaryFile source — the chunking
    * itself never touches the driver. An empty file yields no chunks.
    */
  def fileChunks(spark: SparkSession, path: String, chunkSize: Int): SStream[Array[Byte]] = {
    require(chunkSize > 0, "fileChunks: chunkSize must be positive")
    implicit val e: Encoder[Elem[Array[Byte]]] = Elem.enc[Array[Byte]]
    val df = spark.read.format("binaryFile").load(path).select(col("content"))
    SStream(df.select(posexplode(
        when(length(col("content")) > 0,
          transform(
            sequence(lit(0), ((length(col("content")) - 1) / chunkSize).cast("int")),
            i => substring(col("content"), (i * chunkSize + 1).cast("int"), lit(chunkSize))))
          .otherwise(array().cast("array<binary>")))
        .as(Seq("seq", "value")))
      .select(col("seq").cast("long").as("seq"), col("value"))
      .as[Elem[Array[Byte]]])
  }

  /** sourceHandle (reference `Combinators.hs:280-288`): a binary stream as
    * chunks. One chunk per file via the binaryFile source; seq = file order.
    */
  def binaryChunks(spark: SparkSession, pathGlob: String): SStream[Array[Byte]] = {
    implicit val e: Encoder[Elem[Array[Byte]]] = Elem.enc[Array[Byte]]
    val df = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
    val ordered = graft.operators.RowExec.withDenseSeq(df, Seq(col("path")))
    SStream(ordered.select(col("seq"), col("content").as("value"))
      .as[Elem[Array[Byte]]])
  }
}
