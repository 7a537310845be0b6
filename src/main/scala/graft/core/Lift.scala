package graft.core

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql._
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The effect-context layer — the port of `Data.Conduino.Lift`
  * (reference `src/Data/Conduino/Lift.hs`). conduino runs pipes over a
  * transformer stack; the distributed analogs (SURVEY.md §2.9):
  *
  *  - writerP (`Lift.hs:359-467`) → Spark accumulators: a monoidal log
  *    accumulated task-side, readable after the action completes (same
  *    caveat as the reference's "emitted once on termination",
  *    `Lift.hs:350-357` — and additionally at-least-once under task
  *    retry, the documented Spark relaxation);
  *  - readerP (`Lift.hs:324-343`) → broadcast environment: `runReaderP`
  *    supplies the environment to one pipeline stage;
  *  - exceptP / catchP (`Lift.hs:198-315`) → dead-letter side outputs:
  *    a failing element short-circuits ITS OWN row into the dead-letter
  *    stream instead of killing the query (`runExceptP` isolates failure
  *    to a stage and returns Either — here both branches are streams);
  *  - stateP (`Lift.hs:116-188`) → operator-local state is already native
  *    (scan/mapAccum fold state; GroupState in streaming); a *shared
  *    global* mutable state has no sane distributed analog and stays
  *    driver-side (documented scope boundary).
  */
object Lift {

  /** writerP: accumulate `weight(a)` into `acc` for every element passing
    * through; the element is passed on unchanged (the Writer effect of
    * `Lift.hs:359-380`, with the accumulator as the monoid).
    *
    * AT-LEAST-ONCE: Spark re-executes transformations (range-partition
    * sampling passes, task retries, recomputation of unpersisted
    * lineage), and transformation-side accumulators count every
    * execution. Use this for metrics/progress; use [[runWriter]] when the
    * log must be exact.
    */
  def writerPipe[A: TypeTag](acc: LongAccumulator)(weight: A => Long): Pipe[A, A] =
    Pipes.mapM[A, A] { a => acc.add(weight(a)); a }

  /** runWriterP: run a sink over the stream and return (result, log) —
    * the log is total only after the action finishes (`Lift.hs:405-420`).
    * Exact: the log is a second aggregate over the shared cached stream
    * (one extra scan of cached data), not an effect count.
    */
  def runWriter[A: TypeTag, R](spark: SparkSession, weight: A => Long)
                              (sink: Sink[A, R])(in: SStream[A]): (R, Long) = {
    val shared = in.cache()
    val r = sink(shared)
    val logged = shared.into(
      Sinks.foldlCombine(0L)((b: Long, a: A) => b + weight(a))(_ + _))
    shared.unpersist() // both passes done; free the pinned blocks
    (r, logged)
  }

  /** readerP/runReaderP: build a pipe from a broadcast environment —
    * the environment ships once per executor, not per task closure.
    */
  def readerPipe[R, A, B: TypeTag](env: Broadcast[R])(f: (R, A) => B): Pipe[A, B] =
    Pipes.map[A, B](a => f(env.value, a))

  def runReader[R: scala.reflect.ClassTag](spark: SparkSession, env: R): Broadcast[R] =
    spark.sparkContext.broadcast(env)

  /** exceptP/runExceptP: apply a failable projection; failures become
    * dead-letter rows `(input, error)` instead of query failure. The
    * shared `Try` pass is materialized ONCE (persist → checkpoint →
    * unpersist, the RowExec lifecycle) and both branches are narrow
    * filtered views over the checkpointed blocks — `f` runs exactly once
    * per element and no cache outlives the call. EAGER: the pass runs at
    * call time (like every RowExec/OrderedExec operator), not at first
    * branch consumption — callers composing lazily should use
    * [[runExceptC]], which stays a pure plan.
    */
  def runExcept[A: TypeTag, B: TypeTag](f: A => Either[String, B])(
      in: SStream[A]): (SStream[B], SStream[(A, String)]) = {
    implicit val encE: Encoder[Elem[(A, Option[B], Option[String])]] =
      Elem.enc[(A, Option[B], Option[String])]
    implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
    implicit val encD: Encoder[Elem[(A, String)]] = Elem.enc[(A, String)]
    val tried = SStream(Materialize.checkpoint(in.ds.map { e =>
      f(e.value) match {
        case Right(b)  => Elem(e.seq, (e.value, Option(b), Option.empty[String]))
        case Left(err) => Elem(e.seq, (e.value, Option.empty[B], Option(err)))
      }
    }))
    val good = SStream(tried.ds
      .filter((e: Elem[(A, Option[B], Option[String])]) => e.value._2.isDefined)
      .map(e => Elem(e.seq, e.value._2.get)))
    val dead = SStream(tried.ds
      .filter((e: Elem[(A, Option[B], Option[String])]) => e.value._3.isDefined)
      .map(e => Elem(e.seq, (e.value._1, e.value._3.get))))
    (good, dead)
  }

  /** catchP: like runExcept but catching exceptions thrown by `f`
    * (`Lift.hs:284-315` — task-failure isolation at element granularity).
    */
  def runCatch[A: TypeTag, B: TypeTag](f: A => B)(
      in: SStream[A]): (SStream[B], SStream[(A, String)]) =
    runExcept[A, B] { a =>
      try Right(f(a))
      catch { case scala.util.control.NonFatal(e) => Left(e.toString) }
    }(in)

  /** Columnar exceptP (`Lift.hs:198-283` re-expressed for Catalyst): the
    * failable projection is given as Columns — `value` computes the
    * result (NULL when unparseable, e.g. via `try_cast`/`try_divide`) and
    * `error(value)` yields the dead-letter label (NULL = success). Both
    * branches are filtered projections over one shared select: no JVM
    * closure, no cache, full whole-stage codegen, and the branch filters
    * can still push down toward the scan. Prefer this whenever the
    * projection is SQL-expressible; [[runExcept]]/[[runCatch]] remain for
    * genuinely opaque functions.
    *
    * Returns (good, dead): good keeps the input columns plus `value`;
    * dead keeps the input columns plus `error`. `value`/`error` are
    * RESERVED output names: a pre-existing input column of either name
    * is REPLACED by the branch's output (the Elem convention's own
    * payload column is the usual thing being parsed — without the
    * replace, the rename would produce two `value` columns and the next
    * `col("value")` would die with AMBIGUOUS_REFERENCE).
    */
  def runExceptC(in: DataFrame, value: Column)(error: Column => Column)
      : (DataFrame, DataFrame) = {
    val tried = in.withColumn("__graft_value", value)
      .withColumn("__graft_err", error(col("__graft_value")))
    val good = tried.filter(col("__graft_err").isNull)
      .drop("__graft_err").drop("value")
      .withColumnRenamed("__graft_value", "value")
    val dead = tried.filter(col("__graft_err").isNotNull)
      .drop("__graft_value").drop("error")
      .withColumnRenamed("__graft_err", "error")
    (good, dead)
  }

  /** stateP (`Lift.hs:116-188`): per-stage sequential state is exactly
    * `Pipes.mapAccum`; this alias names the correspondence.
    */
  def statePipe[A, S, B: TypeTag](s0: S)(f: (A, S) => (S, B)): Pipe[A, B] =
    Pipes.mapAccum[A, S, B](s0)(f)

  /** runStateP/execStateP: run a state-threading pipe over the stream and
    * return (outputs, final state) — the final state recovered from the
    * last output (`Lift.hs:128-150`).
    */
  def runState[A: TypeTag, S: TypeTag](s0: S)(step: (S, A) => S)(
      in: SStream[A]): (SStream[S], S) = {
    // checkpoint, not cache: eager + GC-reclaimable, so the `last` pass
    // and the caller's consumption read materialized blocks and no
    // explicit cache outlives the call
    val outs = SStream(Materialize.checkpoint((in |> Pipes.scan[A, S](s0)(step)).ds))
    (outs, outs.into(Sinks.last[S]).getOrElse(s0))
  }

  /** rwsP (`Lift.hs:483-590`): Reader+Writer+State combined — broadcast
    * env in, exact monoidal log out, sequential state threaded through.
    */
  def runRWS[R: scala.reflect.ClassTag, A: TypeTag, S: TypeTag, B: TypeTag](
      spark: SparkSession, env: R, weight: A => Long, s0: S)(
      f: (R, A, S) => (S, B))(in: SStream[A]): (SStream[B], Long, S) = {
    val benv = runReader(spark, env)
    val shared = in.cache()
    val logged = shared.into(
      Sinks.foldlCombine(0L)((b: Long, a: A) => b + weight(a))(_ + _))
    implicit val encSB: Encoder[Elem[(S, B)]] = Elem.enc[(S, B)]
    // checkpoint (eager) the state-threaded pass, then the shared cache
    // has served both its consumers — release it
    val outsSB = SStream(Materialize.checkpoint(
      (shared |> Pipes.mapAccum[A, S, (S, B)](s0) { (a, s) =>
        val (s2, b) = f(benv.value, a, s); (s2, (s2, b))
      }).ds))
    shared.unpersist()
    implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
    val outs = SStream(outsSB.ds.map(e => Elem(e.seq, e.value._2)))
    val finalS = outsSB.into(Sinks.last[(S, B)]).map(_._1).getOrElse(s0)
    (outs, logged, finalS)
  }
}
