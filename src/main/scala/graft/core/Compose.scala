package graft.core

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Multi-stream composition — the reference's "join/union layer"
  * (SURVEY.md §2.7). conduino has no keyed relational joins; its
  * multi-stream forms are positional (zip) and sequential (concat), which
  * map to Spark joins/unions on the `seq` ordinal.
  */
object Compose {

  /** Re-rank a stream to dense ordinals 0..n-1 (needed before positional
    * joins when seqs are sparse).
    *
    * ADAPTIVE: first a narrow density probe — partial-agg min/max/count
    * plus one exact countDistinct shuffle of 8-byte seqs — and only rank
    * when the seqs are NOT already 0..n-1. Sources built from keyed
    * tables / fromSeq are usually dense, and the probe is far cheaper
    * than the rank machinery (full-row range shuffle + boundary job +
    * stamp + materialize) it then skips. countDistinct is required:
    * min=0 ∧ max=n-1 alone admits duplicate-plus-gap multisets.
    */
  def dense[A: TypeTag](in: SStream[A]): SStream[A] = {
    implicit val encEE: Encoder[Elem[Elem[A]]] = Elem.enc[Elem[A]]
    implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
    val r = in.ds.toDF().agg(
      count(lit(1)), coalesce(min(col("seq")), lit(0L)),
      coalesce(max(col("seq")), lit(-1L)), countDistinct(col("seq"))).head()
    val (n, mn, mx, nd) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    if (n == 0 || (mn == 0L && mx == n - 1 && nd == n)) in
    else {
      val ranked = Ordinals.zipWithOrdinal(in.ds, Seq(col("seq")))
      SStream(ranked.map(e => Elem(e.seq, e.value.value)))
    }
  }

  /** zipSource (reference `src/Data/Conduino.hs:512-521`): run two sources
    * in lockstep, pair their outputs positionally, end at the shorter —
    * an inner equi-join on the dense ordinal (sort-merge/shuffled-hash by
    * Catalyst; ends at the shorter side automatically).
    */
  def zipSources[A: TypeTag, B: TypeTag](sa: SStream[A], sb: SStream[B]): SStream[(A, B)] = {
    implicit val encO: Encoder[Elem[(A, B)]] = Elem.enc[(A, B)]
    val da = dense(sa).ds
    val db = dense(sb).ds
    SStream(
      da.joinWith(db, da("seq") === db("seq"), "inner")
        .map { case (x, y) => Elem(x.seq, (x.value, y.value)) })
  }

  /** ZipSource's general Applicative (reference `src/Data/Conduino.hs:
    * 507-521`): positional zip through an arbitrary combiner — liftA2,
    * which carries the whole applicative surface here: Catalyst cannot
    * encode function-VALUED datasets, so `fs <*> xs` is expressed by
    * fusing the function construction into `f` (any `<*>` chain
    * rewrites to a zipWith of the underlying data sources). Ends at the
    * shorter side exactly as the reference's lockstep pull does.
    */
  def zipSourcesWith[A: TypeTag, B: TypeTag, C: TypeTag](
      sa: SStream[A], sb: SStream[B])(f: (A, B) => C): SStream[C] = {
    implicit val encC: Encoder[Elem[C]] = Elem.enc[C]
    SStream(zipSources(sa, sb).ds.map(e => Elem(e.seq, f(e.value._1, e.value._2))))
  }

  /** ZipSource's Alternative `<|>` (reference `src/Data/Conduino.hs:
    * 491-533`): exhaust the left source, then the right — UNION ALL with
    * the right side's ordinals offset past the left's maximum. The offset
    * is a lazy 1-row aggregate broadcast into the plan (no driver action).
    */
  def concatSources[A: TypeTag](sa: SStream[A], sb: SStream[A]): SStream[A] = {
    implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
    val off = sa.ds.toDF().agg(
      (coalesce(max(col("seq")), lit(-1L)) + 1L).as("off"))
    // fail LOUDLY on a negative right-side seq (Ordinals.byExpression
    // permits sparse/negative ordinals): a negative seq would shift to
    // ≤ max(left.seq) — interleaving into, or colliding with, the left
    // side silently. In-plan raise_error keeps construction lazy
    // (concatMap fails fast the same way for its packable range).
    val shifted = sb.ds.toDF().crossJoin(broadcast(off))
      .select(
        when(col("seq") < 0,
          raise_error(lit("concatSources: right side has a negative seq — " +
            "shifted ordinals would collide with the left side")))
          .otherwise(col("seq") + col("off")).cast("long").as("seq"),
        col("value"))
      .as[Elem[A]]
    SStream(sa.ds.union(shifted))
  }

  /** fuseBoth / `&|` (reference `src/Data/Conduino.hs:342-355,386-388`):
    * run the chain and return BOTH the downstream sink's result and the
    * upstream's terminal result. The upstream result is computed by its
    * own sink over the shared (cached) upstream — one extra scan over
    * cached data, matching SURVEY §2.7's plan.
    */
  def fuseBoth[A, B, RU, RD](p: Pipe[A, B], upRes: Sink[A, RU], down: Sink[B, RD])
      (in: SStream[A]): (RD, RU) = {
    val shared = in.cache()
    // sinks materialize their result (§2.6 contract), so by here both
    // passes over the shared cache are done — release it (the pinned
    // blocks would otherwise evict working memory at scale)
    val rd = down(p(shared))
    val ru = upRes(shared)
    shared.unpersist()
    (rd, ru)
  }

  /** fuseUpstream / `|.` (reference `src/Data/Conduino.hs:372-378`):
    * run the chain for effect, keep the upstream's result only.
    */
  def fuseUpstream[A, B, RU](p: Pipe[A, B], upRes: Sink[A, RU], down: Sink[B, _])
      (in: SStream[A]): RU = fuseBoth(p, upRes, down)(in)._2

  /** fuseBothMaybe (reference `src/Data/Conduino.hs:362-367`): upstream
    * result as Some only if the upstream was fully drained. A batch
    * pipeline always drains its (finite) upstream unless the downstream is
    * a terminating PrefixPipe that cuts before end-of-stream.
    */
  def fuseBothMaybe[A: TypeTag, B, RU, RD](p: PrefixPipe[A, B], upRes: Sink[A, RU],
                                           down: Sink[B, RD])(in: SStream[A]): (RD, Option[RU]) = {
    val shared = in.cache()
    val rd = down(p(shared))
    val cut = p.cut(shared).head().getLong(0)
    val lastSeq = shared.ds.toDF()
      .agg(coalesce(max(col("seq")), lit(Long.MinValue))).head().getLong(0)
    val drained = cut == Long.MaxValue || cut >= lastSeq
    val res = (rd, if (drained) Some(upRes(shared)) else None)
    shared.unpersist() // all passes over the shared cache are complete
    res
  }

  /** unconsZipSource (reference `src/Data/Conduino.hs:596-603`): pop the
    * first element, return it plus the rest of the stream.
    */
  def uncons[A: TypeTag](in: SStream[A]): (Option[A], SStream[A]) = {
    implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
    val first = in.ds.orderBy(col("seq")).head(1).headOption
    val rest = first match {
      case Some(e) => SStream(in.ds.filter(col("seq") > lit(e.seq)))
      case None    => in
    }
    (first.map(_.value), rest)
  }

  /** withSource / genSource (reference `src/Data/Conduino.hs:570-591`):
    * consume a source with a callback, in order — the foreach-style
    * boundary out of the engine.
    */
  def foreachOrdered[A](in: SStream[A])(f: A => Unit): Unit =
    in.toLocalIterator.foreach(f)

  /** feedbackPipe (reference `src/Data/Conduino.hs:429-434`): loop a
    * pipe's output back to its own input; every output also goes
    * downstream. No Catalyst representation exists for a cyclic plan, so
    * this is a driver-side fixed-point loop (SURVEY.md §4.4): round k
    * feeds round k-1's output, each round localCheckpointed to truncate
    * lineage; stops when a round yields nothing or maxRounds is reached.
    *
    * Output ordering: ROUND-MAJOR (BFS) — all of round k's outputs before
    * round k+1's, each round re-ranked to dense ordinals and the round
    * number packed into the high bits. This is a documented deviation from
    * the reference's depth-first interleaving (`Data/Conduino.hs:429-434`):
    * a distributed engine processes a whole frontier per pass, and any
    * fixed per-round bit-shift scheme silently overflows after a few
    * rounds (the round-1 bug). Range-guarded: up to 2^22 rounds of up to
    * 2^40 elements each, fail-fast beyond.
    */
  /** Frontiers at or below this size are re-ranked on the driver instead
    * of the distributed dense-rank (three extra jobs) — feedback
    * frontiers usually shrink geometrically, so most rounds of most
    * loops take the fast path; large frontiers keep the fully
    * distributed one.
    */
  private val SmallFrontier = 65536

  private val FeedbackSeqBits = 40

  /** One feedback round → (renumbered output, its size), or (null, 0)
    * when the round produced nothing (loop termination).
    *
    * `prevCount` is the size of the round's INPUT frontier (-1 when
    * unknown, i.e. the first round). When the input was small, the
    * round's output is collected directly — ONE Spark job per round (the
    * pipe executes exactly once, inside the collect; re-rank and count
    * are driver-local on the collected array). Feedback frontiers
    * usually shrink geometrically, so after the first round most loops
    * pay a single job per round instead of the former
    * checkpoint+count+collect three. Large frontiers keep the fully
    * distributed checkpoint + dense-rank path.
    */
  /** Cap on rows a feedback round may pull to the driver via the
    * small-frontier fast path (the limit(cap+1) overflow probe).
    */
  private val OutputCollectCap = 1 << 20

  private def feedbackRound[A: TypeTag](rawOut: Dataset[Elem[A]], round: Long,
                                        prevCount: Long)
      (implicit encA: Encoder[Elem[A]]): (Dataset[Elem[A]], Long) = {
    val spark = rawOut.sparkSession
    def fromCollected(collected: Array[Elem[A]]): (Dataset[Elem[A]], Long) =
      (spark.createDataset(collected.toIndexedSeq.zipWithIndex.map { case (e, i) =>
        Elem((round << FeedbackSeqBits) | i.toLong, e.value)
      }), collected.length.toLong)
    def distributed(): (Dataset[Elem[A]], Long) = {
      val mat = Materialize.checkpoint(rawOut)
      val cnt = mat.count()
      if (cnt == 0) (null, 0L)
      else if (cnt <= SmallFrontier) fromCollected(mat.collect().sortBy(_.seq))
      else {
        require(cnt < (1L << FeedbackSeqBits),
          s"feedbackPipe: round $round produced more than 2^$FeedbackSeqBits elements")
        (Materialize.checkpoint(dense(SStream(mat)).ds
          .map(e => Elem((round << FeedbackSeqBits) | e.seq, e.value))), cnt)
      }
    }
    if (prevCount >= 0 && prevCount <= SmallFrontier) {
      // bound the driver collect: a small INPUT does not bound the OUTPUT
      // (the pipe may fan out), so collect through limit(cap+1) — if the
      // cap+1-th row exists the round is too big for the driver; fall
      // back to the distributed path (re-running the deterministic pipe,
      // a rare one-off on the transition)
      val probe = rawOut.limit(OutputCollectCap + 1).collect()
      if (probe.isEmpty) (null, 0L)
      else if (probe.length <= OutputCollectCap) fromCollected(probe.sortBy(_.seq))
      else distributed()
    } else distributed()
  }

  /** feedbackPipe is the tag-blind special case of
    * [[feedbackPipeEither]]: strip the fromUpstream flag and run `p` —
    * ONE round loop to maintain (the round-numbering and
    * small-frontier fixes previously had to land in two copies).
    */
  def feedbackPipe[A: TypeTag](p: Pipe[A, A], maxRounds: Int = 100)
                              (in: SStream[A]): SStream[A] =
    feedbackPipeEither[A](Pipes.mapInput[(Boolean, A), A, A](_._2)(p), maxRounds)(in)

  /** feedbackPipeEither (reference `src/Data/Conduino.hs:445-462`): the
    * feedback loop where the pipe can distinguish upstream input from
    * fed-back input. Spark has no `Either` encoder, so the tag is a
    * Boolean: `(fromUpstream, value)` — `(true, x)` ≡ the reference's
    * `Left x` (fresh upstream), `(false, x)` ≡ `Right x` (fed back).
    * Same round-major loop and range guards as [[feedbackPipe]].
    */
  def feedbackPipeEither[A: TypeTag](p: Pipe[(Boolean, A), A], maxRounds: Int = 100)
                                    (in: SStream[A]): SStream[A] = {
    implicit val encA: Encoder[Elem[A]] = Elem.enc[A]
    implicit val encT: Encoder[Elem[(Boolean, A)]] = Elem.enc[(Boolean, A)]
    require(maxRounds >= 1 && maxRounds < (1 << 22),
      s"feedbackPipeEither: maxRounds $maxRounds out of range [1, 2^22)")
    var acc: Dataset[Elem[A]] = null
    var frontier = in.ds
    var prevCount = -1L
    var fromUpstream = true
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val up = fromUpstream
      val tagged = SStream(frontier.map(e => Elem(e.seq, (up, e.value))))
      val (out, cnt) = feedbackRound(p(tagged).ds, round.toLong + 1, prevCount)
      if (out == null) done = true
      else {
        acc = if (acc == null) out else acc.union(out)
        frontier = out
        prevCount = cnt
        fromUpstream = false
        round += 1
      }
    }
    SStream(if (acc == null) in.ds.filter(lit(false)) else acc)
  }
}
