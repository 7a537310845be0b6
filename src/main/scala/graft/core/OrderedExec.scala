package graft.core

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Distributed execution of order-sensitive operators.
  *
  * The reference's stateful combinators (scan/mapAccum/pairs/consecutive,
  * reference `src/Data/Conduino/Combinators.hs:344-410`) are sequential by
  * nature. A naive Spark port would single-partition the stream. Instead,
  * the engine uses two scale-friendly schemes:
  *
  *  1. '''Prefix-combine scan''' (for folds whose accumulator merges):
  *     range-partition by `seq`, fold each partition in parallel, collect
  *     the numPartitions partial accumulators (not rows!) to the driver,
  *     prefix-combine them into per-partition carry-in offsets, broadcast,
  *     and finish each partition locally. Two parallel passes, O(P) driver
  *     work. This is the classic parallel-prefix-sum on top of Spark.
  *
  *  2. '''Boundary exchange''' (for bounded-lookback ops — pairs, sliding
  *     windows of n): each partition only needs the last n elements of its
  *     predecessor. Collect the tiny per-partition tails, broadcast, and
  *     prepend the carry on a single parallel pass.
  *
  * Both avoid any global sort to one partition; the only serial state is
  * O(numPartitions) on the driver.
  */
private[graft] object OrderedExec {

  /** Range-partition by seq + sort within partitions; persisted because
    * callers run a small boundary/partial job plus the main job over it.
    */
  def sorted[A](ds: Dataset[Elem[A]], parts: Int = 0): Dataset[Elem[A]] = {
    val p =
      if (parts > 0) parts
      else ds.sparkSession.sessionState.conf.numShufflePartitions
    ds.repartitionByRange(p, col("seq")).sortWithinPartitions(col("seq"))
  }

  /** Running fold with mergeable accumulators: emits the accumulator after
    * every element (conduino `scan`, reference `Combinators.hs:362-371`).
    * Requires `combine` to be the monoid-homomorphism merge of `step`
    * (fold(xs ++ ys) == combine(fold(xs), fold(ys))).
    */
  def scanCombine[A, B: TypeTag](in: Dataset[Elem[A]], zero: B,
                                 step: (B, A) => B,
                                 combine: (B, B) => B): Dataset[Elem[B]] = {
    val spark = in.sparkSession
    implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
    val s = sorted(in).persist()
    // toList before sortBy/map: avoids needing a ClassTag[B] for Array ops
    val partials = s.rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.foldLeft(zero)((b, e) => step(b, e.value))))
      }
      .collect().toList.sortBy(_._1).map(_._2)
    // carry-in for partition i = combine of partials 0..i-1
    val carries = partials.scanLeft(zero)(combine).toVector
    val bCarries = spark.sparkContext.broadcast(carries)
    val rdd = s.rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bCarries.value(i)
      it.map { e => acc = step(acc, e.value); Elem(e.seq, acc) }
    }
    // Materialize, then free the sorted intermediate (persist lifecycle).
    val out = Materialize.checkpoint(spark.createDataset(rdd))
    s.unpersist()
    out
  }

  /** Boundary exchange: run `f(carryIn, partitionElems)` over each sorted
    * partition, where carryIn is the last `tailN` elements globally before
    * the partition. Returns the transformed stream plus the global tail
    * (last ≤ tailN elements of the whole stream) for finalizers.
    */
  def mapWithCarry[A, B: TypeTag](in: Dataset[Elem[A]], tailN: Int)(
      f: (List[Elem[A]], Iterator[Elem[A]]) => Iterator[Elem[B]])
      : (Dataset[Elem[B]], List[Elem[A]]) = {
    require(tailN >= 0)
    val spark = in.sparkSession
    implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
    val s = sorted(in).persist()
    val tails: Array[(Int, List[Elem[A]])] = s.rdd
      .mapPartitionsWithIndex { (i, it) =>
        // last ≤ tailN elements of this partition, cheaply (ring buffer)
        val buf = new scala.collection.mutable.ArrayDeque[Elem[A]]()
        it.foreach { e =>
          buf.append(e); if (buf.size > tailN) buf.removeHead()
        }
        Iterator((i, buf.toList))
      }
      .collect().sortBy(_._1)
    // carry-in for partition i = last tailN of concat(tails of 0..i-1);
    // valid because each tail keeps at least the globally-needed suffix.
    val carries = new Array[List[Elem[A]]](tails.length + 1)
    carries(0) = Nil
    var acc: List[Elem[A]] = Nil
    tails.foreach { case (i, t) =>
      acc = (acc ++ t).takeRight(tailN)
      carries(i + 1) = acc
    }
    val globalTail = acc
    val bCarries = spark.sparkContext.broadcast(carries)
    val rdd = s.rdd.mapPartitionsWithIndex { (i, it) =>
      f(bCarries.value(i), it)
    }
    val out = Materialize.checkpoint(spark.createDataset(rdd))
    s.unpersist()
    (out, globalTail)
  }

  /** Sequential fallback for arbitrary (non-mergeable) state transitions:
    * one sorted partition, one pass. Correct for any closure; only for
    * small streams or when the user's function genuinely cannot merge.
    */
  def mapOrderedSequential[A, B: TypeTag](in: Dataset[Elem[A]])(
      f: Iterator[Elem[A]] => Iterator[Elem[B]]): Dataset[Elem[B]] = {
    implicit val encB: Encoder[Elem[B]] = Elem.enc[B]
    in.repartitionByRange(1, col("seq"))
      .sortWithinPartitions(col("seq"))
      .mapPartitions(f)
  }
}
