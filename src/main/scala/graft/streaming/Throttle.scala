package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Keyed streaming rate throttle — ingestion admission control: at most
  * `k` events pass per (key, time-bucket); the rest drop. The
  * per-source/per-user flood guard every ingest pipeline needs (a crawl
  * burst, a runaway client) — enforced IN the stream, so downstream
  * state stores and sinks never see the flood at all.
  *
  * Shape: `groupByKey((key, bucket))` + `transformWithState`, state =
  * ONE int (the admitted count) per in-flight (key, bucket) — the
  * minimum conceivable state for the contract. Neither keys nor buckets
  * concentrate on one task, so the throttle shards like the keyed
  * funnel ([[KeyedFunnel]]). In production the state carries a TTL of a
  * few bucket widths (TTLConfig; closed buckets never admit again by
  * time-ordering) so state stays bounded by ACTIVE keys; the proof
  * harness runs TimeMode.None with a bounded feed.
  *
  * Equivalence with the batch form ([[graft.operators.Sampling.throttle]],
  * the oracle): rows arrive per key in (t, id) order across batches
  * (the feeder's contract; a watermark+sort upstream in production),
  * and the within-batch sort below restores it inside each quantum, so
  * "first k admitted" ≡ "rank ≤ k by (t, id)" — the batch definition —
  * under ANY micro-batch split.
  */
object Throttle {

  private class ThrottleProcessor(k: Int, encS: Encoder[Int])
    extends StatefulProcessor[(Long, Long), (Long, Long, Long, Long), (Long, Long, Long, Long)] {

    @transient private var st: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Int]("graft_throttle", encS, TTLConfig.NONE)

    override def handleInputRows(key: (Long, Long),
                                 rows: Iterator[(Long, Long, Long, Long)],
                                 tv: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      var n = if (st.exists()) st.get() else 0
      // force before updating state (iterators are lazy); sort restores
      // (t, id) order within the batch for this (key, bucket)
      val out = rows.toSeq.sortBy(r => (r._3, r._4)).flatMap { case (u, b, _, id) =>
        if (n < k) { n += 1; Seq((id, u, b, n.toLong)) } else Nil
      }
      st.update(n)
      out.iterator
    }
  }

  /** The streaming plan: rows (key, bucket, t, id) → admitted rows
    * (id, key, bucket, rk ∈ 1..k), state sharded by (key, bucket).
    */
  def admit(ds: Dataset[(Long, Long, Long, Long)], k: Int): DataFrame = {
    require(k > 0, "Throttle.admit: k must be positive")
    implicit val encKey: Encoder[(Long, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]()
    implicit val encOut: Encoder[(Long, Long, Long, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Long, Long)]()
    val encS: Encoder[Int] = Encoders.scalaInt
    ds.groupByKey(r => (r._1, r._2))
      .transformWithState(new ThrottleProcessor(k, encS),
        TimeMode.None(), OutputMode.Append())
      .toDF("event_id", "user_id", "bucket", "rk")
  }
}
