package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** KEYED stateful streaming funnel — the sharded deployment form of
  * [[graft.operators.Behavior.funnel]]: a per-user stage machine on
  * `transformWithState`, state = (current stage, its event time). This
  * is the per-KEY arbitrary-state shape the single-key pipes
  * ([[StreamPipes]] scaladoc: "keyed deployments shard first") promise:
  * `groupByKey(user)` shards the state across the cluster, every user's
  * machine advances independently, and state per key is two fields —
  * the 100 TB funnel, since neither events nor users ever concentrate
  * on one task.
  *
  * Semantics equivalence with the batch min-chain (the oracle): rows
  * must arrive in event-time order per key (the feeder's contract here,
  * a watermark+sort upstream in production). Processing in ascending
  * time makes "first qualifying transition" ≡ "min qualifying time" —
  * the batch definition; the strict `ts > tStage` comparison reproduces
  * the min-chain's strictly-after rule, including the equal-timestamp
  * tie (a stage event at exactly the previous stage's time is excluded
  * in both forms regardless of within-batch processing order).
  *
  * Output: one row per stage ADVANCEMENT (user_id, stage, t_us) —
  * the change-stream form; the final per-user depth is
  * `max(stage) GROUP BY user_id` over the sink, which consumers (and
  * the harness query) apply downstream.
  */
object KeyedFunnel {

  private class FunnelProcessor(stages: Array[String], encS: Encoder[(Int, Long)])
    extends StatefulProcessor[Long, (Long, String, Long), (Long, Int, Long)] {

    @transient private var st: ValueState[(Int, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Int, Long)]("graft_funnel", encS, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
                                 tv: TimerValues): Iterator[(Long, Int, Long)] = {
      var (stage, t) = if (st.exists()) st.get() else (0, Long.MinValue)
      // force before updating state (iterators are lazy); sort restores
      // event-time order within the batch for this key
      val out = rows.toSeq.sortBy(_._3).flatMap { case (_, typ, ts) =>
        if (stage < stages.length && typ == stages(stage) && ts > t) {
          stage += 1; t = ts
          Seq((key, stage, ts))
        } else Nil
      }
      st.update((stage, t))
      out.iterator
    }
  }

  /** The streaming plan: rows (user_id, event_type, t_us) → stage
    * advancements (user_id, stage, t_us), state sharded by user.
    */
  def advance(ds: Dataset[(Long, String, Long)], stages: Seq[String]): DataFrame = {
    implicit val encKey: Encoder[Long] = Encoders.scalaLong
    implicit val encOut: Encoder[(Long, Int, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Int, Long)]()
    val encS: Encoder[(Int, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Long)]().resolveAndBind()
    ds.groupByKey(_._1)
      .transformWithState(new FunnelProcessor(stages.toArray, encS),
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "stage", "t_us")
  }
}
