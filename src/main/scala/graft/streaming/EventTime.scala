package graft.streaming

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarks — the
  * `readStream → transform → window → agg → writeStream` shape.
  *
  * The reference is purely arrival-ordered (time never appears in its
  * API — SURVEY.md §2.10), so this is an EXTENSION operator for the
  * training-data-pipeline surface: sessionized/windowed statistics over
  * the events table at 100 TB run exactly like this, with the watermark
  * bounding state and late data dropped deterministically.
  */
object EventTime {

  /** Tumbling-window aggregation. Works on both batch and streaming
    * DataFrames (same plan; streaming adds watermark-driven state
    * eviction and append-mode emission on window close).
    */
  def tumbling(events: DataFrame, tsCol: String, watermarkDelay: String,
               windowDur: String, aggExprs: Seq[Column]): DataFrame =
    // a tumbling window IS the slide == duration special case
    sliding(events, tsCol, watermarkDelay, windowDur, windowDur, aggExprs)

  /** Sliding-window aggregation: each event contributes to every window
    * of length `windowDur` that covers it, one starting every `slideDur`
    * (dur/slide windows per event — the fan-out happens inside Spark's
    * `window()` generator, no self-join).
    */
  def sliding(events: DataFrame, tsCol: String, watermarkDelay: String,
              windowDur: String, slideDur: String, aggExprs: Seq[Column]): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay) else events
    src.groupBy(window(col(tsCol), windowDur, slideDur))
      .agg(aggExprs.head, aggExprs.tail: _*)
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("*")).drop("window")
  }

  /** Session-window aggregation per key: a session closes after `gapDur`
    * of inactivity (Spark's native `session_window` — state bounded by
    * the watermark in streaming mode; in batch mode the same plan runs as
    * a merge of overlapping candidate sessions).
    *
    * `preAggFilter` (applied AFTER the watermark, before the grouping)
    * exists for sentinel-closure of append-mode streams: rows excluded
    * from the aggregation whose event times still advance the watermark.
    * It must reference the event-time column — Catalyst pushes any
    * predicate NOT referencing the watermark attribute below the
    * EventTimeWatermark node, where it would stop advancing the
    * watermark (see q_event_session_stream).
    */
  def session(events: DataFrame, tsCol: String, keyCol: String,
              watermarkDelay: String, gapDur: String, aggExprs: Seq[Column],
              preAggFilter: Option[Column] = None): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay) else events
    val kept = preAggFilter.fold(src)(src.filter)
    kept.groupBy(col(keyCol), session_window(col(tsCol), gapDur))
      .agg(aggExprs.head, aggExprs.tail: _*)
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("*"))
      .drop("session_window")
  }
}
