package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.ColOps

/** Streaming table maintenance: latest-wins upsert of each micro-batch
  * into a maintained snapshot — `foreachBatch` + [[ColOps.mergeLatest]],
  * the Structured Streaming production pattern for keeping a corpus
  * snapshot current from a change stream (new crawls upsert, takedowns
  * tombstone) without stateful streaming aggregation: the state lives
  * in the TABLE, not the state store, so it survives query restarts and
  * is readable by any batch consumer mid-stream.
  *
  * This local form holds the snapshot as a lineage-truncated DataFrame
  * ([[graft.core.Materialize.checkpoint]] per merge — without the cut,
  * plan depth grows linearly in batches and planning cost quadratically);
  * a cluster deployment swaps the holder for a transactional table
  * format's MERGE (the operator and semantics are unchanged — that is
  * the point of proving the merge operator once, batch-side).
  *
  * Within-batch duplicates of a key are resolved by the same
  * highest-version rule (mergeLatest's window sees batch ∪ snapshot),
  * so feeding [u@v1, u@v2] in ONE batch equals feeding them in two.
  */
final class UpsertSnapshot(key: String, version: String) {
  @volatile private var snap: Option[DataFrame] = None

  /** Merge one micro-batch of updates (the foreachBatch body). The
    * reliable-vs-local checkpoint choice follows the session's
    * `spark.graft.reliableCheckpoint` conf, like every materialization
    * in the library.
    */
  def merge(batch: DataFrame): Unit = synchronized {
    // the FIRST batch must run through mergeLatest too (against an empty
    // base): a raw batch can carry several versions of one key, and
    // storing it unresolved would violate the batch-equivalence contract
    val base = snap.getOrElse(batch.toDF().limit(0))
    snap = Some(graft.core.Materialize.checkpoint(
      ColOps.mergeLatest(base, batch.toDF(), key, version)))
  }

  /** The current maintained table (None before the first batch). */
  def snapshot: Option[DataFrame] = snap
}
