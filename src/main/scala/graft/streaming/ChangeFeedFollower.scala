package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType
import graft.sinks.SnapshotStore

/** Poll-based change-feed follower over a [[SnapshotStore]] — the
  * consumer loop on top of the per-commit history
  * ([[SnapshotStore.readChangesEach]] is the batch face; this drives
  * it with version anchoring).
  *
  * Exactly-once contract (the EP2 anchor pattern): the caller persists
  * the returned anchor atomically with its own side effects; after a
  * crash it resumes from the last persisted anchor and REPLAYS the
  * commits since — so `apply` must be idempotent per commit (a keyed
  * upsert/delete apply is; appending blindly is not). Commits are
  * delivered strictly in version order, one DataFrame per commit, so a
  * consumer folding deltas (an incremental view, a downstream CDC
  * sink) sees every intermediate state exactly as it was committed.
  *
  * A Structured Streaming source is deliberately NOT the shape here:
  * each commit's delta is itself a distributed join
  * ([[SnapshotStore.readChangesBetween]]), which a DSv2 partition
  * reader cannot run — the poll loop hands whole DataFrames to
  * `foreachBatch`-style user code instead, which is exactly how the
  * repo's other drains (OccurrenceStream, cdcStream) consume their
  * micro-batches.
  *
  * The table's merges must run with a vacuum `retain` at least
  * 1 + the deepest lag this follower can accumulate, or the span
  * resolution fails with the below-retention error (by design: a
  * silent gap would corrupt the downstream fold).
  */
object ChangeFeedFollower {

  /** One poll: deliver every commit in `(anchor, currentVersion]` to
    * `apply` in version order and return the new anchor (`anchor`
    * unchanged when the table hasn't advanced or doesn't exist yet).
    */
  def drainOnce(store: SnapshotStore, schema: StructType, keyCols: Seq[String],
      anchor: Long, includeUpdatePreimages: Boolean = false)(
      apply: (Long, DataFrame) => Unit): Long = {
    val cur = store.currentVersion().getOrElse(return anchor)
    if (cur <= anchor) return anchor
    ((anchor + 1) to cur).foreach { v =>
      apply(v,
        store.readChangesBetween(v - 1, v, schema, keyCols, includeUpdatePreimages))
    }
    cur
  }
}
