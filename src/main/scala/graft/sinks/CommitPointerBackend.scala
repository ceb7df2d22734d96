package graft.sinks

/** The atomic-publish seam of a snapshot commit: compare-and-swap of
  * the CURRENT pointer body.
  *
  * On HDFS/posix the store's built-in lease machinery already makes
  * check-then-rename an effective CAS (create-exclusive `LOCK`, fence
  * re-check inside it, single overwrite-rename — see
  * [[SnapshotStore]]'s class doc), so the default backend is that
  * machinery itself. On object stores WITHOUT atomic exclusive create
  * (S3 before conditional writes, emulations over it), the lease
  * degrades to advisory and the pointer swap is the last line — the
  * production hardening is to delegate the swap to the store's own
  * conditional PUT (`If-Match`/`If-None-Match` on S3, generation
  * preconditions on GCS), which this trait models: one server-side
  * atomic compare-of-body + swap.
  *
  * Contract:
  *  - `cas(None, next)` publishes only when no pointer exists;
  *  - `cas(Some(body), next)` publishes only when the pointer's
  *    current body is exactly `body` (manifest names are unique per
  *    writer, so body-compare is version-compare but strictly
  *    stronger — two same-version racers can never pass each other's
  *    check);
  *  - returns false on mismatch, leaving the pointer untouched;
  *  - implementations must be atomic under arbitrary concurrency
  *    (that is the point of buying the store's conditional PUT).
  *
  * A [[SnapshotStore]] with a backend installed
  * (`store.pointerBackend = Some(...)`) routes every commit's publish
  * through `cas` and never touches the `LOCK` file: the loser of a
  * race is fenced by the CAS result, not by create-exclusivity.
  * Version-log entries are then written by CAS winners only, which
  * serializes them per version exactly as the lease did.
  */
trait CommitPointerBackend {
  def cas(expected: Option[String], next: String): Boolean
}
