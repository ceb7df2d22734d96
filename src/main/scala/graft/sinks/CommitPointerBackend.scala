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
  *
  * Deployment wiring: install `SnapshotStore.backendProvider` once at
  * session setup (root path → backend) and every store — including
  * the ones the path-based write fronts construct internally — picks
  * the backend up automatically; `store.pointerBackend` remains the
  * per-instance override.
  *
  * EVERY WRITER OF A ROOT MUST USE THE SAME PUBLISH MODE: a lease
  * writer and a CAS writer are serialized by NEITHER arbiter (the
  * lease path never consults the CAS, the CAS path never takes the
  * lease), so a mixed pair racing the same base could each believe it
  * won and one commit would silently vanish (ADVICE r19). Enforced,
  * not just documented: the first CAS commit writes a `BACKEND`
  * sentinel under the root, and the lease path refuses to commit past
  * it with a loud IllegalStateException. Migrating a table back to
  * lease commits means quiescing all writers, then deleting the
  * sentinel.
  */
trait CommitPointerBackend {
  def cas(expected: Option[String], next: String): Boolean
}

/** Reference implementation: CAS serialized by a per-root JVM mutex,
  * pointer I/O as plain (non-exclusive) file ops. Correct for any
  * number of THREADS in one process — the multi-writer shape local
  * pipelines and the driver's concurrency rows actually run — and
  * the executable contract a real object-store client implements
  * across processes (its server-side If-Match plays the mutex's
  * role; everything else is identical). NOT safe across JVMs: that
  * is precisely the gap conditional PUT exists to close.
  */
final class InProcessCasBackend(spark: org.apache.spark.sql.SparkSession,
    root: org.apache.hadoop.fs.Path) extends CommitPointerBackend {
  private val pointer = new org.apache.hadoop.fs.Path(root, "CURRENT")
  def cas(expected: Option[String], next: String): Boolean =
    InProcessCasBackend.mutexFor(root.toString).synchronized {
      val fs = AtomicDir.fileSystem(spark, root)
      val cur =
        if (!fs.exists(pointer)) None
        else {
          val in = fs.open(pointer)
          try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
          finally in.close()
        }
      if (cur != expected) false
      else {
        val tmp = new org.apache.hadoop.fs.Path(root,
          s".CURRENT.cas-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        try out.write(next.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          root.toUri, spark.sessionState.newHadoopConf())
        fc.rename(tmp, pointer, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        true
      }
    }
}

object InProcessCasBackend {
  private val mutexes =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def mutexFor(root: String): Object =
    mutexes.getOrElseUpdate(root, new Object)
}
