package graft.sinks

import graft.Ckpt.CkptOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned MERGE into a hive-partitioned parquet target.
  *
  * [[Merge]] expresses the K1–K3 plans on whole frames; at 100 TB a
  * merge must touch only the partitions that actually contain affected
  * keys (the reference's PG `ON CONFLICT` touches only affected index
  * pages for the same reason, `db/occurrence.py:22-51`). This object
  * does that for a directory laid out with `partitionBy(cols)`:
  *
  *   1. collect the DISTINCT partition tuples present in `incoming`
  *      (driver-side, but bounded by partition count, not row count)
  *   2. read the target pruned to those partitions — the predicate is
  *      on partition columns only, so the scan lists just the matching
  *      directories (partition pruning, no data files of untouched
  *      partitions are opened)
  *   3. run the merge plan on that pruned slice + incoming
  *   4. write the result to a staging root in the same partitioned
  *      layout, then swap ONLY the affected partition directories in
  *      via the [[AtomicDir]] rename-aside protocol
  *
  * Untouched partitions are never read, never rewritten — their files
  * stay byte-identical (PartitionedMergeSpec asserts this). Each
  * partition swap is individually crash-safe; for cross-partition
  * atomicity (all-or-nothing over many partitions) use
  * [[SnapshotMerge]], which publishes the same merge through a
  * manifest + atomic pointer swap instead of a per-partition rename
  * loop.
  *
  * Precondition: the partition columns must be determined by the merge
  * keys (same key => same partition tuple in target and incoming) —
  * e.g. a key-derived date or hash bucket. Otherwise a key could
  * "move" partitions and the partition-scoped anti-join would miss its
  * old row. This is the standard contract for partitioned upserts.
  */
object PartitionedMerge {

  /** K1 on a partitioned target: keep existing rows, add unseen keys. */
  def upsertIgnore(spark: SparkSession, targetDir: String, incoming: DataFrame,
      keys: Seq[String], partCols: Seq[String]): Unit =
    merge(spark, targetDir, incoming, partCols)(
      (target, inc) => Merge.upsertIgnore(target, inc, keys))

  /** K2 on a partitioned target: incoming wins on key collision. */
  def upsertUpdate(spark: SparkSession, targetDir: String, incoming: DataFrame,
      keys: Seq[String], partCols: Seq[String]): Unit =
    merge(spark, targetDir, incoming, partCols)(
      (target, inc) => Merge.upsertUpdate(target, inc, keys))

  /** Generic partition-pruned merge: `mergeFn(prunedTarget, incoming)`
    * replaces exactly the partitions `incoming` touches.
    */
  def merge(spark: SparkSession, targetDir: String, incoming0: DataFrame,
      partCols: Seq[String])(mergeFn: (DataFrame, DataFrame) => DataFrame): Unit = {
    require(partCols.nonEmpty, "use Merge + AtomicDir for unpartitioned targets")
    SnapshotMerge.requirePartitionable(incoming0.schema, partCols)
    val root = new Path(targetDir)
    val fs = AtomicDir.fileSystem(spark, root)
    AtomicDir.recover(fs, root)
    recoverPartitions(spark, targetDir)

    // one evaluation of the incoming plan across the distinct collect
    // and the staged write (see SnapshotMerge.merge)
    val incoming = incoming0.ckpt(true)
    val parts: Array[Row] =
      incoming.select(partCols.map(col): _*).distinct().collect()
    if (parts.isEmpty) return
    SnapshotMerge.requirePartitionValues(parts)

    // Partition-pruned read of the affected slice. Per-column IN-lists
    // reference partition columns only => directory-level pruning, no
    // untouched data file is opened — and the expression stays LINEAR
    // in the number of touched partitions (an OR-of-ANDs over thousands
    // of tuples would blow up Catalyst analysis / codegen constant
    // pools). For composite keys the IN-list conjunction is a cartesian
    // superset, so a broadcast semi-join against the distinct tuples
    // restores exactness after the coarse prune.
    val pruned =
      if (AtomicDir.hasData(fs, root)) {
        val coarse = partCols.zipWithIndex.map { case (c, i) =>
          col(c).isin(parts.map(_.get(i)).distinct.toSeq: _*)
        }.reduce(_ && _)
        // The DECLARED schema governs partition-column types: inference
        // would turn a string value like "00123" into int 123, so the
        // pruned rows' key would no longer equal incoming's and the
        // merge would stage them under a directory outside `parts` —
        // silently dropped by the swap loop (same contract as
        // SnapshotStore.readPartitions).
        val base = spark.read.schema(incoming.schema).parquet(targetDir)
          .where(coarse)
        if (partCols.lengthCompare(1) == 0) base
        else {
          val tupleSchema = org.apache.spark.sql.types.StructType(
            partCols.map(c => incoming.schema(c)))
          val tuples = spark.createDataFrame(
            java.util.Arrays.asList(parts: _*), tupleSchema)
          base.join(broadcast(tuples), partCols, "left_semi")
        }
      } else {
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], incoming.schema)
      }

    val merged = mergeFn(pruned, incoming)

    // Stage the replacement partitions OUTSIDE the root (a staging dir
    // inside it would corrupt partition discovery for readers).
    val stagingRoot = new Path(targetDir + ".stagingparts")
    val oldRoot = new Path(targetDir + ".oldparts")
    val deletingRoot = new Path(targetDir + ".deleting")
    if (fs.exists(stagingRoot)) fs.delete(stagingRoot, true)
    // Cluster rows by partition before writing: without this every
    // write task emits a file into every affected partition dir
    // (tasks × partitions small files); with it AQE coalesces to a
    // handful of writers per partition.
    merged.repartition(partCols.map(col): _*).write.mode("overwrite")
      .partitionBy(partCols: _*).parquet(stagingRoot.toString)

    // Swap each affected partition dir: rename-aside, rename-in,
    // delete-aside — crash at any point leaves that partition readable
    // from either the root or the aside copy (recoverPartitions).
    fs.mkdirs(root)
    parts.foreach { r =>
      val suffix = SnapshotMerge.partitionSuffix(partCols, r)
      val src = new Path(stagingRoot, suffix)
      val dst = new Path(root, suffix)
      val aside = new Path(oldRoot, suffix)
      if (fs.exists(src)) {
        fs.mkdirs(aside.getParent)
        fs.mkdirs(dst.getParent)
        if (fs.exists(aside)) fs.delete(aside, true)
        if (fs.exists(dst) && !fs.rename(dst, aside))
          throw new java.io.IOException(s"rename $dst -> $aside failed")
        if (!fs.rename(src, dst)) {
          if (fs.exists(aside)) fs.rename(aside, dst)
          throw new java.io.IOException(s"rename $src -> $dst failed")
        }
        fs.delete(aside, true)
      } else if (fs.exists(dst)) {
        // The merge emitted no rows for this partition => it is
        // deleted. A direct recursive delete is not atomic on local FS
        // or S3A — a crash mid-delete would leave a torn partition
        // visible to readers. Rename into a dedicated doomed namespace
        // first (atomic on posix/HDFS; on S3A rename is itself a
        // copy+delete, so there this narrows the window rather than
        // closing it — object stores want the SnapshotMerge pointer
        // protocol instead), then delete; recoverPartitions DROPS
        // anything found under `.deleting` instead of restoring it, so
        // the partition is gone whether or not the delete finished.
        // (Using `.oldparts` here would be wrong: recovery would
        // misread the doomed copy as a crashed swap and resurrect it.)
        val doomed = new Path(deletingRoot, suffix)
        fs.mkdirs(doomed.getParent)
        if (fs.exists(doomed)) fs.delete(doomed, true)
        if (!fs.rename(dst, doomed))
          throw new java.io.IOException(s"rename $dst -> $doomed failed")
        fs.delete(doomed, true)
      }
      ()
    }
    fs.delete(stagingRoot, true)
    fs.delete(oldRoot, true)
    fs.delete(deletingRoot, true)
    ()
  }

  /** Restore any partition renamed aside by a crashed swap: a leaf dir
    * present under `<target>.oldparts` but missing under the root goes
    * back; one also present under the root (crash before delete-aside)
    * is dropped. Idempotent.
    */
  def recoverPartitions(spark: SparkSession, targetDir: String): Unit = {
    val root = new Path(targetDir)
    val fs = AtomicDir.fileSystem(spark, root)
    // Partitions renamed into the doomed namespace were scheduled for
    // deletion — finish the delete, never restore them.
    fs.delete(new Path(targetDir + ".deleting"), true)
    val oldRoot = new Path(targetDir + ".oldparts")
    if (!fs.exists(oldRoot)) return
    // shared walk (hidden/marker-only dirs are NOT partitions and must
    // not be "restored" as one)
    SnapshotStore.listPartitionDirs(fs, oldRoot).foreach { rel =>
      val dst = new Path(root, rel)
      if (!fs.exists(dst)) {
        fs.mkdirs(dst.getParent)
        fs.rename(new Path(oldRoot, rel), dst)
      }
    }
    fs.delete(oldRoot, true)
    ()
  }
}
