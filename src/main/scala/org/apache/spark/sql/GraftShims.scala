package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for `private[sql]` Column ↔ catalyst Expression conversion
  * (Spark 4 moved this behind `classic.ExpressionUtils`). Lives in the
  * `org.apache.spark.sql` package solely to satisfy the access
  * modifier; no Spark internals are modified.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-root a (checkpointed) frame on a FRESH internal-row leaf,
    * dropping inherited Catalyst statistics — zero execution cost on
    * a materialized localCheckpoint (its `toRdd` IS the stored
    * blocks; no Row round-trip, unlike `createDataFrame(df.rdd)`).
    *
    * Why stats must be dropped, not kept: a localCheckpoint's
    * LogicalRDD INHERITS the origin plan's sizeInBytes. In an
    * iterative engine that estimate either compounds round over
    * round (the coreness stats-squaring trap) or — when the origin
    * is a few-MB stored artifact — stays so SMALL that Catalyst
    * broadcasts a corpus-scale frame (the r13 `g2_pagerank` 5×
    * regression). A fresh leaf reports the conservative default
    * (effectively "huge"), so un-hinted joins against it stay
    * shuffled — the honest plan — and metadata-sized sides still
    * broadcast via explicit hints.
    */
  def rebase(df: Dataset[Row]): Dataset[Row] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }

  /** Unload all resident state-store providers (`private[sql]`).
    * Called after an AvailableNow drain whose temp checkpoint is
    * deleted with the query — the resident provider maps can serve no
    * future restart, and measurably tax the queries that run next in
    * the same JVM (r13: 2–6× on the following bench block). A
    * concurrently running stream merely reloads from its checkpoint
    * on its next batch.
    */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
