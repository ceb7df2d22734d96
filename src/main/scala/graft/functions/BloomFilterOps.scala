package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column wrappers over Spark's built-in bloom-filter expressions
  * (the machinery behind runtime row-group filtering; catalyst ships
  * [[BloomFilterAggregate]] / [[BloomFilterMightContain]] but does not
  * SQL-register them). The aggregate builds one fixed-size sketch from
  * a column of values; `might_contain` probes it with NO false
  * negatives — so "probe bloom, then exact-verify the survivors" is
  * output-identical to the exact join while shrinking the joined side
  * to true hits plus a bounded false-positive trickle.
  *
  * [[BloomFilterMightContain]] requires its sketch operand to be a
  * CONSTANT (Spark's own runtime filters inject it as a scalar
  * subquery), so [[buildBloom]] materializes the sketch on the driver:
  * one scalar aggregate action whose result is the sketch itself —
  * metadata-bounded (numBits/8 bytes regardless of input row count),
  * the same footprint Spark's runtime-filter planner accepts, never a
  * data collect.
  */
object BloomFilterOps {

  /** Aggregate a string/long column into a bloom sketch (binary). */
  def bloom_agg(item: Column, expectedItems: Long, numBits: Long): Column =
    GraftShims.column(new BloomFilterAggregate(
      GraftShims.expression(xxhash64(item)),
      GraftShims.expression(lit(expectedItems)),
      GraftShims.expression(lit(numBits))).toAggregateExpression())

  /** Probe a constant sketch; false positives possible, false
    * negatives impossible.
    */
  def might_contain(sketch: Column, item: Column): Column =
    GraftShims.column(BloomFilterMightContain(
      GraftShims.expression(sketch),
      GraftShims.expression(xxhash64(item))))

  /** Build a sketch over one column of `df` and return it as a
    * constant Column.
    *
    * EAGER: the `.head()` runs a Spark job AT CALL TIME — the build
    * side is scanned during query construction, not when the caller's
    * plan executes (in a benchmarked query map, the sketch cost lands
    * at construction).
    *
    * EMPTY BUILD SIDE: the aggregate yields a null sketch, returned
    * as `lit(null)` — [[might_contain]] then evaluates to NULL and a
    * WHERE on it drops EVERY probe row. That is correct only when
    * "no hits" is the right answer for an empty set (the
    * decontamination caller's left-join + coalesce(0) path is —
    * nothing is contaminated by an empty benchmark); callers whose
    * semantics differ must short-circuit before probing.
    */
  def buildBloom(df: DataFrame, column: String,
      expectedItems: Long, numBits: Long): Column = {
    val row = df.agg(bloom_agg(col(column), expectedItems, numBits)).head()
    if (row.isNullAt(0)) lit(null).cast("binary") else lit(row.getAs[Array[Byte]](0))
  }

  /** LAZY sketch build — the sketch aggregate embeds in the caller's
    * plan as a SCALAR SUBQUERY (exactly how Spark's own
    * InjectRuntimeFilter injects its bloom filters;
    * [[BloomFilterMightContain]] accepts a scalar subquery operand as
    * an alternative to a constant). Unlike [[buildBloom]] no job runs
    * at query-construction time: the build executes inside the
    * measured/planned region when the caller's plan does, and a
    * re-executed query rebuilds it inside its own execution rather
    * than re-scanning the dim at construction. Empty build side
    * behaves identically (the subquery yields a NULL sketch, the
    * probe yields NULL, a WHERE drops every row).
    */
  def buildBloomLazy(df: DataFrame, column: String,
      expectedItems: Long, numBits: Long): Column =
    df.agg(bloom_agg(col(column), expectedItems, numBits)).scalar()
}
