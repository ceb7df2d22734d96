package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality EXPECTATIONS — declared row-level rules evaluated as
  * one conditional aggregation (the Delta-Live-Tables/Great-
  * Expectations gate, engine-side): a pipeline stage states what must
  * hold, gets per-rule violation counts for monitoring, and splits
  * rows into pass/quarantine streams instead of silently training on
  * bad data.
  *
  * Rule semantics: a rule is a BOOLEAN column; NULL results count as
  * VIOLATIONS (a rule that cannot evaluate has not passed — the
  * three-valued-logic trap where `col = col` over NULLs silently
  * passes everything it should flag).
  *
  * Scale: [[summary]] is one map-side-combining aggregation over a
  * single scan regardless of rule count (rules become SUM(CASE)
  * columns, then unpivot via `stack` — never one pass per rule);
  * [[annotate]]/[[split]] are zero-shuffle projections/filters.
  */
object Expectations {

  /** Rows with a `_violations` array naming every rule they fail. */
  def annotate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("_violations",
      filter(array(rules.map { case (n, c) =>
        when(!coalesce(c, lit(false)), lit(n))
      }: _*), x => x.isNotNull))

  /** (pass, quarantine) split; quarantined rows keep `_violations`
    * for triage, passing rows drop the column.
    */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val a = annotate(df, rules)
    (a.where(size(col("_violations")) === 0).drop("_violations"),
      a.where(size(col("_violations")) > 0))
  }

  /** One row per rule: (rule, n_violations, n_rows) — the monitoring
    * series a gate dashboard plots. Single scan, rule count many
    * SUM(CASE) columns, unpivoted with `stack`.
    */
  def summary(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    // rule names are spliced into the stack() SQL string below — only
    // identifier-shaped names are representable there, so reject the
    // rest loudly instead of producing a parse error (or worse, a
    // quote injection) at plan time; empty and duplicate-named rule
    // lists would likewise die at plan time with opaque analyzer
    // errors (stack(0, ) / ambiguous __v_<name>) where annotate()
    // accepts them — make the API uniform with clear messages
    require(rules.nonEmpty, "summary needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1).diff(rules.map(_._1).distinct).mkString(", ")}")
    rules.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"rule name '$n' must be identifier-shaped ([A-Za-z0-9_]+)")
    }
    val aggs = rules.map { case (n, c) =>
      sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)).as(s"__v_$n")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (n, _) => s"'$n', __v_$n" }.mkString(", ")
    one.select(
      expr(s"stack(${rules.size}, $stacked) as (rule, n_violations)"),
      col("__n").as("n_rows"))
  }
}
