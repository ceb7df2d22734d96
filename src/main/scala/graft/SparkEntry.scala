package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[QueryModule]]'s catalog. Each key is one operator
  * row from SURVEY.md §2 (or a north-star extension); keys present in
  * [[oracleSql]] are hash-checked against DuckDB by the driver, the
  * rest get a rows-only check.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.FuzzyOccurrence,
    operators.Scalars,
    operators.EventWindows,
    operators.Dedup,
    operators.Similarity,
    operators.TextAnalysis,
    operators.Multimodal,
    operators.Pipeline,
    operators.Graph
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the sliding-window fuzzy lyric search (reference EP3) over the
    * documents table with planted probes.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("fuzzy_occurrence")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
