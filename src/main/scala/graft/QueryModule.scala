package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Each entry in [[queries]] is a DataFrame program over the testdata
  * dir; each entry in [[oracle]] is the equivalent ANSI SQL that DuckDB
  * runs on the same parquet files (table name = file stem). Queries
  * without an oracle entry get a weaker rows-only check from the driver
  * (used for ops DuckDB cannot express, e.g. MinHash-LSH).
  *
  * Oracle-parity rules used throughout (see SURVEY.md §5.3):
  *  - every computed column is aliased identically on both sides
  *    (the driver sorts columns by NAME before hashing);
  *  - double aggregations go through DECIMAL(18,2)-exact sums and are
  *    cast to double at the end, so IEEE values match bit-for-bit
  *    regardless of per-engine addition order;
  *  - timestamps in outputs are rendered as 'yyyy-MM-dd HH:mm:ss'
  *    strings or DATEs (tz/precision-proof);
  *  - no order-sensitive aggregates without an explicit sort.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
