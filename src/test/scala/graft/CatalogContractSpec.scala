package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Catalog-wide output contract: every declared query's TOP-LEVEL columns
  * must be scalar-sortable. The driver's correctness comparator
  * canonical-sorts result rows with pandas `sort_values`, which throws
  * `TypeError: unhashable type` on array / map / struct cells — so a
  * healthy query with an `array<int>` output column becomes a red
  * artifact row (this is exactly what happened to `vec_pq` in round 11:
  * the engine result was deterministic and spec-pinned, but the artifact
  * said `err`). The rule: arrays serialize at the select boundary
  * (`concat_ws` / `to_json`), structs flatten or serialize. This spec
  * walks the whole catalog's schemas so the rule cannot regress
  * silently for any present or future query.
  *
  * Schema resolution builds each query's plan (including any eager
  * fixture work the query does), but collects no results.
  */
class CatalogContractSpec extends SparkFunSuite {

  test("no declared query output has a top-level array/map/struct column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sfDir).schema
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"comparator-unsafe output columns:\n  ${offenders.mkString("\n  ")}")
  }

  test("every oracle key has a matching query; flagship returns rows") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without a query: $missing")
    assert(SparkEntry.entry(spark).limit(1).count() > 0)
  }

  test("no catalog query plans a CartesianProduct") {
    // Catalog-wide plan lint: a CartesianProduct exec means Spark is
    // shuffling BOTH sides of a cross with no broadcast — the one join
    // shape with no 100 TB story. Deliberate tiny crosses (scalar
    // totals, 25-row dims, metadata grids) plan as
    // BroadcastNestedLoopJoin and stay legal; a query that silently
    // degrades to CartesianProduct (e.g. a self-join whose aliases
    // resolved to one attribute — the dedup_embedding_lsh bug class)
    // fails here by name. Queries whose returned frame is a collected
    // LocalRelation (the iterative graph ops) lint their FIXTURE work
    // implicitly: the offending join would have executed while the
    // schema walk built the frame, and their pipelines carry their own
    // plan pins in GraphSpec.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }
}
