package graft

import org.apache.spark.sql.functions._

class GraphSpec extends SparkFunSuite {

  test("g1_triangles equals brute-force adjacency-set intersection") {
    // ground truth: collect the (small) sf0.001 edge set and count
    // per-edge common neighbours; each triangle is counted once per
    // edge → divide by 3.
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.toDF("ok", "u").join(li.toDF("ok", "v"), "ok")
      .where(col("u") < col("v")).select(col("u"), col("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val tripleCounted = edges.map { case (u, v) => (adj(u) & adj(v)).size.toLong }.sum
    assert(tripleCounted % 3 == 0)
    val want = tripleCounted / 3

    val q = SparkEntry.queries("g1_triangles")(spark, sfDir)
    val row = q.collect().head
    assert(row.getAs[Long]("n_triangles") == want,
      s"got ${row.getAs[Long]("n_triangles")} want $want")
    assert(row.getAs[Long]("n_edges") == edges.length.toLong)

    // the scale contract: every stage of the closing plan is an
    // equi-join / hash agg — never a nested-loop or cartesian product
    // (the query's returned frame is a materialized LocalRelation, so
    // pin the shape on the lazy pipeline)
    val (pairs, od, closing) = operators.Graph.trianglePipeline(
      li.toDF("ok", "pk"))
    val plan = closing.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"data-scale product leaked into the plan:\n$plan")
    operators.Dedup.releaseCheckpoints(pairs)
    operators.Dedup.releaseCheckpoints(od)
  }
}
