package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Graph analytics over relational co-occurrence (north-star §2.13).
  *
  * The graph is derived, not stored: parts are nodes, an edge connects
  * two parts that appear in the same order (the classic market-basket
  * projection of the lineitem fact). The reference has no graph
  * operators; these cover the "relationships inside the corpus"
  * analyses a training-data pipeline runs (entity co-occurrence,
  * duplicate-cluster structure — see also Dedup.connectedComponents).
  */
object Graph extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact triangle counting with DEGREE-ORDERED ORIENTATION (the
    // MapReduce-era wedge-check algorithm: Schank's thesis /
    // Suri-Vassilvitskii WWW'11). Naive wedge enumeration explodes on
    // hub nodes (Σ deg² — one popular part in k orders yields k²
    // wedges); orienting every edge from its (degree, id)-smaller
    // endpoint bounds out-degree by O(√m), so the wedge join does
    // O(m^1.5) work spread evenly across hash-join tasks — the
    // standard scale-safe spelling. Every stage is an equi-join or
    // hash agg (plan-pinned: no nested loop); the deg table is tiny
    // relative to edges (|nodes| ≪ m) and broadcasts.
    //
    // Self-join inputs are RENAMED before joining (not aliased) — the
    // dataset-alias trap SimilaritySpec pinned for dedup_embedding_lsh:
    // `df.as("x")` self-joins can resolve both sides to one attribute
    // and silently degrade the equi-join to a nested loop.
    "g1_triangles" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val (pairs, od, closing) = trianglePipeline(li)
      val nTri = closing.count()
      val nEdges = pairs.count()
      Dedup.releaseCheckpoints(pairs)
      Dedup.releaseCheckpoints(od)
      Seq((nTri, nEdges)).toDF("n_triangles", "n_edges")
    })
  )

  /** The lazy triangle dataflow over an (ok, pk) incidence relation:
    * returns (edge set, oriented edges, closing semi join). The edge
    * set and oriented-edge table are LAZY localCheckpoints — they feed
    * multiple consumers (degrees, orientation, the closing check, the
    * edge count), and without a checkpoint Spark replays the
    * lineitem self-join once per consumer (8× in the measured plan).
    * The CALLER must materialize via an action and then
    * [[Dedup.releaseCheckpoints]] both returned frames (the
    * connectedComponents pattern).
    */
  private[graft] def trianglePipeline(li: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val pairs = li.toDF("ok", "u").join(li.toDF("ok", "v"), "ok")
      .where(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
      .localCheckpoint(false)
    val deg = pairs.select(col("u").as("node"))
      .union(pairs.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val uFirst = (col("du") < col("dv")) ||
      (col("du") === col("dv") && col("u") < col("v"))
    val od = pairs
      .join(deg.toDF("u", "du"), "u")
      .join(deg.toDF("v", "dv"), "v")
      .select(when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("dv")).otherwise(col("du")).as("dd"))
      .localCheckpoint(false)
    // wedges (v, w) from a common src, ordered by (deg, id) so each
    // candidate triangle is generated exactly once; a (v, w) pair
    // reached from DIFFERENT srcs is a different triangle, so the
    // closing check is a LEFT SEMI join (keeps left multiplicity,
    // never multiplies on the right).
    val wedges = od.toDF("src", "v", "dv2")
      .join(od.toDF("src", "w", "dw2"), "src")
      .where(col("dv2") < col("dw2") ||
        (col("dv2") === col("dw2") && col("v") < col("w")))
      .select(col("v"), col("w"))
    val closing = wedges
      .join(od.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"), "left_semi")
    (pairs, od, closing)
  }

  def oracle: Map[String, String] = Map(
    "g1_triangles" ->
      """WITH pairs AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         deg AS (SELECT node, count(*) AS d
           FROM (SELECT u AS node FROM pairs
                 UNION ALL SELECT v AS node FROM pairs) t
           GROUP BY node),
         o AS (SELECT
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                  THEN u ELSE v END AS src,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                  THEN v ELSE u END AS dst
           FROM pairs JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
         od AS (SELECT src, dst, d AS dd FROM o JOIN deg ON node = dst),
         wed AS (SELECT o1.dst AS v, o2.dst AS w2 FROM od o1 JOIN od o2
               ON o1.src = o2.src
               AND ((o1.dd < o2.dd) OR (o1.dd = o2.dd AND o1.dst < o2.dst)))
         SELECT count(*) AS n_triangles,
           (SELECT count(*) FROM pairs) AS n_edges
         FROM wed JOIN o ON wed.v = o.src AND wed.w2 = o.dst"""
  )
}
