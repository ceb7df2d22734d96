package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Pins the non-oracle dedup ops: MinHash-LSH recall vs the exact
  * brute-force pair set, SimHash locality.
  */
class DedupSpec extends SparkFunSuite {

  test("minhash-lsh finds (almost) all true near-dup pairs") {
    val docs = Tables.load(spark, sfDir, "documents")
    // ground truth: all pairs with shingle-jaccard >= 0.8 (O(n²) is
    // fine at sf0.001's 500 docs)
    val d = docs.select(col("doc_id"), col("text"))
    val truth = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jacc", Dedup.shingleJaccard(col("a.text"), col("b.text")))
      .where(col("jacc") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val found = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    // every LSH hit is a true near-dup (exact verify pass guarantees it)
    assert(found.subsetOf(truth))
    // recall: 8 bands × 4 rows at s>=0.8 → hit prob ≥ 1-(1-0.8^4)^8 ≈ 0.98
    assert(found.size.toDouble / truth.size >= 0.8,
      s"LSH recall too low: ${found.size}/${truth.size}")
  }

  test("prefix-filtered jaccard equals the block ground truth, no cartesian") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val block = SparkEntry.queries("dedup_jaccard_block")(spark, sfDir)
      .collect().map(key).toSet
    val prefixed = SparkEntry.queries("dedup_jaccard_prefix")(spark, sfDir)
    assert(prefixed.collect().map(key).toSet == block)
    assert(block.nonEmpty, "fixture should contain near-dup pairs")
    val plan = prefixed.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"prefix join must stay an equi-join:\n$plan")
  }

  test("simhash: near-dup pairs are close in hamming space") {
    val sigs = SparkEntry.queries("dedup_simhash")(spark, sfDir)
      .select(col("doc_id"), col("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDups = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dupDists = nearDups.map { case (a, b) => hamming(sigs(a), sigs(b)) }
    // random pairs (fixed ids) for contrast
    val ids = sigs.keys.toArray.sorted
    val rndDists = ids.take(50).flatMap(a => ids.takeRight(50).map(b =>
      hamming(sigs(a), sigs(b))))
    assert(dupDists.sum.toDouble / dupDists.length <
      rndDists.sum.toDouble / rndDists.length / 2,
      "near-dups should be much closer in hamming space than random pairs")
  }

  test("exact dedup keeps deterministic survivor") {
    val df = SparkEntry.queries("dedup_exact")(spark, sfDir)
    assert(df.count() > 0)
    assert(df.where(col("keep_id").isNull).count() == 0)
  }
}
