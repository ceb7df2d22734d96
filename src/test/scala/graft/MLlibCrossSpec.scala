package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Triangulates the custom MinHash-LSH against MLlib's MinHashLSH:
  * two independent implementations of the same algorithm must agree
  * on (almost) all true near-duplicate pairs.
  */
class MLlibCrossSpec extends SparkFunSuite {

  test("custom LSH and MLlib MinHashLSH find the same near-dups") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        Dedup.shingles(col("text")).as("sh"))

    // MLlib path: shingles → hashed binary vectors → MinHashLSH join
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(feat)
    val mllibPairs = model.approxSimilarityJoin(feat, feat, 0.2, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .where(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val custom = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(custom.nonEmpty && mllibPairs.nonEmpty)
    // both are probabilistic; they must agree on the vast majority of
    // the exact-verified (jaccard >= 0.8 ↔ dist <= 0.2) pairs
    val overlap = custom.intersect(mllibPairs).size.toDouble /
      math.max(custom.size, 1)
    assert(overlap >= 0.8,
      s"custom ${custom.size} vs mllib ${mllibPairs.size}, overlap $overlap")
  }
}
