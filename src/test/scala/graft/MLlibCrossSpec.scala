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

  test("vec_pca spans the same subspace as ml.feature.PCA, decorrelated, variance-ordered") {
    val dir = "/root/testdata/sf0.01" // enough rows for stable eigengaps
    val mine = SparkEntry.queries("vec_pca")(spark, dir).collect()
      .map(r => (r.getLong(0), Array(r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val n = mine.size
    def colOf(m: Map[Long, Array[Double]], k: Int): Array[Double] =
      m.toSeq.sortBy(_._1).map(_._2(k)).toArray
    def center(xs: Array[Double]): Array[Double] = {
      val mu = xs.sum / xs.length; xs.map(_ - mu)
    }
    // my components are decorrelated with descending variance
    val cols = (0 until 4).map(k => center(colOf(mine, k)))
    val vars = cols.map(c => c.map(x => x * x).sum / n)
    assert(vars.sliding(2).forall { case Seq(a, b) => a >= b },
      s"variances not descending: ${vars.mkString(",")}")
    for (i <- 0 until 4; j <- i + 1 until 4) {
      val cross = cols(i).zip(cols(j)).map { case (a, b) => a * b }.sum / n
      assert(math.abs(cross) < 1e-9 * math.sqrt(vars(i) * vars(j)) + 1e-12,
        s"pc${i + 1} and pc${j + 1} correlated: $cross")
    }
    // column means are ~0: the projection really is mean-centered
    (0 until 4).foreach { k =>
      val mu = colOf(mine, k).sum / n
      assert(math.abs(mu) < 1e-9, s"pc${k + 1} not centered: $mu")
    }
    // cross-engine subspace agreement: per-component |corr| ≈ 1 vs
    // MLlib (its transform projects UNcentered vectors and has free
    // sign, so compare centered columns up to sign)
    import org.apache.spark.ml.feature.{PCA => MlPca}
    import org.apache.spark.ml.functions.array_to_vector
    val feat = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        array_to_vector(transform(col("embedding"), _.cast("double")))
          .as("features"))
    val model = new MlPca().setK(4).setInputCol("features")
      .setOutputCol("pcs").fit(feat)
    val theirs = model.transform(feat).select(col("vec_id"), col("pcs"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray)).toMap
    (0 until 4).foreach { k =>
      val a = cols(k)
      val b = center(colOf(theirs, k))
      val dotAb = a.zip(b).map { case (x, y) => x * y }.sum
      val corr = math.abs(dotAb) / math.sqrt(
        a.map(x => x * x).sum * b.map(x => x * x).sum)
      assert(corr > 1 - 1e-6, s"pc${k + 1}: |corr| vs MLlib = $corr")
    }
  }
}
