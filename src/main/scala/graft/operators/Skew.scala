package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (prompt/SURVEY §4: "salting for skew,
  * AQE for runtime re-plan").
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); the salted
  * join below is the explicit form for the pathological hot-key case
  * AQE can't fix — e.g. one key holding 30% of a 100 TB fact table:
  * the big side spreads each key over `salt` sub-keys (deterministic
  * hash of the whole row, no RNG → retries/speculation stay
  * consistent), the small side replicates each row `salt` times, and
  * the join key becomes (key, salt_id) so no single reducer owns a
  * hot key.
  */
object Skew {

  /** Inner equi-join on `key`, salted `salt` ways. Produces exactly
    * the rows of `big.join(small, key)` (column order: key, big cols,
    * small cols).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
