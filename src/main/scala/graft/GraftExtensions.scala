package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.functions.{DotProduct, IndelRatio, KmvSketch, L2Quant, MinHashSig, SimHashSig, WordShingles}

/** Registers the engine's custom Catalyst expressions as SQL
  * functions, so `spark.sql("SELECT indel_ratio(a, b) …")` works the
  * same as the Column API.
  *
  * Install either via config
  * `spark.sql.extensions=graft.GraftExtensions` (cluster deployment)
  * or programmatically with [[GraftExtensions.register]] on an
  * existing session (local/driver-owned sessions, as in Verify/Bench).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  private def intLit(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "indel_ratio" -> (exprs => IndelRatio(exprs(0), exprs(1))),
    "minhash_sig" -> (exprs => MinHashSig(exprs(0), intLit(exprs(1)))),
    "simhash_sig" -> (exprs => SimHashSig(exprs(0))),
    "word_shingles" -> (exprs => WordShingles(exprs(0), intLit(exprs(1)))),
    "dot_d" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "l2_q" -> (exprs => L2Quant(exprs(0), exprs(1))),
    "kmv_sketch" -> (exprs =>
      KmvSketch(exprs(0), intLit(exprs(1))).toAggregateExpression()))

  /** Register the same functions on an already-built session (the
    * extensions hook only applies at session build time).
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
