package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash_sig(tokens)` — 64-bit SimHash of a string array as one
  * codegen'd Catalyst expression.
  *
  * The HOF spelling (`aggregate(sequence(0,63), … aggregate(hashes,
  * …))`) re-walks the token-hash array once PER BIT with interpreted
  * lambdas — 64 interpreted passes per row; this kernel hashes each
  * token once and accumulates all 64 bit-counters in a single pass.
  * Token hash = XXH64(bytes, seed 42), bit-identical to Spark SQL's
  * `xxhash64(token)`, so signatures match the HOF formulation exactly.
  * Weights are 1 per token (pass distinct tokens for set semantics —
  * the caller decides). Deterministic: no RNG, no partition
  * dependence.
  */
object SimHash {

  /** The signature kernel; called from both eval and generated code. */
  def sig(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s: UTF8String = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        total += 1
        var bit = 0
        while (bit < 64) {
          counts(bit) += ((h >>> bit) & 1L).toInt
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) * 2 > total) out |= 1L << bit
      bit += 1
    }
    out
  }
}

case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    SimHash.sig(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.functions.SimHash.sig($arr)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  def simhash_sig(tokens: Column): Column =
    GraftShims.column(SimHashSig(GraftShims.expression(tokens)))
}
