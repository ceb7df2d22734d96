package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `l2_q(a, b)` — exact squared Euclidean distance between two
  * array<bigint> columns as one codegen'd expression.
  *
  * Contract: for two NON-NULL arrays of EQUAL length with non-null
  * elements, the result equals
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, (acc,x) -> acc+x)`
  * — integer arithmetic, so the sum is order-independent and exactly
  * the DuckDB oracle's `list_reduce` restatement. Edge cases follow
  * the [[DotProductKernel]] `dot_d` convention, NOT the HOF's: on
  * mismatched lengths the kernel sums over the SHORTER array (the
  * HOF spelling null-pads via zip_with, and acc+NULL makes the whole
  * result NULL), and a NULL element reads as 0 rather than
  * propagating NULL. Both behaviors are pinned in EdgeCaseSpec; the
  * engine's callers only ever pass equal-length non-null quantized
  * vectors, where the two spellings agree bit-for-bit.
  *
  * Why a kernel at all: the HOF
  * version interprets its lambdas per element and allocates an
  * intermediate 64-element array per evaluated PAIR, which dominates
  * the quantized-ANN twins' assignment stage (corpus × k codebook
  * evaluations: measured 24.7 → 4.4 s on the 50k-vector 100× corpus
  * when this kernel replaced the HOF). The [[DotProductKernel]]
  * discipline applied to the integer-L2 path.
  */
object L2QuantKernel {
  def l2(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

case class L2Quant(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_q requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "l2_q"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2QuantKernel.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.L2QuantKernel.l2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2Quant {
  def l2_q(a: Column, b: Column): Column =
    GraftShims.column(L2Quant(GraftShims.expression(a), GraftShims.expression(b)))
}
