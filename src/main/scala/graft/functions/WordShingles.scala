package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — all n-word shingles of a
  * space-tokenized text, as one codegen'd expression.
  *
  * Exact semantics of the HOF formulation it replaces (and of the
  * DuckDB oracle's list comprehension):
  * `filter(transform(sequence(0, greatest(size(toks)-n, 0)),
  *         i -> array_join(slice(toks, i+1, n), ' ')), s -> length(s) > 0)`
  * — texts shorter than n words yield one whole-text shingle; empty
  * shingles are dropped. The HOF version interprets three lambdas per
  * shingle; this kernel tokenizes once and reuses the token array.
  */
object WordShinglesKernel {
  private val SPACE = UTF8String.fromString(" ")

  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.split(SPACE, -1)
    val m = toks.length
    val count = if (m >= n) m - n + 1 else 1
    val out = new java.util.ArrayList[UTF8String](count)
    var i = 0
    while (i < count) {
      val upper = math.min(i + n, m)
      val s = UTF8String.concatWs(SPACE,
        java.util.Arrays.copyOfRange(toks, i, upper): _*)
      if (s.numBytes() > 0) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires (string, n > 0), got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(v: Any): Any =
    WordShinglesKernel.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.WordShinglesKernel.shingles($t, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def word_shingles(text: Column, n: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(text), n))
}
