package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `token_stats(tokens)` — per-row token statistics
  * `struct(n_tokens int, distinct_tokens bigint, top_c bigint)` in one
  * codegen'd pass over an `array<string>`.
  *
  * The relational formulation — `explode` the tokens and aggregate
  * twice (count per (doc, token), then count+max per doc) — shuffles
  * EVERY TOKEN of the corpus through two exchanges to answer a
  * question that never crosses row boundaries. On a 100 TB corpus
  * that is the whole corpus, tokenized, through the wire, twice.
  * This kernel computes the same three integers inside the row, so
  * per-document repetition scoring (the MassiveText/Gopher rules) is
  * a pure zero-shuffle projection. Counts are exact integers —
  * results are bit-identical to the explode formulation.
  *
  * Takes the OUTPUT of `split(text, ' ')` rather than the raw text so
  * tokenization stays byte-identical to the SQL `split` the oracle
  * uses (empty tokens from doubled spaces and all).
  */
object TokenStatsKernel {
  def eval(a: ArrayData): InternalRow = {
    val n = a.numElements()
    val seen = new java.util.HashMap[UTF8String, Integer](math.max(16, n * 2))
    var top = 0
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      val prev = seen.get(t)
      val c = if (prev == null) 1 else prev.intValue() + 1
      seen.put(t, Integer.valueOf(c))
      if (c > top) top = c
      i += 1
    }
    InternalRow(n, seen.size().toLong, top.toLong)
  }
}

case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("distinct_tokens", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "token_stats"

  override protected def nullSafeEval(v: Any): Any =
    TokenStatsKernel.eval(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TokenStatsKernel.eval($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  def token_stats(tokens: Column): Column =
    GraftShims.column(TokenStats(GraftShims.expression(tokens)))
}
