package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(word, merges)` — apply a trained BPE merge table to one
  * word, returning its subword symbols as `array<string>`.
  *
  * Semantics are EXACTLY the training rewrite of
  * [[graft.operators.TextAnalysis.bpeTrain]]: merges apply in rank
  * order, each as one greedy left-to-right non-overlapping pass
  * (a token merged in a pass never re-merges with a following `b` in
  * the same pass — "aaa" + (a,a) → [aa, a]). That makes
  * encode(train-corpus) reproduce the trainer's final word table,
  * which the spec pins by brute force.
  *
  * The merge table is plan-constant configuration (collected from the
  * metadata-sized trainer output), carried on the expression and
  * shipped once per task via codegen's reference array — NOT a per-row
  * column, so the hot loop touches only the word. Per-word cost is
  * O(merges × symbols) with an early substring guard per merge; the
  * HOF-fold alternative (one nested `aggregate` per merge) builds an
  * expression tree LINEAR in the vocab size and collapses the
  * optimizer beyond a few dozen merges — this kernel is flat in plan
  * size no matter how large the trained vocab.
  */
object BpeEncodeKernel {
  def eval(word: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val s = word.toString
    var syms: Array[String] = {
      val out = new Array[String](s.codePointCount(0, s.length))
      var i = 0; var k = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out(k) = new String(Character.toChars(cp))
        i += Character.charCount(cp); k += 1
      }
      out
    }
    var m = 0
    while (m < merges.length && syms.length > 1) {
      val a = merges(m)(0); val b = merges(m)(1); val ab = merges(m)(2)
      // guard: symbols always concatenate back to the word, so an
      // adjacent (a, b) implies `ab` is a substring of the word —
      // absent merges cost one substring scan, not a symbol pass
      if (s.contains(ab)) {
        // one greedy left-to-right non-overlapping pass
        var i = 0; var k = 0
        val out = new Array[String](syms.length)
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out(k) = ab; i += 2
          } else {
            out(k) = syms(i); i += 1
          }
          k += 1
        }
        if (k < syms.length) syms = java.util.Arrays.copyOf(out, k)
      }
      m += 1
    }
    new GenericArrayData(syms.map(UTF8String.fromString): Array[Any])
  }
}

case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  // The case-class field is a Seq (structural equals/hashCode), so two
  // structurally identical bpe_encode calls canonicalize and common-
  // subexpression-eliminate — an Array field would compare by reference
  // and defeat CSE. The kernel's (a, b, ab) table derives lazily once
  // per expression instance.
  @transient private lazy val mergeTable: Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b, a + b) }.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(v: Any): Any =
    BpeEncodeKernel.eval(v.asInstanceOf[UTF8String], mergeTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeTable, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncodeKernel.eval($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** `merges` in rank order as (a, b) pairs; the merged symbol is
    * their concatenation, matching the trainer's output column.
    */
  def bpe_encode(word: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeEncode(GraftShims.expression(word), merges.toList))
}
