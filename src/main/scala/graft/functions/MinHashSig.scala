package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(shingles, k)` — MinHash signature of a string array
  * as one codegen'd Catalyst expression.
  *
  * Composing this from `transform`/`array_min` higher-order functions
  * is semantically identical but ~40× slower: HOFs evaluate their
  * lambdas interpreted (per element, per seed), and `CollapseProject`
  * re-inlines any "materialized" shingle column back into the per-seed
  * expression. Here each shingle is hashed ONCE (two Murmur3 passes →
  * 64 bits) and the k hash functions are derived affinely
  * (h_i = h·A_i + B_i with odd A_i — the standard universal-hashing
  * MinHash family), so the loop is k long-multiplies per shingle with
  * no allocation. Deterministic: no RNG, no partition dependence.
  */
object MinHash {
  private val GOLDEN = 0x9E3779B97F4A7C15L

  /** One 64-bit content hash per shingle (two seeded 32-bit Murmur3
    * passes over the UTF-8 bytes — Murmur3_x86_32 ships in Spark's
    * unsafe module and needs no extra allocation).
    */
  private def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
    val hi = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 0x5bd1e995)
    (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
  }

  /** The signature kernel; called from both eval and generated code. */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = hash64(shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          val hj = h * (2L * j + 1) + GOLDEN * (j + 1)
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> and k > 0, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    MinHash.sig(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.functions.MinHash.sig($arr, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  def minhash_sig(shingles: Column, k: Int): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(shingles), k))
}
