package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_sum(v)` — element-wise sum of an `array<double>` column as a
  * native partial aggregate.
  *
  * The SQL-only alternative — `posexplode` to (group, pos, x) rows and
  * a hash aggregate on (group, pos) — multiplies the shuffled row
  * count by the vector DIMENSION: at dim=768 a 100 TB corpus pushes
  * 768× its row count through the exchange just to add vectors. This
  * aggregate keeps one running `Array[Double]` per group per
  * partition (map-side combine via [[TypedImperativeAggregate]], so
  * only k partial vectors per partition reach the shuffle) and adds
  * elements in a tight loop with zero per-row allocation.
  *
  * NULL rows are skipped (SQL SUM semantics); all non-null inputs in
  * a group must share one dimension — a mismatch throws rather than
  * silently truncating. A group with no non-null input sums to NULL.
  * Element addition order across rows is partition-dependent, as with
  * any floating-point SUM.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"vec_sum requires array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  // Array.empty marks "no input seen yet" — the dimension is only
  // known once the first vector arrives.
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buffer: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    if (buffer.isEmpty) {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = v.getDouble(i); i += 1 }
      out
    } else {
      require(buffer.length == n,
        s"vec_sum: vector dimension changed mid-group (${buffer.length} vs $n)")
      var i = 0
      while (i < n) { buffer(i) += v.getDouble(i); i += 1 }
      buffer
    }
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer else add(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other
    else {
      require(buffer.length == other.length,
        s"vec_sum: vector dimension changed across partitions (${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

object VectorSum {
  def vec_sum(v: Column): Column =
    GraftShims.column(VectorSum(GraftShims.expression(v)).toAggregateExpression())
}
