package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `kmv_sketch(hash, k)` — the K-Minimum-Values distinct sketch
  * (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07): the k smallest
  * DISTINCT values of a uniform 64-bit hash column, as a native
  * partial aggregate.
  *
  * Why it exists next to the built-in HLL: KMV sketches of the SAME
  * hash compose under SET OPERATIONS — the union of two sketches is
  * the k smallest of their merged value sets, and the Jaccard of the
  * kept values estimates the true Jaccard, which turns two sketches
  * into an INTERSECTION cardinality estimate (ρ · |A∪B|). HLL
  * registers can union but cannot intersect without inclusion-
  * exclusion blowup. The estimator: with k minimum values kept and
  * U(h) = (h − Long.Min)/2⁶⁴ the order-preserving map to [0,1),
  * distinct ≈ (k−1)/U(kth smallest); a sketch holding fewer than k
  * values IS the exact distinct set (small groups pay zero error).
  *
  * Scale shape: the buffer is a bounded size-k ordered set —
  * map-side combine sends at most k longs per (group, partition) to
  * the shuffle regardless of row count, the same contract as HLL.
  * Everything is deterministic: same rows → same hashes → same
  * sketch array (sorted ascending), so estimates are bit-stable and
  * golden-hashable. Callers hash with `xxhash64(...)` (Spark-native,
  * seed 42); NULL hashes are skipped (SQL COUNT DISTINCT semantics).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a bigint hash column, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], h: Long): mutable.TreeSet[Long] = {
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }
    buf
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[Long])
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    val it = other.iterator
    var done = false
    while (it.hasNext && !done) {
      val h = it.next()
      // `other` ascends, so once h can't enter, nothing after it can
      if (buf.size >= k && h >= buf.last) done = true else add(buf, h)
    }
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val arr = buf.toArray
    val bb = ByteBuffer.allocate(arr.length * 8)
    bb.asLongBuffer().put(arr)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    mutable.TreeSet.empty[Long] ++= out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  def kmv_sketch(hash: Column, k: Int): Column =
    GraftShims.column(
      KmvSketch(GraftShims.expression(hash), k).toAggregateExpression())

  /** Order-preserving map of a signed 64-bit hash to [0, 1). */
  def frac(h: Long): Double =
    (h.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** Distinct estimate from a sorted sketch array: exact below k,
    * (k−1)/U(kth) at capacity.
    */
  def estimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / frac(sketch.last)

  /** Merge two sorted sketch arrays into the size-≤k union sketch —
    * the same result sketching the unioned inputs would produce.
    */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    (a.toSet ++ b.toSet).toArray.sorted.take(k)

  /** (union, intersection) cardinality estimates from two sketches of
    * the same hash (Beyer et al.: ρ = |K∪ ∩ A ∩ B| / |K∪| estimates
    * Jaccard; intersection = ρ · |A∪B|).
    */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): (Double, Double) = {
    val u = union(a, b, k)
    val est = estimate(u, k)
    val as = a.toSet
    val bs = b.toSet
    val rho = u.count(h => as.contains(h) && bs.contains(h)).toDouble / u.length
    (est, rho * est)
  }
}
