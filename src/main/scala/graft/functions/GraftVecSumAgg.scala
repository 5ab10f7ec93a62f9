package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_vec_sum(array<double|float>)` → `array<double>`: element-wise sum
  * of vectors — the aggregate that makes distributed centroid recomputation
  * (the k-means M-step) scale: partial/final with map-side combine, so each
  * executor folds its partition's vectors into ONE dense accumulator and
  * only `dims` doubles per group cross the shuffle — versus the
  * posexplode-and-regroup alternative that shuffles N·dims skinny rows.
  *
  * Dimensionality is discovered from the first non-null input (buffer
  * starts empty); mismatched lengths fail fast rather than mis-summing,
  * and so does a null ELEMENT inside a vector (vectors must be dense).
  * NULL vectors are ignored, like SQL sum. Groups with only nulls eval to
  * NULL. Sum is associative-but-not-exactly (float rounding depends on
  * merge order) — callers treat centroids as approximate by nature, and
  * the catalog exposes k-means results through rows-only checks.
  */
case class GraftVecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_sum"

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum requires array<double> or array<float>, got $other")
  }

  /** empty = "no vector seen yet" (dims unknown until the first input) */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def addInto(buf: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val acc = if (buf.length == 0) new Array[Double](n) else buf
    require(acc.length == n,
      s"graft_vec_sum: vector length $n != accumulator length ${acc.length}")
    var i = 0
    while (i < n) {
      // fail fast on a null ELEMENT, same stance as the length check —
      // getDouble on a null slot returns an undefined value, and silently
      // summing it would corrupt the centroid instead of flagging bad data
      require(!v.isNullAt(i),
        s"graft_vec_sum: null element at index $i (vectors must be dense)")
      acc(i) += (if (elemIsFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    acc
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    require(b1.length == b2.length,
      s"graft_vec_sum: merging length ${b2.length} into ${b1.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(offset: Int): GraftVecSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GraftVecSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftVecSumAgg =
    copy(child = newChildren.head)
}
