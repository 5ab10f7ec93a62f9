package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_vec_sum_long(array<long|int>)` → `array<long>`: EXACT element-wise
  * Int64 vector sum — the fixed-point companion to [[GraftVecSumAgg]].
  *
  * Why it exists: the double-summing aggregate is exact only while every
  * partial sum stays under 2^53; a second-moment (gram/covariance)
  * accumulation of q-grid products blows through that by ~10^4 rows per
  * component pair at a 2^20 grid. Int64 accumulation is exact to 2^63 in
  * ANY merge order — at a 2^10 quantization grid (products ≤ 2^20) the sum
  * stays exact past 10^12 rows, i.e. the full 100-TB corpus — and
  * `Math.addExact` turns a genuine overflow into a loud error instead of a
  * silently wrapped statistic.
  *
  * Same scale shape as [[GraftVecSumAgg]]: partial/final with map-side
  * combine, one dense accumulator per executor partition, only `dims`
  * longs per group cross the shuffle.
  */
case class GraftVecSumLongAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vec_sum_long"

  private lazy val elemIsInt: Boolean = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum_long requires array<long> or array<int>, got $other")
  }

  /** empty = "no vector seen yet" (dims unknown until the first input) */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], v: ArrayData): Array[Long] = {
    val n = v.numElements()
    val acc = if (buf.length == 0) new Array[Long](n) else buf
    require(acc.length == n,
      s"graft_vec_sum_long: vector length $n != accumulator length " +
      s"${acc.length}")
    var i = 0
    while (i < n) {
      require(!v.isNullAt(i),
        s"graft_vec_sum_long: null element at index $i (vectors must be " +
        "dense)")
      acc(i) = Math.addExact(
        acc(i), if (elemIsInt) v.getInt(i).toLong else v.getLong(i))
      i += 1
    }
    acc
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    require(b1.length == b2.length,
      s"graft_vec_sum_long: merging length ${b2.length} into ${b1.length}")
    var i = 0
    while (i < b1.length) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): GraftVecSumLongAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GraftVecSumLongAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftVecSumLongAgg =
    copy(child = newChildren.head)
}
