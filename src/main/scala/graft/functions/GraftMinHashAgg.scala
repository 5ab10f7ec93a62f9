package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_minhash_agg(token, k)` → `array<long>`: MinHash signature of a SET
  * OF ROWS — the aggregate-function tier of the extension pattern (operator:
  * `SampleNode`; scalar expression: `GraftMinHash`; aggregate: this).
  *
  * The buffer is a k-slot signature; `update` folds one token, `merge`
  * takes the element-wise min of two signatures — associative and
  * commutative, so Spark runs it partial/final with map-side combine: each
  * executor sketches its partition and only k longs per group cross the
  * wire. That mergeability is exactly what makes MinHash a distributed
  * sketch, and mirrors how the signature of a union is the element-wise min
  * of the signatures (`sig(A ∪ B) = min(sig(A), sig(B))` — asserted in
  * FunctionsSpec).
  *
  * Same Kirsch–Mitzenmacher double-hash family as `GraftMinHash`, so
  * aggregating exploded tokens equals hashing the collected distinct array.
  */
case class GraftMinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k > 0 && k <= 1024, s"minhash k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_agg requires a string column, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var g = GraftHashing.hash(s, GraftHashing.Seed1)
      val h2 = GraftHashing.hash(s, GraftHashing.Seed2) | 1L
      var j = 0
      while (j < k) {
        if (g < buf(j)) buf(j) = g
        g += h2
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): GraftMinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GraftMinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftMinHashAgg =
    copy(child = newChildren.head)
}
