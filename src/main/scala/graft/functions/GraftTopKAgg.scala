package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-≤k min-heap ordered by "weakness" — the
  * weakest kept element (lowest score; among equal scores, the HIGHEST id,
  * since ties resolve to the lower id) sits at the root and is evicted
  * first. All operations are O(log k); memory is exactly k slots.
  */
private[graft] final class TopKBuf(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** Is element at i weaker (evicted before) than the one at j? */
  private def weaker(i: Int, j: Int): Boolean =
    scores(i) < scores(j) || (scores(i) == scores(j) && ids(i) > ids(j))

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && weaker(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var w = i
      if (l < size && weaker(l, w)) w = l
      if (r < size && weaker(r, w)) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def offer(s: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (scores(0) < s || (scores(0) == s && ids(0) > id)) {
      // the incoming pair beats the weakest kept element — replace the root
      scores(0) = s; ids(0) = id; siftDown(0)
    }

  /** Indices of kept elements sorted strongest-first (score desc, id asc). */
  def sortedStrongestFirst: Array[Int] =
    (0 until size).toArray.sortBy(i => (-scores(i), ids(i)))
}

/** `graft_topk(score, id, k)` → `array<struct<score: double, id: bigint>>`:
  * the k highest-scoring (score, id) pairs of a group, strongest first,
  * ties to the lower id — a MERGEABLE bounded top-k, the aggregate-tier
  * answer to per-key top-k at scale.
  *
  * A `row_number() OVER (PARTITION BY key ORDER BY score)` window must
  * shuffle and sort EVERY candidate row of a key; this aggregate runs
  * partial/final with map-side combine, so each executor keeps a k-slot
  * heap per key and only k (score, id) pairs per key cross the wire —
  * at 100 TB the shuffle volume drops from |candidates| to k·|keys|.
  * `merge` folds one heap into the other (associative, commutative), the
  * same mergeability argument as [[GraftMinHashAgg]].
  *
  * Scores must not be NaN (cosines of nonzero vectors never are).
  */
case class GraftTopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0 && k <= 65536, s"topk k must be in [1, 65536], got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var j = 0
    while (j < b2.size) { b1.offer(b2.scores(j), b2.ids(j)); j += 1 }
    b1
  }

  override def eval(buf: TopKBuf): Any = {
    val order = buf.sortedStrongestFirst
    new GenericArrayData(order.map(i =>
      InternalRow(buf.scores(i), buf.ids(i)): Any))
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuf(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble(), bb.getLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GraftTopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GraftTopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftTopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}
