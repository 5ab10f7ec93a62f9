package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_freq_sketch(string[, maxMapSize])` → `binary`: a mergeable
  * frequent-items (Misra–Gries family) sketch of the column — Apache
  * DataSketches `ItemsSketch`, the same library tier as
  * [[GraftThetaAgg]].
  *
  * Why it exists: "top n-gram / token heavy hitters over 100 TB" via
  * `groupBy(term).count()` shuffles the FULL term cardinality (n-gram
  * spaces run to billions of keys). The sketch inverts the cost: each
  * partition keeps a capacity-bounded counter map, and only
  * `maxMapSize` (term, count) pairs per partial cross the shuffle —
  * one bounded buffer per group, vocabulary never travels. Guarantee:
  * any item with true count > N/maxMapSize is retained, and every
  * estimate satisfies est − maxError ≤ true ≤ est (NO_FALSE_NEGATIVES
  * extraction surfaces the bounds).
  *
  * EXACT MODE, the [[GraftThetaIsExact]] pattern: while distinct terms
  * stay under the purge threshold the sketch never decrements —
  * `getMaximumError == 0` — and every estimate is the exact count, so
  * a SQL `GROUP BY term` oracle hash-matches the extracted rows. The
  * catalog's oracled query ENFORCES that precondition in-plan with
  * [[GraftFreqIsExact]] instead of assuming the scale; past the
  * threshold the sketch degrades to its documented error bound
  * (spec-pinned), never to silence.
  */
case class GraftFreqAgg(child: Expression, maxMapSize: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_sketch requires string, got $other")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_sketch"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(new ArrayOfStringsSerDe)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftFreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftFreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftFreqAgg =
    copy(child = newChildren.head)
}

/** `graft_freq_items(binary)` → `array<struct<term, est, lb, ub>>`: the
  * NO_FALSE_NEGATIVES extraction of a serialized frequent-items sketch —
  * every true heavy hitter is present (possibly with some false
  * positives, each carrying its bounds). In exact mode lb = est = ub =
  * the exact count. CodegenFallback — runs on aggregated rows, one per
  * group, never in a per-row hot path.
  */
case class GraftFreqItems(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_items requires binary, got $other")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_freq_items"

  override def nullSafeEval(input: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe)
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map { r =>
      InternalRow(UTF8String.fromString(r.getItem),
                  r.getEstimate, r.getLowerBound, r.getUpperBound)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftFreqItems = copy(child = newChild)
}

/** `graft_freq_is_exact(binary)` → `boolean`: true iff the sketch never
  * purged (maximum error 0), i.e. every estimate is an exact count —
  * the enforced precondition of the exact-tier oracle, mirroring
  * [[GraftThetaIsExact]].
  */
case class GraftFreqIsExact(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_is_exact requires binary, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_freq_is_exact"

  override def nullSafeEval(input: Any): Any =
    ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]),
      new ArrayOfStringsSerDe).getMaximumError == 0L

  override protected def withNewChildInternal(
      newChild: Expression): GraftFreqIsExact = copy(child = newChild)
}
