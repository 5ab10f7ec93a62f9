package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** `graft_theta_sketch(string[, lgK])` → `binary`: a mergeable theta
  * sketch of the column's distinct values (Apache DataSketches — the
  * classpath datasketches-java jar), with partial/final merge exactly like
  * [[GraftMinHashAgg]].
  *
  * Why beside HLL (`approx_count_distinct`): theta sketches support SET
  * ALGEBRA — union AND intersection — with bounded error, so corpus-level
  * questions like "how many distinct shingles do sources A and B share"
  * are one sketch per source plus a tiny pairwise intersect, instead of a
  * full shingle-level join. Below 2^lgK distinct items the sketch is in
  * exact mode: estimates are exact counts (the spec pins this).
  *
  * Scale shape: one sketch (≤ 2^lgK · 8 bytes) per group crosses the
  * shuffle; map-side partials union locally first.
  */
case class GraftThetaAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_sketch requires string, got $other")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      buffer.update(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString)
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArrayCompressed

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArrayCompressed

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftThetaAgg =
    copy(child = newChildren.head)
}

/** `graft_theta_est(binary)` → `double`: the distinct-count estimate of a
  * serialized theta sketch. CodegenFallback — it runs on aggregated rows
  * (one per group), never in a per-row hot path.
  */
case class GraftThetaEst(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_est requires binary, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_est"

  override def nullSafeEval(input: Any): Any =
    Sketches.heapifyCompactSketch(
      Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(newChild: Expression): GraftThetaEst =
    copy(child = newChild)
}

/** `graft_theta_intersect_est(binary, binary)` → `double`: estimated size
  * of the INTERSECTION of two theta sketches — the set operation HLL
  * cannot answer. CodegenFallback, same rationale as [[GraftThetaEst]].
  */
case class GraftThetaIntersectEst(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_intersect_est requires (binary, binary), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_intersect_est"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(Sketches.heapifyCompactSketch(
      Memory.wrap(a.asInstanceOf[Array[Byte]])))
    ix.intersect(Sketches.heapifyCompactSketch(
      Memory.wrap(b.asInstanceOf[Array[Byte]])))
    ix.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftThetaIntersectEst =
    copy(left = newLeft, right = newRight)
}

/** `graft_theta_is_exact(binary)` → `boolean`: true iff the serialized
  * theta sketch is still in exact mode (theta = 1.0, i.e. it retains
  * every distinct hash it ever saw, so estimates and intersections are
  * exact set algebra, not estimates). The precondition gate for the
  * exact-mode query tier — callers that DEPEND on exactness (e.g. a
  * DuckDB set-algebra oracle) assert this instead of assuming the data
  * scale stays under 2^lgK. CodegenFallback, same rationale as
  * [[GraftThetaEst]].
  */
case class GraftThetaIsExact(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_is_exact requires binary, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_theta_is_exact"

  override def nullSafeEval(input: Any): Any =
    !Sketches.heapifyCompactSketch(
      Memory.wrap(input.asInstanceOf[Array[Byte]])).isEstimationMode

  override protected def withNewChildInternal(newChild: Expression): GraftThetaIsExact =
    copy(child = newChild)
}
