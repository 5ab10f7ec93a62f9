package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_mmr(array<struct<id, rel, v>>, k, lambda)` →
  * `array<struct<id: long, score: double>>`: Maximal Marginal Relevance
  * (Carbonell & Goldstein, SIGIR 1998) greedy re-ranking of ONE query's
  * candidate list — the diversity stage of a retrieval serve, where the
  * top-k must not be k near-copies of the same document.
  *
  * Selection i maximizes `λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)`
  * (the penalty term is 0 for the first pick); ties resolve to the
  * LOWER id — the same deterministic tie-break as `graft_topk`, and the
  * property that makes a SQL oracle replay the greedy walk bit-for-bit
  * (all arithmetic is plain IEEE doubles in a fixed evaluation order:
  * `λ·rel − (1−λ)·pen` with the same index-order cosine as
  * `graft_cosine`). Output structs are in SELECTION ORDER with the
  * objective value at selection time.
  *
  * Deliberately an eval-only expression (CodegenFallback): it runs once
  * per QUERY on a candidate array bounded by the serving contract
  * (kCand ≤ a few dozen), after the heavy candidate generation — its
  * O(k·kCand·dim) is noise next to the corpus scan, and a bespoke
  * codegen body for array-of-struct-of-array traversal would buy
  * nothing measurable. Input order does not matter: the greedy argmax
  * is computed over the whole remaining set each round, so any
  * `collect_list` ordering yields the identical output.
  */
case class GraftMmr(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
           StructField(_, LongType, _, _),
           StructField(_, DoubleType, _, _),
           StructField(_, ArrayType(DoubleType, _), _, _))), _)
         if k >= 1 && lambda >= 0.0 && lambda <= 1.0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "graft_mmr requires array<struct<id: long, rel: double, " +
      s"v: array<double>>> with k >= 1 and lambda in [0, 1]; got $other " +
      s"(k=$k, lambda=$lambda)")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))))
  override def prettyName: String = "graft_mmr"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"graft_mmr: candidate vector lengths differ " +
        s"(${a.length} vs ${b.length})")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      vecs(i) = row.getArray(2).toDoubleArray()
      // zero-norm refusal (ADVICE r13): cos() against a zero-norm vector
      // is NaN, NaN comparisons never update maxSim, and a candidate whose
      // penalty stays -Infinity scores +Infinity from the second pick on —
      // force-selected regardless of relevance. Mirror probeCells' stance
      // on zero-norm queries: fail loudly up front, deterministically,
      // instead of silently corrupting the greedy.
      var nn = 0.0
      var j = 0
      while (j < vecs(i).length) { nn += vecs(i)(j) * vecs(i)(j); j += 1 }
      if (nn == 0.0)
        throw new IllegalArgumentException(
          s"graft_mmr: candidate ${ids(i)} has a zero-norm vector — the " +
          "cosine diversity penalty is undefined; filter zero-norm rows " +
          "before the MMR stage (the probeCells refusal, applied to " +
          "candidates)")
      i += 1
    }
    // greedy MMR: maxSim(c) is updated incrementally after each pick —
    // O(k·n·dim) with the argmax recomputed over the remaining set each
    // round, so input order is irrelevant to the output
    val taken = new Array[Boolean](n)
    // the TRUE max-sim-to-selected (it can be negative — clamping at 0
    // would under-penalize anti-correlated picks and diverge from the
    // textbook objective); the empty selected set carries penalty 0.0
    // exactly, which only ever applies to the first pick
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val outRows = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    val oneMinus = 1.0 - lambda
    var picks = 0
    while (picks < k && picks < n) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val pen = if (picks == 0) 0.0 else maxSim(i)
          val s = lambda * rels(i) - oneMinus * pen
          if (best < 0 || s > bestScore ||
              (s == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      taken(best) = true
      outRows += InternalRow(ids(best), bestScore)
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val c = cos(vecs(i), vecs(best))
          if (c > maxSim(i)) maxSim(i) = c
        }
        i += 1
      }
      picks += 1
    }
    new GenericArrayData(outRows.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): GraftMmr =
    copy(child = newChild)
}
