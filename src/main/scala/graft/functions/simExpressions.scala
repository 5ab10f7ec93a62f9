package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity kernels' hot per-row
  * loops (optimization guide §1.2 step 2 / §4.1: built-ins and codegen
  * expressions over interpreted lambdas). Both existed before as
  * higher-order-function trees (`aggregate(transform(...))` /
  * `aggregate(zip_with(...))`) — HOFs are `CodegenFallback`, so every
  * evaluation interpreted the lambda AND materialized per-element
  * structs/arrays. On the r16 probe that interpretation was the two
  * biggest single tasks of the bench: the centroid-assign fold
  * (~23M cosines inside one AQE-coalesced task of `ann_maxsim_ivf`,
  * 12.1 s) and the MaxSim pair dot (12.8M `zip_with` dots in the
  * one-split `documents.parquet` scan task of `ann_maxsim`, 7.9 s).
  * Replacing the fold bodies with tight codegen loops changes NO
  * semantics: each expression documents the exact HOF tree it is
  * bit-equivalent to, and the oracle hashes certify the swap.
  */

/** `graft_argmax_cos(array<double>, array<struct<c_id: long, cv:
  * array<double>>>)` → `long`: the id of the element whose `cv` has the
  * greatest cosine similarity to the vector — bit-equivalent to the
  * former fold
  *
  * {{{
  * aggregate(
  *   transform(cents, c -> struct(graft_cosine(v, c.cv) AS cc,
  *                                c.c_id AS c_id)),
  *   CAST(NULL AS STRUCT<cc: DOUBLE, c_id: BIGINT>),
  *   (acc, s) -> CASE
  *     WHEN acc IS NULL THEN s
  *     WHEN s.cc > acc.cc OR (isnan(s.cc) AND NOT isnan(acc.cc)) THEN s
  *     WHEN acc.cc > s.cc OR (isnan(acc.cc) AND NOT isnan(s.cc)) THEN acc
  *     WHEN s.c_id < acc.c_id THEN s ELSE acc END).c_id
  * }}}
  *
  * Comparator semantics preserved exactly: NaN cosines rank GREATEST
  * (Spark's total order — a degenerate zero-norm centroid claims its
  * vectors deterministically), value ties break to the LOWEST c_id, and
  * an empty array yields NULL (the "no centroids" sentinel the callers
  * filter). The cosine inside is the same strict left-to-right
  * summation as [[GraftCosine]] (length mismatch throws — drifting dims
  * fail loudly). One tight loop per row, no per-element structs, stays
  * inside whole-stage codegen.
  *
  * PRECONDITION (ADVICE r16): the centroid ARRAY must not contain null
  * ELEMENTS — this kernel skips them, where the fold above would lock
  * onto a leading null accumulator and return NULL. Unreachable from
  * the one call site ([[graft.operators.GraftSimilarity.assignTo]]'s
  * `collect_list`, which never emits null elements); bit-equivalence is
  * claimed under that precondition, not unconditionally.
  */
case class GraftArgmaxCos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType &&
             f1.dataType.isInstanceOf[ArrayType] &&
             f1.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "graft_argmax_cos requires (array<double>, " +
        s"array<struct<long, array<double>>>), got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_cos"

  // the exact [[GraftCosine]] arithmetic — strict left-to-right, throw
  // on length mismatch
  private def cos(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_argmax_cos: vector lengths differ ($n vs ${y.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    val cents = right.eval(input)
    if (v == null || cents == null) return null
    val vv = v.asInstanceOf[ArrayData]
    val cs = cents.asInstanceOf[ArrayData]
    val m = cs.numElements()
    var found = false
    var bestCc = 0.0; var bestNull = false; var bestId = 0L
    var i = 0
    while (i < m) {
      if (!cs.isNullAt(i)) {
        val s = cs.getStruct(i, 2)
        val id = s.getLong(0)
        val cvNull = s.isNullAt(1)
        val cc = if (cvNull) 0.0 else cos(vv, s.getArray(1))
        if (!found) { found = true; bestCc = cc; bestNull = cvNull; bestId = id }
        else {
          // NaN ranks greatest; any NULL cosine falls through to the
          // id tiebreak (3-valued CASE semantics of the former fold)
          val sG = !cvNull && !bestNull &&
            ((java.lang.Double.isNaN(cc) && !java.lang.Double.isNaN(bestCc)) ||
             cc > bestCc)
          val aG = !cvNull && !bestNull &&
            ((java.lang.Double.isNaN(bestCc) && !java.lang.Double.isNaN(cc)) ||
             bestCc > cc)
          if (sG || (!aG && id < bestId)) {
            bestCc = cc; bestNull = cvNull; bestId = id
          }
        }
      }
      i += 1
    }
    if (found) bestId else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val cv = ctx.freshName("cv")
      val id = ctx.freshName("id")
      val cc = ctx.freshName("cc")
      val ccNull = ctx.freshName("ccNull")
      val found = ctx.freshName("found")
      val bestCc = ctx.freshName("bestCc")
      val bestNull = ctx.freshName("bestNull")
      val bestId = ctx.freshName("bestId")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val sG = ctx.freshName("sG")
      val aG = ctx.freshName("aG")
      // no generated line may BEGIN with '|': the assembled class body is
      // margin-stripped again downstream, which silently deletes a leading
      // "||" and leaves Java that Janino rejects ("is not a type"), felling
      // the whole stage back to interpreted eval
      s"""
        |final int $m = $cents.numElements();
        |boolean $found = false;
        |double $bestCc = 0.0; boolean $bestNull = false; long $bestId = 0L;
        |for (int $i = 0; $i < $m; $i++) {
        |  if ($cents.isNullAt($i)) continue;
        |  final org.apache.spark.sql.catalyst.InternalRow $s =
        |    $cents.getStruct($i, 2);
        |  final long $id = $s.getLong(0);
        |  final boolean $ccNull = $s.isNullAt(1);
        |  double $cc = 0.0;
        |  if (!$ccNull) {
        |    final org.apache.spark.sql.catalyst.util.ArrayData $cv =
        |      $s.getArray(1);
        |    final int $n = $v.numElements();
        |    if ($n != $cv.numElements()) {
        |      throw new IllegalArgumentException(
        |        "graft_argmax_cos: vector lengths differ (" + $n + " vs " +
        |        $cv.numElements() + ")");
        |    }
        |    double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |    for (int $j = 0; $j < $n; $j++) {
        |      final double $xv = $v.getDouble($j);
        |      final double $yv = $cv.getDouble($j);
        |      $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        |    }
        |    $cc = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |  }
        |  if (!$found) {
        |    $found = true; $bestCc = $cc; $bestNull = $ccNull; $bestId = $id;
        |  } else {
        |    final boolean $sG = !$ccNull && !$bestNull &&
        |      ((java.lang.Double.isNaN($cc) && !java.lang.Double.isNaN($bestCc)) ||
        |      $cc > $bestCc);
        |    final boolean $aG = !$ccNull && !$bestNull &&
        |      ((java.lang.Double.isNaN($bestCc) && !java.lang.Double.isNaN($cc)) ||
        |      $bestCc > $cc);
        |    if ($sG || (!$aG && $id < $bestId)) {
        |      $bestCc = $cc; $bestNull = $ccNull; $bestId = $id;
        |    }
        |  }
        |}
        |if ($found) { ${ev.value} = $bestId; } else { ${ev.isNull} = true; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftArgmaxCos =
    copy(left = newLeft, right = newRight)
}

/** `graft_idot(array<int>, array<int>)` → `long`: integer dot product —
  * bit-equivalent to the former
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)`
  * (per-element product in INT arithmetic — same wrap semantics — then
  * widened into the long sum; a null element poisons the sum to NULL
  * exactly like the fold). Length mismatch throws — `zip_with` would
  * null-pad the shorter side and poison the sum, but a bag of drifting
  * dims is a build bug and fails loudly here like [[GraftCosine]].
  * The MaxSim pair kernel: one tight loop per (query token, doc token)
  * pair instead of two interpreted lambdas and an allocated
  * intermediate array.
  */
case class GraftIntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_idot requires (array<int>, array<int>), got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_idot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_idot: vector lengths differ ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += (x.getInt(i) * y.getInt(i)).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  throw new IllegalArgumentException(
        |    "graft_idot: vector lengths differ (" + $n + " vs " +
        |    $b.numElements() + ")");
        |}
        |long $s = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |  $s += (long) ($a.getInt($i) * $b.getInt($i));
        |}
        |if (!${ev.isNull}) { ${ev.value} = $s; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftIntDot =
    copy(left = newLeft, right = newRight)
}
