package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity (Jaro 1989; Winkler 1990) — the
  * record-linkage kernel (name matching, entity resolution) that
  * edit distance handles poorly: JW weights agreement near the string
  * START, where human-entered names diverge least.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (empirically
  * pinned by FunctionsSpec and the `text_jw_linkage` hash-oracle):
  * match window ⌊max(|a|,|b|)/2⌋ − 1, transpositions = half the
  * out-of-order matched positions, Jaro = (m/|a| + m/|b| + (m−t)/m)/3,
  * Winkler boost ℓ·0.1·(1−jaro) for the common prefix ℓ ≤ 4 applied
  * only when jaro > 0.7; empty input or zero matches ⇒ 0.0. Char
  * (UTF-16 unit) based — identical to byte-based engines on ASCII,
  * the domain of every oracled use.
  */
object GraftJaroWinklerImpl {
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order; t = half the
    // mismatched positions
    var k = 0
    var trans = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val t = trans / 2.0
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lmax = math.min(4, math.min(la, lb))
    while (l < lmax && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `graft_jaro_winkler(string, string)` → `double`: [[GraftJaroWinklerImpl]]
  * as an expression — one static call in codegen (the GraftCdcChunks
  * pattern), null-safe, deterministic. */
case class GraftJaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires (string, string), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftJaroWinklerImpl.jw(a.asInstanceOf[UTF8String],
                            b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftJaroWinklerImpl.jw($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftJaroWinkler =
    copy(left = newLeft, right = newRight)
}
