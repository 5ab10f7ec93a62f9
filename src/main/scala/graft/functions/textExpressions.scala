package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize(text[, form])` → string: Unicode normalization of a
  * text column — the standard first step of corpus preparation (a corpus
  * mixing composed `é` and decomposed `e`+U+0301 defeats exact dedup,
  * fingerprinting, and tokenization until the encodings are unified).
  * `form` is one of `NFC` (default), `NFD`, `NFKC`, `NFKD`, validated at
  * construction so a typo fails at plan time, not per row.
  *
  * Scale story: real training corpora are overwhelmingly ASCII at the
  * byte level, and every Unicode normal form is the identity on pure
  * ASCII — so both eval and codegen first check
  * [[UTF8String.isFullAscii]] (a vectorizable byte scan) and return the
  * INPUT object unchanged, no decode, no allocation. Only rows that
  * actually contain multi-byte sequences pay the String round-trip
  * through `java.text.Normalizer` (the JDK's ICU-conformant
  * implementation — byte-identical to DuckDB's utf8proc
  * `nfc_normalize`, both implement UAX #15). The whole thing stays a
  * fused map inside whole-stage codegen: zero shuffle, zero UDF
  * boundary.
  */
case class GraftNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(GraftNormalize.Forms.contains(form),
    s"graft_normalize: form must be one of ${GraftNormalize.Forms.mkString("/")}, got '$form'")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize requires string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.isFullAscii) s
    else UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.valueOf(form)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = $c.isFullAscii() ? $c :
        |  org.apache.spark.unsafe.types.UTF8String.fromString(
        |    java.text.Normalizer.normalize($c.toString(),
        |      java.text.Normalizer.Form.$form));
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GraftNormalize =
    copy(child = newChild)
}

object GraftNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
