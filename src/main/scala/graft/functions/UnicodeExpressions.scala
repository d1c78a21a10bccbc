package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical composition (java.text.Normalizer, stdlib) as
  * a codegen'd scalar expression. Why it exists: the exact-dedup
  * fingerprint normalizes case/punctuation/whitespace but NOT Unicode
  * forms, so the composed ("café", U+00E9) and decomposed ("cafe" +
  * U+0301) spellings of the SAME text — both common in a real
  * multilingual crawl (NFC from most web text, NFD from macOS file
  * paths / some OCR) — fingerprint differently and defeat exact dedup.
  * DuckDB twin: `nfc_normalize`.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for the overwhelming majority of real text (ASCII is always
  * NFC), so the scan-stage cost is one verification pass unless a
  * row actually needs composing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("nfcStr")
      s"""String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str,
         |    java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String
         |    .fromString(java.text.Normalizer.normalize($str,
         |      java.text.Normalizer.Form.NFC));
         |}""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(c)
}

object UnicodeFunctions {
  /** Unicode NFC composition (see [[NfcNormalize]]). */
  def nfc(c: Column): Column =
    GraftShims.column(NfcNormalize(GraftShims.expression(c)))
}
