package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKD normalization as a native Catalyst expression with full
  * whole-stage-codegen support (no UDF boundary in the sanitize hot path).
  *
  * Port of `unicodedata.normalize("NFKD", s)` at reference
  * `sec_dl/utils/scrape_all_filings.py:99` — Java and Python both implement
  * Unicode normalization per UAX #15, so outputs agree.
  */
case class NfkdNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfkd requires STRING, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfkdNormalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.NfkdNormalize.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfkdNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfkd"
}

object NfkdNormalize {
  /** Called from generated code — keep signature stable. */
  def normalize(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)

  def apply(c: Column): Column = ColumnBridge.wrap(NfkdNormalize(ColumnBridge.unwrap(c)))
}
