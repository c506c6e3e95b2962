package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a text column as a NATIVE Catalyst
  * expression with codegen — the no-UDF-boundary form of
  * `Dedup.shingleSetImpl` (text → lowercase → split on non-alphanumeric →
  * sliding k-window → insertion-ordered dedupe), so the near-dup pipeline's
  * first stage stays inside WholeStageCodegen and is SQL-registrable
  * (`graft_shingles`). Same preference order as NfkdNormalize: native
  * Expression > Scala UDF (the higher-order built-in chain is interpreted
  * and ~1000× slower per row — see Dedup.wordShingles). */
case class WordShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires (STRING, k >= 1), got (${child.dataType.catalogString}, $k)")

  override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.shinglesOf(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesExpr.shinglesOf($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object WordShinglesExpr {
  /** Called from generated code — keep signature stable. Named so it gets
    * a static forwarder: a companion `eval` is shadowed by the inherited
    * `Expression.eval(InternalRow)` and the generated Java would silently
    * fall back to interpreter mode (see PorterStemArrayExpr.stemAll). */
  def shinglesOf(s: UTF8String, k: Int): ArrayData = {
    val shingles = graft.ext.Dedup.shingleSetImpl(s.toString, k)
    val out = new Array[Any](shingles.length)
    var i = 0
    while (i < shingles.length) { out(i) = UTF8String.fromString(shingles(i)); i += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column, k: Int): Column =
    ColumnBridge.wrap(WordShinglesExpr(ColumnBridge.unwrap(c), k))
}
