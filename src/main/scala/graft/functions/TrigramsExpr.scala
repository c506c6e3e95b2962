package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pg_trgm `show_trgm` analog as a NATIVE Catalyst expression with codegen:
  * distinct padded character trigrams of a string (see
  * [[graft.text.Trigram.trigramSetImpl]] for the exact semantics). Same
  * preference order as WordShinglesExpr: native Expression > interpreted
  * higher-order chain, because the fuzzy-match corpus side runs this per
  * row inside a scan projection. SQL surface: `graft_trigrams`. */
case class TrigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_trigrams requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TrigramsExpr.trigramsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramsExpr.trigramsOf($c)")

  override protected def withNewChildInternal(newChild: Expression): TrigramsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_trigrams"
}

object TrigramsExpr {
  /** Called from generated code — keep signature stable (static forwarder
    * naming rule: see WordShinglesExpr.shinglesOf). */
  def trigramsOf(s: UTF8String): ArrayData = {
    val grams = graft.text.Trigram.trigramSetImpl(s.toString)
    val out = new Array[Any](grams.length)
    var i = 0
    while (i < grams.length) { out(i) = UTF8String.fromString(grams(i)); i += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    ColumnBridge.wrap(TrigramsExpr(ColumnBridge.unwrap(c)))
}
