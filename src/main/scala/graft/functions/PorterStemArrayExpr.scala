package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Porter

/** Porter-stems every element of a string array as a native Catalyst
  * expression with codegen — removes the last UDF boundary from the
  * tokenize pipeline (F1), so sanitize → tokenize → match runs as one
  * WholeStageCodegen span. SQL name: `graft_stem_array`. */
case class PorterStemArrayExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_stem_array requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PorterStemArrayExpr.stemAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterStemArrayExpr.stemAll($c)")

  override protected def withNewChildInternal(newChild: Expression): PorterStemArrayExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_stem_array"
}

object PorterStemArrayExpr {
  /** Called from generated code — keep signature stable. Must NOT be named
    * `eval`: a companion method shadowed by the class's inherited
    * `Expression.eval(InternalRow)` gets no static forwarder, so the
    * generated Java resolved the INSTANCE method, failed to compile, and
    * the whole predicate silently fell back to interpreter mode. */
  def stemAll(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) null
        else UTF8String.fromString(Porter.stem(a.getUTF8String(i).toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = ColumnBridge.wrap(PorterStemArrayExpr(ColumnBridge.unwrap(c)))
}
