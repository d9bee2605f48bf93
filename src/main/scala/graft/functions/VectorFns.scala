package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over array<double>.
  *
  * The `zip_with`+`aggregate` formulation allocates an intermediate array
  * and boxes every element per pair — ruinous in a pairwise similarity
  * join. This expression is one generated static call over primitive
  * doubles. Summation order is left-to-right, identical to the
  * `aggregate` fold and DuckDB's list_inner_product, so oracle parity is
  * preserved.
  */
object VectorImpl {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product: vector lengths differ (${a.numElements()} vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  private def isDoubleArray(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorImpl.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct = copy(l, r)
  override def prettyName: String = "dot_product"
}

object VectorFns {
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2_norm(v: Column): Column = sqrt(dot_product(v, v))
}
