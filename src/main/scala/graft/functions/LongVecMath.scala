package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer vector math for the ANN hot path.
  *
  * The composed form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` — runs
  * on Catalyst's interpreted higher-order-function path (ArrayTransform/
  * ArrayAggregate are CodegenFallback) and allocates an intermediate
  * array per row pair. These expressions generate a tight primitive
  * loop instead; same exact BIGINT arithmetic, so oracle parity is
  * untouched (SURVEY.md §5).
  */
object LongVecMath {

  /** Σ aᵢ·bᵢ over two BIGINT arrays (exact, no overflow at µ-scale). */
  def dotL(a: Column, b: Column): Column =
    Bridge.column(DotL(Bridge.expression(a), Bridge.expression(b)))

  /** Σ aᵢ² over a BIGINT array. */
  def norm2L(a: Column): Column =
    Bridge.column(Norm2L(Bridge.expression(a)))

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def norm2(a: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getLong(i); acc += v * v; i += 1 }
    acc
  }

  private[functions] def checkLongArray(name: String, dts: Seq[DataType]): TypeCheckResult =
    if (dts.forall {
      case ArrayType(LongType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$name expects ARRAY<BIGINT> arguments")
}

case class DotL(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_l"

  override def checkInputDataTypes(): TypeCheckResult =
    LongVecMath.checkLongArray(prettyName, Seq(left.dataType, right.dataType))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    LongVecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongVecMath.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotL =
    copy(left = l, right = r)
}

case class Norm2L(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "norm2_l"

  override def checkInputDataTypes(): TypeCheckResult =
    LongVecMath.checkLongArray(prettyName, Seq(child.dataType))

  protected override def nullSafeEval(a: Any): Any =
    LongVecMath.norm2(a.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.LongVecMath.norm2($a)")

  override protected def withNewChildInternal(newChild: Expression): Norm2L =
    copy(child = newChild)
}
