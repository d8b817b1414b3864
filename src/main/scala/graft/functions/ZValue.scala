package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/Z-order curve value: bit-interleaving of two non-negative
  * dimension keys (x → even bits, y → odd bits).
  *
  * The data-layout primitive behind multi-dimensional file skipping:
  * `repartitionByRange` + `sortWithinPartitions` on the z-value clusters
  * rows so every file's min/max statistics are tight on BOTH dimensions
  * — a scan filtered on either dimension prunes most files, which a
  * single-column sort only gives for its leading column. Used by
  * [[graft.ops.ZOrder]]; the same fold is expressible with
  * `aggregate(sequence(...))` (the DuckDB oracle mirrors that form), but
  * this expression is a single codegen'd primitive loop per row.
  */
object ZValue {

  def zValueL(x: Column, y: Column, bits: Int = 16): Column =
    Bridge.column(ZValueL(Bridge.expression(x), Bridge.expression(y), bits))

  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

case class ZValueL(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def prettyName: String = "z_value_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BIGINT inputs")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZValue.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValueL =
    copy(left = l, right = r)
}
