package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StructField, StructType}

/** Single-pass native statistics over raw FLOAT embedding arrays.
  *
  * The functions-only compositions (`transform` + `aggregate` /
  * `array_max`) run on Catalyst's interpreted higher-order-function path
  * and allocate an intermediate array per row; these expressions fold
  * the float array directly inside whole-stage codegen. Rounding is
  * ties-away-from-zero on the double value — for scale-0 rounding of a
  * shortest-repr decimal this is exactly what Spark's `round` (BigDecimal
  * HALF_UP) and DuckDB's `round` compute, so oracle parity is untouched.
  */
object FloatVecStats {

  /** round-half-away-from-zero, matching `round(x)` in both engines. */
  @inline def roundAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** Int8-style quantization stats: max_abs = max |xᵢ|, qᵢ =
    * round(xᵢ·127/max_abs), one struct (Σq, min q, max q) per vector. */
  def quantStatsL(a: Column): Column =
    Bridge.column(QuantStatsL(Bridge.expression(a)))

  /** Σ round(xᵢ·1e6)² — the exact-integer µ-scaled squared norm,
    * without materializing the scaled array. */
  def scaledNorm2L(a: Column): Column =
    Bridge.column(ScaledNorm2L(Bridge.expression(a)))

  def quantStats(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var maxAbs = 0d
    var i = 0
    while (i < n) {
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    var s = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    i = 0
    while (i < n) {
      val q = roundAway(a.getFloat(i).toDouble * 127d / maxAbs)
      s += q
      if (q < mn) mn = q
      if (q > mx) mx = q
      i += 1
    }
    InternalRow(s, mn, mx)
  }

  def scaledNorm2(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val q = roundAway(a.getFloat(i).toDouble * 1000000d)
      acc += q * q
      i += 1
    }
    acc
  }

  private[functions] def checkFloatArray(name: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$name expects ARRAY<FLOAT>")
    }
}

case class QuantStatsL(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("mn", LongType, nullable = false),
    StructField("mx", LongType, nullable = false)))
  override def prettyName: String = "quant_stats_l"

  override def checkInputDataTypes(): TypeCheckResult =
    FloatVecStats.checkFloatArray(prettyName, child.dataType)

  protected override def nullSafeEval(a: Any): Any =
    FloatVecStats.quantStats(a.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.FloatVecStats.quantStats($a)")

  override protected def withNewChildInternal(newChild: Expression): QuantStatsL =
    copy(child = newChild)
}

case class ScaledNorm2L(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "scaled_norm2_l"

  override def checkInputDataTypes(): TypeCheckResult =
    FloatVecStats.checkFloatArray(prettyName, child.dataType)

  protected override def nullSafeEval(a: Any): Any =
    FloatVecStats.scaledNorm2(a.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.FloatVecStats.scaledNorm2($a)")

  override protected def withNewChildInternal(newChild: Expression): ScaledNorm2L =
    copy(child = newChild)
}
