package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Signed-random-projection signature (Charikar's SRP-LSH) as a native
  * expression: all `bits` projections of a BIGINT vector in ONE pass
  * over the array. The composed form (one `zip_with`+`aggregate` fold
  * per bit) traverses the array `bits` times on Catalyst's interpreted
  * HOF path and allocates a zipped array per bit per row.
  *
  * The ±1 sign matrix derives from the shared 32-bit md5 prefix of
  * "j_i" — the same derivation the DuckDB oracle rebuilds in SQL, so
  * bucket membership is bit-identical cross-engine (exact BIGINT sums,
  * sign test, OR into a 64-bit signature).
  */
object SrpSig {

  def sigL(vec: Column, bits: Int): Column =
    Bridge.column(SrpSigL(Bridge.expression(vec), bits))

  /** w(j,i) ∈ {-1,+1} from the low bit of md5("j_i")'s first 8 hex
    * chars (== the engine-wide h32). */
  def srpSign(j: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${j}_$i".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1L else -1L
  }

  // Per-JVM sign-matrix cache: deterministic, so executors rebuild the
  // identical matrix independently; keyed by (bits, dim).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  private def signs(bits: Int, dim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((bits, dim), { case (b, d) =>
      Array.tabulate(b, d)((j, i) => srpSign(j, i))
    })

  def sig(a: ArrayData, bits: Int): Long = {
    val d = a.numElements()
    val w = signs(bits, d)
    var out = 0L
    var j = 0
    while (j < bits) {
      val wj = w(j)
      var acc = 0L
      var i = 0
      while (i < d) { acc += wj(i) * a.getLong(i); i += 1 }
      if (acc >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

case class SrpSigL(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_sig_l"

  override def checkInputDataTypes(): TypeCheckResult =
    LongVecMath.checkLongArray(prettyName, Seq(child.dataType))

  protected override def nullSafeEval(a: Any): Any =
    SrpSig.sig(a.asInstanceOf[ArrayData], bits)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SrpSig.sig($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SrpSigL =
    copy(child = newChild)
}
