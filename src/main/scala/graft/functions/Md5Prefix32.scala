package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 32-bit md5-prefix hash: the first 4 digest bytes as an
  * unsigned BIGINT — semantically `conv(substr(md5(x),1,8),16,10)` (and
  * DuckDB's `('0x'||substr(md5(x),1,8))::BIGINT`) without materializing
  * the 32-char hex string and re-parsing it. This sits in the hot loop
  * of every MinHash/SimHash/fingerprint scan, where the built-in
  * composition costs an extra UTF8String alloc + base conversion per
  * value.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${other.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    Md5Prefix32.hash(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object Md5Prefix32 {
  private val digestPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes, big-endian, zero-extended — called from both the
    * interpreted path and generated Java. */
  def hash(s: UTF8String): Long = {
    val md = digestPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def apply(c: Column): Column =
    Bridge.column(Md5Prefix32(Bridge.expression(c)))
}
