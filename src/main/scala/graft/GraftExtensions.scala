package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.Md5Prefix32

/** Session extensions: registers the engine's native expressions for SQL
  * use. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("md5_prefix32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "md5_prefix32"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix32(children.head)))
  }
}
