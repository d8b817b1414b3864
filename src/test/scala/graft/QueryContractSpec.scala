package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Guard for the query-output contract: every `SparkEntry.queries` result
  * must have a flat, atomic schema. Nested output (ARRAY/MAP/STRUCT
  * columns) breaks any external canonicalizer that sorts/hashes rows —
  * exactly how `q_collection_funcs` and `q_inverted` went red in round 4
  * (pandas `sort_values` cannot factorize ndarray cells). Constructing
  * the DataFrame only analyzes the plan, so this covers all queries
  * cheaply; eager builders (checkpointed iteratives) run at sf0.001.
  */
class QueryContractSpec extends SparkSpec {

  test("every query output schema is flat and atomic") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val df = build(spark, sf)
        df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-atomic query output columns (serialize with array_join / " +
        s"to_json before returning): ${offenders.mkString(", ")}")
  }

  test("every query has an oracle") {
    // Since r6 there are NO allowed holes: q_approx_stats (the last
    // rows-only query) now emits exact+verdict columns both engines
    // agree on, so every query key must have oracle SQL.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries missing oracle SQL: ${noOracle.mkString(", ")}")
  }
}
