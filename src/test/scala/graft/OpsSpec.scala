package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup}
import graft.sources.Tables

/** Semantic properties of the E-section operators beyond oracle parity. */
class OpsSpec extends SparkSpec {

  test("minhash LSH recalls injected exact duplicates on all bands") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashLsh(docs, dupMod = 250).collect()
    val injected = docs.filter(col("doc_id") % 250 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    injected.foreach { id =>
      val hit = pairs.find(r => r.getLong(0) == id && r.getLong(1) == id + 10000000L)
      assert(hit.isDefined, s"dup pair for $id not recalled")
      assert(hit.get.getLong(2) == 4L, "exact dup must share all 4 bands")
    }
  }

  test("simhash of identical texts is identical, and near docs differ in few bits") {
    val docs = Tables.documents(spark, sf).limit(50)
    val doubled = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 5000L).as("doc_id"), col("text")))
    val sh = Dedup.simhash(doubled).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 50).foreach { i =>
      if (sh.contains(i.toLong))
        assert(sh(i.toLong) == sh(i.toLong + 5000L))
    }
  }

  test("brute-force ANN ranks a vector's exact duplicate first") {
    val emb = Tables.embeddings(spark, sf)
    // clone vec 3 as vec_id 9999: its top hit must be vec 3 with cos ~ 1
    val dup = emb.filter(col("vec_id") === 3)
      .select(lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val top = Ann.bruteForceTopK(emb.unionByName(dup), nQueries = 4, k = 1)
      .filter(col("q_id") === 3).collect()
    assert(top.length == 1)
    assert(top(0).getLong(1) == 9999L)
    assert(math.abs(top(0).getDouble(2) - 1.0) < 1e-9)
  }

  test("exact dedup groups identical content") {
    val docs = Tables.documents(spark, sf).limit(20)
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + 7000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars")))
    val groups = Dedup.exact(doubled).collect()
    assert(groups.forall(_.getLong(2) == 2L))
    assert(groups.forall(_.getLong(1) < 7000L))
  }
}
