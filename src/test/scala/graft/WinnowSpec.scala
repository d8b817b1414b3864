package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Md5Prefix32
import graft.ops.Winnow

/** E55 — winnowing fingerprint selection (Schleimer et al. SIGMOD'03). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val Gram = 3
  private val W = 4
  private val PosB = 1L << 28

  /** Reference rightmost-min winnowing, computed by a plain loop. */
  private def bruteFingerprints(text: String): Set[(Long, Long)] = {
    val toks = text.split(" ", -1)
    if (toks.length < Gram + W - 1) return Set.empty
    val grams = (0 to toks.length - Gram).map { i =>
      Md5Prefix32.hash(UTF8String.fromString(toks.slice(i, i + Gram).mkString(" ")))
    }
    (0 to grams.length - W).map { p =>
      val wmin = (p until p + W).map(q => grams(q) * PosB + (PosB - 1 - q)).min
      (PosB - 1 - wmin % PosB, wmin / PosB)   // (sel_pos, g)
    }.toSet
  }

  test("E55: selection matches the brute-force rightmost-min reference") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(40).cache()
    val got = Winnow.fingerprints(docs, Gram, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, a) => id -> a.map(t => (t._2, t._3)).toSet }
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> bruteFingerprints(r.getString(1)))
      .filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("E55: any shared run of w+k-1 tokens yields a shared fingerprint") {
    // two docs that share exactly one 6-token window (w+k−1 = 6) amid
    // otherwise disjoint vocabulary — the paper's detection guarantee
    val shared = "s1 s2 s3 s4 s5 s6"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $shared b1 b2 b3 b4"),
      (2L, s"c1 c2 c3 $shared d1 d2 d3 d4 d5"),
      (3L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10")).toDF("doc_id", "text")
    val pairs = Winnow.sharedPairs(docs, Gram, W, dfCap = 100, minShared = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("E55: density lands near the 2/(w+1) expectation on real docs") {
    val prof = Winnow.profile(
      spark.read.parquet(s"$sf/documents.parquet"), Gram, W)
      .agg(sum($"n_fps").as("fps"), sum($"n_windows").as("wins"))
      .head()
    val density = prof.getLong(0).toDouble / prof.getLong(1)
    // expected 2/(w+1) = 0.4; synthetic-vocab gram ties push it around
    assert(density > 0.2 && density < 0.7, s"density $density")
  }

  test("E55: profile and pairs agree with their DuckDB-twin shapes") {
    val prof = Winnow.profile(spark.read.parquet(s"$sf/documents.parquet"))
    assert(prof.columns.toSeq ==
      Seq("doc_id", "n_windows", "n_fps", "density_ppm", "min_g", "max_g"))
    assert(prof.filter($"n_fps" > $"n_windows").isEmpty)
    assert(prof.count() > 0)
  }
}
