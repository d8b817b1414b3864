package graft

import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, Dedup}
import graft.sources.Tables

/** Alternating large-star/small-star components: correctness on
  * adversarial (chain) graphs where min-label propagation's
  * O(diameter) rounds would not converge, and agreement with the
  * min-label operator on the real LSH candidate graph. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("a 200-node chain resolves to one component in O(log^2 n) rounds") {
    // chain 0-1-2-...-199: diameter 199; min-label would need ~200
    // rounds, star contraction must finish within 15.
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("id1", "id2")
    val labels = ConnectedComponents.components(pairs, maxRounds = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200)
    assert(labels.values.forall(_ == 0L), "whole chain must label to node 0")
  }

  test("mixed components: two cliques joined by a bridge, plus an isolated pair") {
    val cliqueA = for (i <- 0 to 3; j <- i + 1 to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 13; j <- i + 1 to 13) yield (i.toLong, j.toLong)
    val bridge = Seq((3L, 10L))
    val pair = Seq((100L, 101L))
    val pairs = (cliqueA ++ cliqueB ++ bridge ++ pair).toDF("id1", "id2")
    val labels = ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 to 3).forall(i => labels(i.toLong) == 0L))
    assert((10 to 13).forall(i => labels(i.toLong) == 0L),
      "bridged cliques are ONE component rooted at 0")
    assert(labels(100L) == 100L && labels(101L) == 100L)
  }

  test("min-label closure escalates to star contraction past its soft budget") {
    // a 120-deep chain can never close in 5 min-label rounds; the r6
    // 10x sweep hit exactly this cliff (a band-collision chain > 20
    // deep) — the closure must now hand off to the star contraction
    // and return the full transitive closure instead of throwing
    val pairs = (0L until 120L).map(i => (i, i + 1)).toDF("id1", "id2")
    val labels = Dedup.minLabelClosure(pairs, maxIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 121)
    assert(labels.values.forall(_ == 0L),
      "escalated closure must label the whole chain to node 0")
  }

  test("property: agrees with driver-side union-find on random graphs") {
    // deterministic LCG so the test is reproducible
    var seed = 0x9E3779B97F4A7C15L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (math.abs(seed >> 33) % bound).toInt
    }
    for (trial <- 1 to 3) {
      val n = 60 + trial * 20
      val pairs = (1 to n).map(_ => (next(n).toLong, next(n).toLong))
        .filter(p => p._1 != p._2)
      // reference: union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = nodes.map { v =>
        // component min = min node id sharing v's root
        val root = find(v.toInt)
        v -> nodes.filter(u => find(u.toInt) == root).min
      }.toMap
      val got = ConnectedComponents.components(pairs.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial mismatch")
    }
  }

  test("star contraction agrees with min-label propagation on the real LSH graph") {
    val docs = Tables.documents(spark, sf)
    val viaStars = Dedup.lshClustersScalable(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaLabels = Dedup.lshClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaStars == viaLabels)
  }
}
