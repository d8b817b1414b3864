package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D44 — distributed triangle counting over an undirected edge list:
  * the basic graph-analytics primitive (cluster cohesion, community
  * density — here, how CLIQUE-LIKE the near-dup graph is, which is
  * what justifies treating dup components as interchangeable groups).
  *
  * Standard oriented wedge join: edges are stored once as (a < b), so
  * each triangle {a<b<c} is found exactly once by joining wedges
  * (a,b)+(b,c) against the closing edge (a,c). The orientation is the
  * scale trick — every triangle has exactly one low-to-high traversal,
  * so no triangle is counted 6 ways and the wedge build fans out on
  * out-degree under the total order (degree-ordering is the documented
  * refinement when id order correlates badly with degree). Two
  * edge-keyed shuffles; all frames are graph-sized, never corpus-
  * sized.
  */
object GraphStats {

  /** Per-node triangle counts; nodes in no triangle are absent.
    * `edges` must hold each undirected edge once as (id1 < id2). */
  def triangles(edges: DataFrame): DataFrame = {
    val ab = edges.select(col("id1").as("a"), col("id2").as("b"))
    val bc = edges.select(col("id1").as("b"), col("id2").as("c"))
    val ac = edges.select(col("id1").as("a"), col("id2").as("c"))
    ab.join(bc, Seq("b"))
      .join(ac, Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("node"))
  }

  /** The exact-content duplicate graph with TWO synthetic replicas per
    * seeded doc (so every seeded content forms a 3-clique): clique
    * edges within each md5 content group, stored low-to-high. The
    * per-group self-join is bounded by dup-group size — the quantity a
    * crawl dedup pipeline is sized around anyway. */
  def contentDupEdges(docs: DataFrame, dupMod: Long = 125): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val seeded = base.filter(col("doc_id") % dupMod === 0)
    val universe = base
      .unionByName(seeded.select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      .unionByName(seeded.select((col("doc_id") + 20000000L).as("doc_id"), col("text")))
      .select(col("doc_id"), md5(col("text")).as("ch"))
    universe.as("l").join(universe.as("r"), Seq("ch"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id1"), col("r.doc_id").as("id2"))
  }
}
