package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** D87 — grid-blocked spatial neighbor self-join: all point pairs
  * within L∞ (Chebyshev) radius `r` — the geo/embedding-2D workhorse
  * behind "devices seen near each other", terminal-proximity fraud
  * screens and spatial dedup blocking.
  *
  * The naive form is the quadratic distance self-join (the DuckDB twin
  * IS that form, proving exactness). The scale plan is classic grid
  * blocking: snap each point to an r-sized cell, explode ONE side to
  * its 3×3 cell neighborhood, equi-join on the cell key, then apply
  * the exact distance filter. Every qualifying pair is found exactly
  * once — a pair (p,q) matches only where p's exploded neighborhood
  * covers q's unique home cell — so no post-dedup is needed. Cost is
  * 9·|pts| join rows against a cell-partitioned build side, never
  * |pts|²; the shuffle key is the cell, so density skew (a hot cell)
  * is AQE-splittable map-side granularity permitting.
  *
  * Points are synthesized deterministically from event ids (the
  * testdata has no native coordinates): two public multiplicative
  * hash constants (Knuth 2654435761, xxhash 2246822519) over distinct
  * small moduli spread ids uniformly over a domain² plane with zero
  * transcendentals — the identical integer arithmetic runs in the
  * DuckDB twin.
  */
object Spatial {

  /** Deterministic plane embedding of a key: exact-integer, twin-safe.
    * The pre-modulus keeps the product far from Long overflow for any
    * replica-shifted key (≤10¹² here, ceiling ~3.7×10¹⁵). */
  private def coord(key: org.apache.spark.sql.Column, preMod: Long,
                    mult: Long, domain: Long) =
    (key % preMod) * mult % domain

  def points(s: SparkSession, d: String, sampleMod: Long = 17L,
             domain: Long = 1000000L): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") % sampleMod === 0)
      .select(col("event_id").as("id"),
        coord(col("event_id"), 1000003L, 2654435761L, domain).as("x"),
        coord(col("event_id"), 1000033L, 2246822519L, domain).as("y"))

  /** All (id1 < id2) pairs within Chebyshev distance `r`, with the
    * distance — exact, via the 3×3 grid block. */
  def neighborPairs(s: SparkSession, d: String, r: Long = 20000L,
                    sampleMod: Long = 17L): DataFrame =
    pairsFromPoints(points(s, d, sampleMod), r)

  /** The grid-block core over any (id, x, y) frame (hand cases test
    * this directly — boundary-straddling pairs, coincident points). */
  def pairsFromPoints(pts: DataFrame, r: Long): DataFrame = {
    val home = pts
      .withColumn("cx", col("x").divide(r).cast("long"))
      .withColumn("cy", col("y").divide(r).cast("long"))
    // probe side: each point visits its 9-cell neighborhood
    val offsets = array((-1L to 1L).flatMap(dx => (-1L to 1L).map(dy =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
    val probe = home.select(col("id").as("id1"), col("x").as("x1"),
        col("y").as("y1"), col("cx"), col("cy"),
        explode(offsets).as("o"))
      .select(col("id1"), col("x1"), col("y1"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    val build = home.select(col("id").as("id2"), col("x").as("x2"),
      col("y").as("y2"), col("cx"), col("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id1") < col("id2") &&
        abs(col("x1") - col("x2")) <= r && abs(col("y1") - col("y2")) <= r)
      .select(col("id1"), col("id2"),
        greatest(abs(col("x1") - col("x2")), abs(col("y1") - col("y2"))).as("cheb"))
      .orderBy(col("id1"), col("id2"))
  }

  /** D89 — radius-capped NEAREST-neighbor join: each point's closest
    * other point within `r` (the kNN-join k=1 every spatial dedup /
    * entity-resolution blocker wants; points with no neighbor inside
    * the cap drop out — an UNCAPPED nearest neighbor is a global
    * problem no grid can block, and real pipelines always carry a
    * "beyond this distance it's not a match" cap anyway). Candidates
    * come from the same 3×3 grid block, symmetrized; the argmin is a
    * per-id window over candidate rows (grid-bounded, never n²) with
    * a (distance, id) tie-break so the answer is engine-independent. */
  def nearestNeighbors(s: SparkSession, d: String, r: Long = 20000L,
                       sampleMod: Long = 17L): DataFrame = {
    val pts = points(s, d, sampleMod)
    val pairs = pairsFromPoints(pts, r)
    val sym = pairs.select(col("id1").as("id"), col("id2").as("nn_id"), col("cheb"))
      .unionByName(pairs.select(col("id2").as("id"), col("id1").as("nn_id"), col("cheb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cheb"), col("nn_id"))
    sym.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("nn_id"), col("cheb"))
      .orderBy(col("id"))
  }
}
