package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** E34 — SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with a cheap coarse
  * quantizer, then search for near-duplicate pairs ONLY within a
  * cluster — the published observation is that semantic duplicates land
  * in the same k-means cell, so the quadratic pair search shrinks from
  * O(N²) to O(Σ cellᵢ²).
  *
  * Scale posture: the pair join shuffles on the cell id — the same
  * bucketed-candidates discipline as the MinHash/SRP families (never
  * all-pairs). Cluster size is the knob: k grows with the corpus
  * (k ∝ N keeps E[cell] constant), so per-cell work stays bounded and
  * the whole operator is one shuffle + a cell-local quadratic verify.
  * The exact-cosine math reuses the ANN conventions (µ-scaled BIGINT
  * vectors, codegen'd DotL/Norm2L folds, one fixed IEEE op sequence) so
  * results are bit-identical cross-engine.
  *
  * Keeper rule: within a cluster, a vector is REMOVED iff some
  * smaller-id vector in the same cluster has cosine ≥ minCos to it
  * (SemDeDup keeps one exemplar per semantic-dup set; min-id is the
  * deterministic stand-in for their centroid-distance choice).
  */
object SemDedup {

  /** Per-vector verdict over a frame with (vec_id, embedding, cell):
    * (vec_id, cell, kept). `cell` is the coarse-quantizer assignment —
    * learned (seeded KMeans via [[graft.ml.EmbeddingClustering]]) in the
    * wired query, but any partition of the id space works.
    */
  def semanticDups(embWithCells: DataFrame, minCos: Double = 0.999): DataFrame = {
    val v = Ann.withScaledVec(embWithCells)
      .select(col("vec_id"), col("cell").cast(LongType).as("cell"),
        col("svec"), col("norm2"))
    val l = v.select(col("cell"), col("vec_id").as("id1"),
      col("svec").as("svec1"), col("norm2").as("norm21"))
    val r = v.select(col("cell"), col("vec_id").as("id2"),
      col("svec").as("svec2"), col("norm2").as("norm22"))
    // Cell-scoped pair search: one shuffle on the cell id, quadratic
    // only within a cell. id1 < id2 orients each pair at its would-be
    // keeper, so "appears as id2" == "has a smaller-id near-dup".
    // Cosine in the SAME fixed IEEE op sequence as the ANN family
    // (exact-int dot, two sqrts, one divide) so the DuckDB twin's
    // threshold comparison sees bit-identical doubles.
    val removed = l.join(r, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .filter(
        graft.functions.LongVecMath.dotL(col("svec1"), col("svec2"))
          .cast("double") /
          (sqrt(col("norm21").cast("double"))
            * sqrt(col("norm22").cast("double"))) >= lit(minCos))
      .select(col("id2").as("vec_id"))
      .distinct()
    v.select(col("vec_id"), col("cell"))
      .join(removed.withColumn("rm", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("rm").isNotNull, 0L).otherwise(1L).as("kept"))
      .orderBy(col("vec_id"))
  }
}
