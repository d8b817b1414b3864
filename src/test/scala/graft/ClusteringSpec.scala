package graft

import org.apache.spark.sql.functions._

import graft.ml.EmbeddingClustering

/** KMeans cell assignment for ANN partition pruning. */
class ClusteringSpec extends SparkSpec {

  test("kmeans assigns every vector to one of k cells, deterministically") {
    val cells = EmbeddingClustering.assignCells(spark, sf, k = 8)
    assert(cells.count() == 500)
    val distinct = cells.select("cell").distinct().count()
    assert(distinct > 1 && distinct <= 8)
    // seeded: a re-run gives the identical assignment
    val again = EmbeddingClustering.assignCells(spark, sf, k = 8)
    assert(cells.exceptAll(again).isEmpty)
  }
}
