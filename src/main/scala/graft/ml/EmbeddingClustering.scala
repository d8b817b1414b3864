package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** MLlib KMeans over the embedding column — the learned counterpart of
  * the IVF label-centroid quantizer in [[graft.ops.Ann]]: train coarse
  * cells on a sample, assign the full corpus, store the cell id as the
  * partition-pruning key for ANN probes.
  */
object EmbeddingClustering {

  def assignCells(s: SparkSession, d: String, k: Int = 10,
                  seed: Long = 42L): DataFrame =
    assignCellsDf(Tables.embeddings(s, d), k, seed)

  /** Same, over any frame with (vec_id, embedding) — the form the IVF
    * probe and tests compose with directly.
    *
    * The quantizer is FIT ON A SAMPLE and applied to the full corpus —
    * at 100 TB training on every vector is neither affordable nor
    * useful (coarse cells stabilize long before full coverage), while
    * assignment stays a single map-side pass. `sampleFraction` is
    * seeded, so assignments are reproducible run to run. */
  def assignCellsDf(embeddings: DataFrame, k: Int = 10,
                    seed: Long = 42L, sampleFraction: Double = 0.25): DataFrame = {
    val emb = embeddings
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(emb.sample(withReplacement = false, sampleFraction, seed))
    model.transform(emb).select(
      (embeddings.columns.filter(_ != "embedding").map(col) :+ col("cell")): _*)
  }
}
