package graft

import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator

import graft.ml.FraudScorer

/** H1 — MLlib fraud scorer end to end on the sf0.001 tables. */
class MlSpec extends SparkSpec {

  test("H3: fitted pipeline round-trips through save/load with identical scores") {
    import graft.ml.FraudScorer
    val tf = FraudScorer.trainingFrame(spark, sf).cache()
    val model = FraudScorer.pipeline().fit(tf)
    val dir = java.nio.file.Files.createTempDirectory("graft_model")
      .resolve("m").toString
    model.write.overwrite().save(dir)
    val back = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(tf).select("user_id", "prediction")
    val b = back.transform(tf).select("user_id", "prediction")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("scorer trains and separates rule-flagged users") {
    val tf = FraudScorer.trainingFrame(spark, sf)
    assert(tf.count() > 0)
    assert(tf.filter("label = 1.0").count() > 0)

    val model = FraudScorer.pipeline().fit(tf)
    val scored = model.transform(tf)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .evaluate(scored)
    assert(auc >= 0.5 && auc <= 1.0)
    assert(scored.select("prediction").distinct().count() >= 1)
  }
}
