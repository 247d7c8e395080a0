package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[QualityModel]]: learned quality filter — training recovers a planted
  * separable rule, scoring is the plain-arithmetic sigmoid of the fitted
  * weights (no UDF, no vector assembly at score time).
  */
class QualityModelSpec extends SparkFunSuite {
  import spark.implicits._

  // long docs (label 1) vs short docs (label 0) with a fat length margin
  private def labeledDocs = (1L to 20L).map { i =>
    val quality = i % 2 == 0
    val text =
      if (quality) ("the quick brown fox jumps over the lazy dog " * 12) + i
      else s"short $i"
    (i, text, if (quality) 1 else 0)
  }.toDF("doc_id", "text", "y")

  test("training recovers a planted separable rule exactly") {
    val df = QualityModel.withFeatures(labeledDocs, "text")
    val model = QualityModel.trainLR(df,
      QualityModel.featureColumns("text").map(_._1), "y")
    val got = QualityModel.scoreWithModel(labeledDocs, "text", model)
      .select("doc_id", "y", "quality_pred")
      .as[(Long, Int, Int)].collect()
    assert(got.forall { case (_, y, p) => y == p },
      s"misclassified: ${got.filter(t => t._2 != t._3).mkString(",")}")
    // the length feature must carry positive weight: longer => higher odds
    assert(model.weights.toMap.apply("f_len") > 0.0)
  }

  test("single-class input fits a degenerate-but-usable model (saturated Hessian)") {
    // every label 1: p -> 1 everywhere, the data Hessian vanishes and only
    // the ridge (plus the solver's damping) keeps the Newton system
    // invertible — the fit must terminate and predict the one class
    val oneClass = labeledDocs.withColumn("y", lit(1))
    val df = QualityModel.withFeatures(oneClass, "text")
    val model = QualityModel.trainLR(df,
      QualityModel.featureColumns("text").map(_._1), "y")
    assert(model.intercept.isFinite && model.weights.forall(_._2.isFinite))
    val preds = QualityModel.scoreWithModel(oneClass, "text", model)
      .select("quality_pred").as[Int].collect()
    assert(preds.forall(_ == 1))
  }

  test("empty training input returns the zero model") {
    val df = QualityModel.withFeatures(labeledDocs.limit(0), "text")
    val model = QualityModel.trainLR(df,
      QualityModel.featureColumns("text").map(_._1), "y")
    assert(model.intercept === 0.0)
    assert(model.weights.forall(_._2 === 0.0))
  }

  test("scoreColumn is the sigmoid of the literal weights (hand-checked)") {
    val model = QualityModel.LinearModel(-1.0,
      Seq("f_len" -> 2.0, "f_mean_tok_len" -> 0.0, "f_stop_ratio" -> 0.0,
        "f_punct_ratio" -> 0.0, "f_digit_ratio" -> 0.0))
    // one 500-char doc: f_len = 0.5, z = -1 + 2*0.5 = 0, sigmoid = 0.5
    val one = Seq((1L, "x" * 500)).toDF("doc_id", "text")
    val prob = QualityModel.scoreWithModel(one, "text", model)
      .select("quality_prob").as[Double].head()
    assert(math.abs(prob - 0.5) < 1e-12)
  }

  test("round-trip gate shape: fat-margin rule comes back perfectly classified") {
    val docs = (1L to 30L).map { i =>
      (i, ("word " * (if (i <= 10) 5 else if (i <= 20) 40 else 100)).trim)
    }.toDF("doc_id", "text")
    // label only the extremes; the 40-word middle band is left out
    val got = QualityModel.trainPredictRoundTrip(docs, "doc_id", "text",
        when(length(col("text")) <= 100, 0)
          .when(length(col("text")) >= 400, 1))
      .as[(Long, Int, Int)].collect()
    assert(got.length === 20) // the unlabeled middle band is excluded
    assert(got.forall { case (_, y, p) => y == p })
  }
}
