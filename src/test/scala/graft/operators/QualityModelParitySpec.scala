package graft.operators

import graft.SparkFunSuite
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

/** Hardening receipt for the r18 Newton-Raphson rewrite of
  * [[QualityModel.trainLR]] (verdict r18 #7): the "same computed result"
  * claim must not rest only on fat-margin separable fixtures. On a
  * NON-separable noisy corpus the decision boundary is decided by the exact
  * optimum of the regularized objective, not by a wide margin — so parity
  * here pins the optimizer itself, not just the easy geometry.
  *
  * Reference: MLlib LogisticRegression minimizing the SAME objective —
  * Newton's Σ logloss + n·regParam/2·‖w‖² divided by n is MLlib's
  * mean logloss + regParam/2·‖w‖² with elasticNetParam 0,
  * standardization OFF, intercept fit but unregularized (both sides).
  * MLlib is test-scope reference machinery only; the production path
  * stays MLlib-free (that classload cost was the point of the rewrite).
  */
class QualityModelParitySpec extends SparkFunSuite {
  import spark.implicits._

  // lengths sweep through the boundary; ~1 in 6 labels flipped so the
  // classes genuinely overlap (no separating hyperplane exists)
  private def noisyDocs = (1L to 120L).map { i =>
    val words = 3 + (i % 40).toInt * 3 // 3..120 words
    val text = ("the quick brown fox jumps over a lazy dog now " * 12)
      .split(" ").take(words).mkString(" ") + s" tail$i"
    val clean = if (words >= 60) 1 else 0
    val y = if (i % 6 == 0) 1 - clean else clean // deterministic noise
    (i, text, y)
  }.toDF("doc_id", "text", "y")

  test("non-separable noisy corpus: Newton boundary matches MLlib L-BFGS on the same objective") {
    val featNames = QualityModel.featureColumns("text").map(_._1)
    val df = QualityModel.withFeatures(noisyDocs, "text")
      .localCheckpoint(eager = true)
    try {
      val reg = 0.01
      val model = QualityModel.trainLR(df, featNames, "y",
        maxIter = 100, regParam = reg, tol = 1e-9)

      val assembled = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(featNames.toArray).setOutputCol("features")
        .transform(df.withColumn("label", col("y").cast("double")))
      val mllib = new org.apache.spark.ml.classification.LogisticRegression()
        .setRegParam(reg).setElasticNetParam(0.0)
        .setStandardization(false).setFitIntercept(true)
        .setMaxIter(500).setTol(1e-10)
        .fit(assembled)

      // the corpus is actually non-separable: the reference model itself
      // misclassifies some training rows (otherwise this spec would be
      // another fat-margin fixture)
      val refPreds = mllib.transform(assembled)
        .select(col("doc_id"), col("label").cast("int").as("y_ref"),
          col("prediction").cast("int").as("pred_ref"),
          element_at(vector_to_array(col("probability")), 2).as("prob_ref"))
      val refErrs = refPreds.filter(col("y_ref") =!= col("pred_ref")).count()
      assert(refErrs > 0, "fixture must be non-separable")

      val joined = QualityModel.scoreWithModel(noisyDocs, "text", model)
        .select(col("doc_id"), col("quality_prob"), col("quality_pred"))
        .join(refPreds, Seq("doc_id"))
        .select(col("doc_id"), col("quality_prob"), col("quality_pred"),
          col("prob_ref"), col("pred_ref"))
        .as[(Long, Double, Int, Double, Int)].collect()
      assert(joined.length === 120)
      val maxProbDiff = joined.map(t => math.abs(t._2 - t._4)).max
      assert(maxProbDiff < 1e-3,
        s"probability parity broke: max |newton - mllib| = $maxProbDiff")
      val disagree = joined.filter(t => t._3 != t._5)
      assert(disagree.isEmpty,
        s"prediction parity broke on: ${disagree.map(_._1).mkString(",")}")
    } finally org.apache.spark.sql.graft.GraftSqlShims.unpersistCheckpoint(df)
  }
}
