package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a logistic-regression classifier over
  * cheap per-document features, the public recipe for corpus-scale quality
  * selection (Brown et al. 2020 trained an LR quality filter to select
  * WebText-like pages; CCNet and the FineWeb line use the same
  * classifier-score-then-threshold shape). The heuristic rules
  * ([[TextAnalysis.qualityScore]], Gopher, C4) stay as the bootstrap/weak
  * labelers; this turns labels into a LEARNED decision boundary.
  *
  * Scale split:
  *  - TRAIN is distributed MLlib L-BFGS — each iteration tree-aggregates a
  *    (d+1)-double gradient per partition, so a 100 TB corpus trains from
  *    any labeled subset without driver-side data movement.
  *  - SCORE abandons the ML transformer entirely: the fitted weights are
  *    folded into a plain column expression (`sigmoid(w·x + b)` over the
  *    feature columns), so scoring is whole-stage-codegen arithmetic in the
  *    scan projection — no UDF, no Vector assembly, no shuffle, and the
  *    model rides the PLAN (a few literal doubles), not a broadcast.
  */
object QualityModel {

  /** Deterministic per-document feature columns, all plain column
    * arithmetic (codegen'd, oracle-expressible): clipped length, mean token
    * length, stopword ratio, punctuation ratio, digit ratio.
    */
  def featureColumns(textCol: String): Seq[(String, Column)] = {
    val text = col(textCol)
    val nChars = length(text).cast("double")
    val nTok = TextAnalysis.tokenCount(text).cast("double")
    Seq(
      "f_len" -> least(nChars / lit(1000.0), lit(1.0)),
      "f_mean_tok_len" -> nChars / greatest(nTok, lit(1.0)),
      "f_stop_ratio" -> (TextAnalysis.stopwordCount(textCol).cast("double") /
        greatest(nTok, lit(1.0))),
      "f_punct_ratio" -> (TextAnalysis.punctCount(text).cast("double") /
        greatest(nChars, lit(1.0))),
      "f_digit_ratio" -> (length(regexp_replace(text, "[^0-9]", ""))
        .cast("double") / greatest(nChars, lit(1.0))))
  }

  /** Attach the feature columns to `df`. */
  def withFeatures(df: DataFrame, textCol: String): DataFrame =
    featureColumns(textCol).foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }

  /** A fitted linear quality model: plain doubles, serializable anywhere. */
  case class LinearModel(intercept: Double, weights: Seq[(String, Double)])

  /** Fit a binary LR on `labeled` (must contain the feature columns and a
    * 0/1 `labelCol`). Distributed: the only driver-side state is the
    * (d+1)-double coefficient vector.
    */
  def trainLR(labeled: DataFrame, featureCols: Seq[String], labelCol: String,
      maxIter: Int = 50, regParam: Double = 0.01,
      tol: Double = 1e-4): LinearModel = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("_fv")
      .transform(labeled.withColumn("_lbl", col(labelCol).cast("double")))
    // tol 1e-4 (vs MLlib's 1e-6 default): every L-BFGS iteration is a full
    // distributed pass, and a quality filter needs a stable decision
    // boundary, not 6-digit coefficient convergence — the last ~2x of
    // iterations move weights by amounts that cannot flip any prediction
    // at the margins this model is used with
    val m = new LogisticRegression()
      .setFeaturesCol("_fv").setLabelCol("_lbl")
      .setMaxIter(maxIter).setRegParam(regParam).setTol(tol)
      .fit(assembled)
    LinearModel(m.intercept,
      featureCols.zip(m.coefficients.toArray.toIndexedSeq))
  }

  /** The model as a column: `sigmoid(intercept + Σ w_i * f_i)` over the
    * feature columns — literal doubles in the plan, fully codegen'd.
    */
  def scoreColumn(model: LinearModel): Column = {
    val z = model.weights.foldLeft(lit(model.intercept)) {
      case (acc, (name, w)) => acc + col(name) * lit(w)
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Score `df` (feature columns computed here): adds `quality_prob` and
    * the thresholded `quality_pred`.
    */
  def scoreWithModel(df: DataFrame, textCol: String, model: LinearModel,
      threshold: Double = 0.5): DataFrame =
    withFeatures(df, textCol)
      .withColumn("quality_prob", scoreColumn(model))
      .withColumn("quality_pred",
        (col("quality_prob") >= threshold).cast("int"))

  /** The end-to-end gate shape: label a fat-margin subset by a stated rule,
    * train on it, predict it back. With a margin the planted rule is
    * linearly separable in the feature space, so the fitted model must
    * classify every training document correctly — which is what the oracle
    * states without having to know the learned weights.
    */
  def trainPredictRoundTrip(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column): DataFrame = {
    val labeled = withFeatures(docs, textCol)
      .withColumn("_y", labelCol.cast("double"))
      .filter(col("_y").isNotNull)
    val model = trainLR(labeled, featureColumns(textCol).map(_._1), "_y")
    scoreWithModel(labeled.select(col(idCol), col(textCol), col("_y")),
        textCol, model)
      .select(col(idCol), col("_y").cast("int").as("label"),
        col("quality_pred"))
  }
}
