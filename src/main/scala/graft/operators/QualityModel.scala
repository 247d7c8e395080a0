package graft.operators

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
    *
    * Ridge-regularized Newton-Raphson over plain column aggregations: each
    * iteration is ONE distributed aggregation — sums of
    * `(p - y)·x_i` (gradient) and `p(1-p)·x_i·x_j` (Hessian upper
    * triangle), all whole-stage-codegen arithmetic over the feature
    * columns — followed by a (d+1)x(d+1) solve of ~30 doubles on the
    * driver. For a handful of features this converges quadratically
    * (typically <10 passes), where first-order L-BFGS budgets `maxIter`
    * full passes; and nothing here assembles per-row vectors or leaves
    * codegen (the previous MLlib form paid a VectorAssembler UDF on every
    * row plus the one-time MLlib/Breeze classload, ~seconds of first-call
    * cost in a fresh JVM). Objective: Σ logloss + n·regParam/2·‖w‖²
    * (intercept unregularized) — same shape MLlib minimizes, so the
    * decision boundary on the separable fat-margin corpora this gate is
    * used with is unchanged (the oracle states predictions, not weights).
    */
  def trainLR(labeled: DataFrame, featureCols: Seq[String], labelCol: String,
      maxIter: Int = 50, regParam: Double = 0.01,
      tol: Double = 1e-4): LinearModel = {
    val d = featureCols.length
    val dim = d + 1 // augmented with the intercept slot (index d)
    // materialize the numeric training frame ONCE: the feature columns are
    // typically heavy text expressions (token/stopword/punct counts over
    // the raw documents), and without this every Newton pass — worse,
    // every one of the ~30 aggregate expressions within a pass, which do
    // not share subexpressions across aggregates — would recompute them
    // (measured 0.3-0.5 s/pass at sf0.1 uncheckpointed vs ~20 ms over the
    // cached doubles). d+1 doubles per labeled row, the same working set
    // MLlib's instance cache held.
    val frame = labeled.select(
      featureCols.map(c => col(c).cast("double").as(c)) :+
        col(labelCol).cast("double").as("_y"): _*)
      .localCheckpoint(eager = true)
    try {
    def x(i: Int): Column = if (i < d) col(featureCols(i)) else lit(1.0)
    val w = Array.fill(dim)(0.0)
    var n = 0L
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val z = (0 until dim).map(i => x(i) * lit(w(i))).reduce(_ + _)
      // p/q in a projection BELOW the aggregate: one sigmoid per row, then
      // the ~30 sums are plain multiply-adds over scalar columns
      val scored = frame.select((col("_y") +: (0 until d).map(i => x(i))) ++ Seq(
        (lit(1.0) / (lit(1.0) + exp(-z))).as("_p")): _*)
        .withColumn("_q", col("_p") * (lit(1.0) - col("_p")))
      val gradAggs = (0 until dim).map(i => sum((col("_p") - col("_y")) * x(i)))
      val hessAggs = for (i <- 0 until dim; j <- i until dim)
        yield sum(col("_q") * x(i) * x(j))
      val aggs = count(lit(1)) +: (gradAggs ++ hessAggs)
      val row = scored.agg(aggs.head, aggs.tail: _*).head()
      n = row.getLong(0)
      if (n == 0L) return LinearModel(0.0, featureCols.map(_ -> 0.0))
      val ridge = n * regParam
      val g = Array.tabulate(dim)(i => row.getDouble(1 + i) +
        (if (i < d) ridge * w(i) else 0.0))
      val h = Array.ofDim[Double](dim, dim)
      var k = 1 + dim
      for (i <- 0 until dim; j <- i until dim) {
        h(i)(j) = row.getDouble(k); h(j)(i) = h(i)(j); k += 1
      }
      for (i <- 0 until d) h(i)(i) += ridge
      // tiny damping keeps the solve stable even when every p has
      // saturated (single-class input) and the ridge is configured off
      for (i <- 0 until dim) h(i)(i) += 1e-12 * (1.0 + math.abs(h(i)(i)))
      val step = solveSymmetric(h, g)
      var maxStep = 0.0
      for (i <- 0 until dim) { w(i) -= step(i); maxStep = math.max(maxStep, math.abs(step(i))) }
      converged = maxStep <= tol
      iter += 1
    }
    LinearModel(w(d), featureCols.zip(w.take(d).toIndexedSeq))
    } finally {
      // the fitted weights are plain doubles; nothing reads the training
      // frame after the loop — release its blocks now, not at GC
      org.apache.spark.sql.graft.GraftSqlShims.unpersistCheckpoint(frame)
    }
  }

  /** Gaussian elimination with partial pivoting for the Newton system —
    * `dim` is at most a handful, so this is microseconds of driver work.
    */
  private def solveSymmetric(hIn: Array[Array[Double]], gIn: Array[Double]): Array[Double] = {
    val dim = gIn.length
    val a = Array.tabulate(dim, dim)((i, j) => hIn(i)(j))
    val b = gIn.clone()
    for (c <- 0 until dim) {
      var piv = c
      for (r <- c + 1 until dim) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      if (piv != c) { val t = a(c); a(c) = a(piv); a(piv) = t
        val tb = b(c); b(c) = b(piv); b(piv) = tb }
      val diag = a(c)(c)
      if (math.abs(diag) > 0.0) {
        for (r <- c + 1 until dim) {
          val f = a(r)(c) / diag
          if (f != 0.0) {
            for (j <- c until dim) a(r)(j) -= f * a(c)(j)
            b(r) -= f * b(c)
          }
        }
      }
    }
    val out = new Array[Double](dim)
    for (c <- dim - 1 to 0 by -1) {
      var s = b(c)
      for (j <- c + 1 until dim) s -= a(c)(j) * out(j)
      out(c) = if (math.abs(a(c)(c)) > 0.0) s / a(c)(c) else 0.0
    }
    out
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
