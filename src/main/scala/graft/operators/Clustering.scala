package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space clustering and classification for corpus curation:
  * Lloyd's k-means (topic/domain bucketing of a document corpus before
  * mixture planning), leave-one-out kNN label voting (label-quality audit /
  * weak-label propagation), and Johnson-Lindenstrauss random projection
  * (dimensionality reduction ahead of pairwise work).
  *
  * Scale design, per operator:
  *  - k-means: centroids are k x dim doubles — driver-held, shipped inside
  *    a [[graft.functions.NearestCentroid]] expression (broadcast-without-a-
  *    join). Each Lloyd iteration is ONE narrow map (assignment) + ONE
  *    hash aggregate with map-side partial sums (64 per-dimension `sum`
  *    columns + a count), so the shuffle carries k rows x dim columns per
  *    input partition, never the corpus. Iteration count is fixed and
  *    small; each round's centroid update is rounded to 6 decimals so the
  *    result is independent of partial-aggregation order (cross-engine and
  *    run-to-run deterministic).
  *  - kNN classify: reuses [[Similarity.bruteForceTopK]]'s broadcast-query
  *    scan (the optimizer's WindowGroupLimit turns the rank filter into a
  *    map-side top-k before the exchange), then votes with one small hash
  *    aggregate over |queries| * k rows.
  *  - random projection: a pure narrow map via [[graft.functions.MatVec]];
  *    the projection matrix is deterministic from md5 parity, so there is
  *    no fitted model to store and any engine can regenerate it bit-for-bit.
  *
  * The reference security middleware has no analog (it rewrites SQL and
  * delegates execution); these are the curation-pipeline operators a 100 TB
  * training corpus needs around it.
  */
object Clustering {

  /** Deterministic sign matrix for JL projection: entry (j, i) is
    * +1/sqrt(outDim) when the first hex char of md5("i_j") is < '8', else
    * -1/sqrt(outDim). E[<Rx, Ry>] = <x, y> (Achlioptas 2003 database-
    * friendly projections, sign variant). md5 so any SQL engine can
    * reproduce the matrix exactly.
    */
  def projectionMatrix(dim: Int, outDim: Int): Array[Array[Double]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, dim) { (j, i) =>
      val h = mdt.digest(s"${i}_${j}".getBytes("UTF-8"))
      // first hex char < '8'  <=>  high nibble of byte 0 is < 8
      if (((h(0) >> 4) & 0xf) < 8) scale else -scale
    }
  }

  /** Project an Array[Float/Double] column to `outDim` dimensions with the
    * deterministic sign matrix. Narrow map, no shuffle.
    */
  def randomProject(df: DataFrame, vecCol: String, dim: Int, outDim: Int,
      as: String = "projected"): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    val mat = projectionMatrix(dim, outDim)
    df.withColumn(as, columnOf(graft.functions.MatVec(expressionOf(col(vecCol)), mat)))
  }

  private def nearestCol(vecCol: String, centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    columnOf(graft.functions.NearestCentroid(expressionOf(col(vecCol)), centroids))
  }

  /** Nearest-centroid cell (squared euclidean) as a Column — a pure narrow
    * map usable inline in any projection; the centroids from [[kmeans]] are
    * the whole model, so downstream queries re-derive assignments without
    * re-training or joining.
    */
  def assignCol(vecCol: String, centroids: Array[Array[Double]]): Column =
    nearestCol(vecCol, centroids)

  /** Squared euclidean distance to the nearest centroid (the per-row
    * inertia term) as a Column — narrow map via
    * [[graft.functions.NearestCentroidDist]]; pairs with [[assignCol]] so
    * cell + distance need no centroid join at all.
    */
  def sqDistCol(vecCol: String, centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
    columnOf(graft.functions.NearestCentroidDist(expressionOf(col(vecCol)), centroids))
  }

  /** Assignment of each row to its nearest centroid (squared euclidean) —
    * a pure narrow map; use with centroids from [[kmeans]] to re-derive
    * assignments without re-training (the centroids are the whole model).
    */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    VectorFunctions.register(df.sparkSession)
    df.select(col(idCol), nearestCol(vecCol, centroids).as("cell"))
  }

  /** k seed centroids: the k rows with the smallest (md5(id), id) — a
    * deterministic pseudo-random sample any engine can reproduce (unlike
    * xxhash64 ordering, md5 exists everywhere). Bounded k-row collect.
    */
  private[operators] def seedKmeans(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Double]] = {
    val seeds = df.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray)
    require(seeds.nonEmpty, s"kmeans: input has no rows to seed $k centroids")
    seeds
  }

  /** Lloyd's k-means: `iters` rounds of (assign to nearest centroid by
    * squared euclidean, recompute centroids as the member mean rounded to 6
    * decimals; a cell that loses all members keeps its previous centroid).
    * Returns the final per-row assignment `(idCol, cell)` plus the centroids.
    *
    * The per-dimension mean is computed as `dim` separate `sum` aggregate
    * columns (plus one count) in a single `groupBy(cell)` — Spark's partial
    * aggregation makes the shuffle k rows wide per input partition
    * regardless of corpus size, which is the property that survives a
    * 1000-executor scan. The 6-decimal rounding pins the result across
    * partial-agg orderings, so the operator is reproducible AND matches a
    * single-threaded oracle.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      dim: Int): (DataFrame, Array[Array[Double]]) = {
    VectorFunctions.register(df.sparkSession)
    val vecs = df.select(col(idCol), col(vecCol))
    var centroids = seedKmeans(vecs, idCol, vecCol, k)
    var it = 0
    while (it < iters) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col(vecCol), i + 1).cast("double")).as(s"_s$i"))
      // per-dimension COUNTS, not the member count: element_at returns NULL
      // past a short vector's end and sum() skips it — dividing by the full
      // member count would silently bias those dimensions toward 0 while
      // NearestCentroid keeps scoring the same rows on their real length
      val cnts = (0 until dim).map(i =>
        count(element_at(col(vecCol), i + 1)).as(s"_c$i"))
      val stats = vecs
        .groupBy(nearestCol(vecCol, centroids).as("cell"))
        .agg(count(lit(1)).as("_n"), (sums ++ cnts): _*)
        .collect() // bounded: k rows x (2*dim + 2) columns
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        val cell = r.getInt(0)
        var i = 0
        while (i < dim) {
          val cnt = r.getLong(2 + dim + i)
          if (cnt > 0) {
            // round each coordinate: partial-agg order must not leak into the result
            next(cell)(i) = BigDecimal(r.getDouble(2 + i) / cnt)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          } // else: no member reaches this dimension — keep the previous coordinate
          i += 1
        }
      }
      centroids = next
      it += 1
    }
    val assigned = vecs.select(col(idCol), nearestCol(vecCol, centroids).as("cell"))
    (assigned, centroids)
  }

  /** Leave-one-out k-nearest-neighbor label vote: for each query row,
    * the majority label among its k nearest corpus rows by cosine
    * (excluding the row itself; ties on cosine break to the lower vec_id,
    * ties on votes break to the larger vote count then the lower label).
    * Output: (vec_id, label, predicted, votes) — rows where
    * label != predicted are the label-audit signal.
    *
    * Queries ride broadcast against a single corpus scan (top-k+1 per query
    * collapses map-side via WindowGroupLimit); the vote is a hash aggregate
    * over |queries| * k rows. The corpus is scanned once and never
    * re-shuffled.
    */
  def knnClassify(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      col(labelCol).as("_qlabel"))
    // k+1 then drop self: self usually ranks first (cosine 1.0), but under
    // exact-duplicate ties it may not — either way the k best non-self
    // neighbors are a subset of the top k+1 rows (see re-rank below).
    val nn = Similarity.bruteForceTopK(corpus, q, idCol, vecCol, "query_id", "_qv", k + 1)
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val topk = nn.withColumn("_r", row_number().over(w)).filter(col("_r") <= k)
      .select(col("query_id"), col("vec_id"))
    // neighbor labels: topk is |queries| * k rows — the broadcast side
    val votes = corpus.select(col(idCol).as("vec_id"), col(labelCol).as("_nlabel"))
      .join(broadcast(topk), "vec_id")
      .groupBy(col("query_id"), col("_nlabel"))
      .agg(count(lit(1)).as("votes"))
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("_nlabel").asc)
    val predicted = votes.withColumn("_r", row_number().over(vw)).filter(col("_r") === 1)
      .select(col("query_id"), col("_nlabel").as("predicted"), col("votes"))
    predicted.join(broadcast(q.select(col("query_id"), col("_qlabel").as("label"))), "query_id")
      .select(col("query_id").as("vec_id"), col("label"), col("predicted"), col("votes"))
  }

  /** Data pruning by PROTOTYPE DISTANCE (Sorscher et al. 2022, "Beyond
    * neural scaling laws"): score each example by squared distance to its
    * own k-means centroid and keep the `n` hardest (far from prototype —
    * the big-data regime) or easiest (near — the small-data regime). The
    * self-supervised pruning metric that beat random selection in that
    * paper, here over the corpus' embedding column with the [[kmeans]]
    * centroids as prototypes.
    *
    * Shape: assignment + distance are one narrow map against the broadcast
    * k-row centroid table (centroids ride in the plan); the global top-n is
    * a TakeOrdered — map-side partial top-n per partition, n rows to the
    * driver side of the exchange, never a full sort. Output:
    * (idCol, cell, proto_dist) in selection order.
    */
  def pruneByPrototype(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], n: Int,
      hardest: Boolean = true): DataFrame = {
    // distance to the OWN (= nearest) centroid is exactly the min distance,
    // so cell + distance are two codegen'd narrow maps sharing the loop and
    // tie rule — no centroid join, no interpreted per-element fold (the
    // zip_with/aggregate form this replaces ran interpreted per element)
    val dist = df.select(col(idCol),
      assignCol(vecCol, centroids).as("cell"),
      sqDistCol(vecCol, centroids).as("_d"))
    val ordered =
      if (hardest) dist.orderBy(col("_d").desc, col(idCol))
      else dist.orderBy(col("_d").asc, col(idCol))
    ordered.limit(n)
      .select(col(idCol), col("cell"), round(col("_d"), 6).as("proto_dist"))
  }

  /** k-CENTER GREEDY coreset (Gonzalez 1985 2-approximation; Sener &
    * Savarese 2018 used exactly this selection for active-learning
    * coresets): pick the min-id row first, then repeatedly the row farthest
    * (max min-squared-distance) from every chosen center — the DIVERSE
    * subset, the complement of [[pruneByPrototype]]'s density-based pick.
    * Returns (center_rank, idCol, radius): `radius` is the max-min distance
    * at selection time, i.e. the coverage-radius curve that tells an
    * operator when k is enough (the 2-approx bound is on exactly this
    * value).
    *
    * The algorithm is inherently sequential in k, so the driver holds the
    * k chosen vectors (k x dim doubles — bounded by construction) and each
    * round is ONE corpus pass: the min-over-centers distance is a `least(
    * ...)` column built from the centers chosen so far (they ride in the
    * plan as literals), and the argmax is a 1-row TakeOrdered. Total cost
    * O(k) passes / O(k^2) distance terms — the standard trade until k is
    * large enough to persist a running min-distance column instead.
    */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v")).cache()
    try {
      val first = rows.orderBy(col("id")).limit(1)
        .as[(Long, Array[Float])].head()
      val centers = scala.collection.mutable.ArrayBuffer(
        (0, first._1, 0.0, first._2.map(_.toDouble)))
      var r = 1
      while (r < k) {
        // min-over-chosen-centers distance IS the nearest-centroid distance
        // with the chosen centers as the centroid set: one codegen'd narrow
        // map per round instead of r interpreted zip_with/aggregate folds
        // under a least(...) — same index-order arithmetic, same min
        val far = rows.select(col("id"), col("v"),
            sqDistCol("v", centers.map(_._4).toArray).as("d"))
          .orderBy(col("d").desc, col("id"))
          .limit(1).as[(Long, Array[Float], Double)].head()
        centers += ((r, far._1, far._3, far._2.map(_.toDouble)))
        r += 1
      }
      // HALF_UP to match the engines' round() (the gates' discipline)
      centers.toSeq.map(c => (c._1, c._2,
          BigDecimal(c._3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("center_rank", idCol, "radius")
    } finally rows.unpersist()
  }

  /** HARD-NEGATIVE mining for contrastive/embedding training: for each
    * anchor, the `k` most-similar corpus vectors with a DIFFERENT label —
    * the near-boundary pairs a triplet/InfoNCE loss learns most from
    * (Schroff 2015's semi-hard selection, batch-free form). The label
    * filter runs BEFORE the rank window, so every returned row is a true
    * negative and the window never wastes rank positions on positives.
    *
    * Same scan shape as [[Similarity.bruteForceTopK]]: anchors broadcast
    * against one corpus scan, and the rank-`<= k` filter rewrites to a
    * map-side top-k (WindowGroupLimit) so the exchange carries k rows per
    * (anchor, partition). Anchors are a bounded training-batch-sized set by
    * construction; for corpus-sized anchor sets, mine per-batch. Zero-norm
    * vectors drop (cosine undefined), as everywhere in the family.
    * Output: (query_id, rank, idCol, cosine, label).
    */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchors: DataFrame, k: Int): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val c = corpus
      .withColumn("_cnorm", sqrt(expr(s"graft_vec_dot($vecCol, $vecCol)")))
      .filter(col("_cnorm") > 0)
    val q = anchors.select(col(idCol).as("query_id"),
        col(vecCol).as("_qv"), col(labelCol).as("_qlabel"))
      .withColumn("_qnorm", sqrt(expr("graft_vec_dot(_qv, _qv)")))
      .filter(col("_qnorm") > 0)
    val scored = c.join(broadcast(q))
      .filter(col(labelCol) =!= col("_qlabel")) // negatives only, pre-rank
      .select(col("query_id"), col(idCol).as("vec_id"), col(labelCol),
        (expr(s"graft_vec_dot($vecCol, _qv)") / (col("_cnorm") * col("_qnorm")))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("cosine"), col(labelCol))
  }
}
