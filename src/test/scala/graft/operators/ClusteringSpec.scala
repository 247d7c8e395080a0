package graft.operators

import graft.SparkFunSuite
import graft.functions.{MatVec, NearestCentroid}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}

class ClusteringSpec extends SparkFunSuite {
  import spark.implicits._

  // two tight, well-separated clusters in 2D around (0,0) and (10,10)
  private def twoBlobs: DataFrame = Seq(
    (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)), (3L, Array(-0.1f, 0.1f)),
    (4L, Array(10.0f, 9.9f)), (5L, Array(9.9f, 10.1f)), (6L, Array(10.1f, 10.0f))
  ).toDF("vec_id", "embedding")

  test("NearestCentroid: squared-euclidean argmin, ties to lowest index") {
    val cents = Array(Array(0.0, 0.0), Array(4.0, 0.0))
    val got = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(3.0f, 0.0f)), (3L, Array(2.0f, 0.0f)))
      .toDF("id", "v")
      .select(col("id"), columnOf(NearestCentroid(expressionOf(col("v")), cents)).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(got(1L) == 0)
    assert(got(2L) == 1)
    assert(got(3L) == 0) // equidistant (dist 4 both) -> lowest index wins
  }

  test("NearestCentroidDist: min squared distance, bit-equal to the HOF fold") {
    val cents = Array(Array(0.0, 0.0), Array(4.0, 0.0))
    val df = Seq((1L, Array(1.0f, 0.5f)), (2L, Array(3.3f, -0.2f)), (3L, Array(2.0f, 0.0f)))
      .toDF("id", "v")
    val got = df.select(col("id"),
        columnOf(graft.functions.NearestCentroidDist(expressionOf(col("v")), cents)).as("d"),
        columnOf(NearestCentroid(expressionOf(col("v")), cents)).as("c"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getInt(2)))).toMap
    // cross-check against the interpreted zip_with/aggregate fold this
    // expression replaced — distance to the ASSIGNED centroid must be the
    // min distance, bitwise (same index-order double accumulation)
    val cdf = cents.toSeq.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toDF("c", "centroid")
    val hof = df.select(col("id"),
        columnOf(NearestCentroid(expressionOf(col("v")), cents)).as("c"), col("v"))
      .join(cdf, "c")
      .withColumn("d", expr(
        "aggregate(zip_with(v, centroid, (p, q) -> (CAST(p AS DOUBLE) - q) * (CAST(p AS DOUBLE) - q)), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("d"))).toMap
    got.foreach { case (id, (d, _)) => assert(d == hof(id), s"id=$id") }
    assert(got(1L)._1 == 1.25 && got(2L)._2 == 1)
  }

  test("MatVec: dense mat-vec product on float arrays, computed in double") {
    val mat = Array(Array(1.0, 2.0), Array(0.5, -1.0))
    val out = Seq((1L, Array(3.0f, 4.0f))).toDF("id", "v")
      .select(columnOf(MatVec(expressionOf(col("v")), mat)).as("p"))
      .as[Seq[Double]].head()
    assert(out == Seq(3.0 + 8.0, 1.5 - 4.0))
  }

  test("projectionMatrix is deterministic, has unit-scaled signs, and md5-parity entries") {
    val m1 = Clustering.projectionMatrix(4, 3)
    val m2 = Clustering.projectionMatrix(4, 3)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    val scale = 1.0 / math.sqrt(3.0)
    assert(m1.flatten.forall(v => v == scale || v == -scale))
    // spot-check one entry against an independently computed md5
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("2_1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = if (hex.charAt(0) < '8') scale else -scale
    assert(m1(1)(2) == expected)
  }

  test("kmeans separates two planted blobs and lands centroids on the means") {
    val (assigned, cents) = Clustering.kmeans(twoBlobs, "vec_id", "embedding",
      k = 2, iters = 3, dim = 2)
    val byId = assigned.as[(Long, Int)].collect().toMap
    assert(Set(byId(1L), byId(2L), byId(3L)).size == 1) // blob A in one cell
    assert(Set(byId(4L), byId(5L), byId(6L)).size == 1) // blob B in one cell
    assert(byId(1L) != byId(4L))
    val centA = cents(byId(1L))
    val centB = cents(byId(4L))
    assert(math.abs(centA(0) - 0.0) < 0.2 && math.abs(centA(1) - 0.066667) < 0.2)
    assert(math.abs(centB(0) - 10.0) < 0.2 && math.abs(centB(1) - 10.0) < 0.2)
    // centroid coordinates are 6-decimal fixed-point (partial-agg-order proof)
    cents.flatten.foreach { c =>
      assert(BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble == c)
    }
  }

  test("kmeans: a cell that loses all members keeps its previous centroid") {
    // k=3 seeds on 3 rows where two rows are identical: one seed cell ends
    // up empty after the first assignment (both dups go to the same cell)
    val df = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)), (3L, Array(5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val (assigned, cents) = Clustering.kmeans(df, "vec_id", "embedding",
      k = 3, iters = 2, dim = 2)
    assert(cents.length == 3) // no centroid dropped
    assert(assigned.count() == 3)
  }

  test("kmeans: corpus smaller than k degrades to per-row cells, empty corpus fails loud") {
    val tiny = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val (assigned, cents) = Clustering.kmeans(tiny, "vec_id", "embedding",
      k = 5, iters = 2, dim = 2)
    assert(cents.length == 2) // seeds bounded by available rows
    assert(assigned.as[(Long, Int)].collect().map(_._2).toSet == Set(0, 1))
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      Clustering.kmeans(empty, "vec_id", "embedding", k = 2, iters = 1, dim = 2))
  }

  test("knnClassify: leave-one-out majority vote with deterministic tie-breaks") {
    // 3 labeled points per class, classes in nearly opposite DIRECTIONS
    // (kNN is cosine-based): every point's 2 nearest non-self neighbors
    // share its class -> predicted == label everywhere
    val df = Seq(
      (1L, Array(1.0f, 0.05f), 7), (2L, Array(2.0f, 0.0f), 7), (3L, Array(1.5f, -0.05f), 7),
      (4L, Array(-0.05f, 1.0f), 9), (5L, Array(0.0f, 2.0f), 9), (6L, Array(0.05f, 1.5f), 9)
    ).toDF("vec_id", "embedding", "label")
    val out = Clustering.knnClassify(df, "vec_id", "embedding", "label", df, k = 2)
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(out.length == 6)
    out.foreach { case (id, label, predicted, votes) =>
      assert(predicted == label, s"vec $id predicted $predicted, true $label")
      assert(votes == 2L)
    }
  }

  test("knnClassify: self is excluded even under exact-duplicate cosine ties") {
    // vec 1,2,3 are identical vectors; with k=2 each must vote with the
    // OTHER two duplicates, never itself
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 1), (2L, Array(1.0f, 0.0f), 1), (3L, Array(1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Clustering.knnClassify(df, "vec_id", "embedding", "label", df, k = 2)
      .select("vec_id", "predicted").as[(Long, Int)].collect().toMap
    assert(out(1L) == 1) // neighbors {2:1, 3:2} -> tie 1 vs 1 -> lower label 1
    assert(out(2L) == 1) // neighbors {1:1, 3:2} -> lower label 1
    assert(out(3L) == 1) // neighbors {1:1, 2:1} -> label 1 with 2 votes
  }

  test("assign and randomProject are shuffle-free narrow maps (no Exchange)") {
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val plan1 = Clustering.assign(twoBlobs, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!plan1.contains("Exchange"), s"assign plan has a shuffle:\n$plan1")
    val plan2 = Clustering.randomProject(twoBlobs, "embedding", 2, 4)
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("Exchange"), s"project plan has a shuffle:\n$plan2")
    // the kmeans-stats shape: cell + inertia distance must be a pure
    // narrow map — no centroid join, no shuffle (the r11 regression was
    // exactly a broadcast join + interpreted fold here)
    val plan3 = twoBlobs.select(
        Clustering.assignCol("embedding", cents).as("cell"),
        Clustering.sqDistCol("embedding", cents).as("d"))
      .queryExecution.executedPlan.toString
    assert(!plan3.contains("Exchange") && !plan3.contains("Join"),
      s"cell+distance plan has a join/shuffle:\n$plan3")
  }

  test("randomProject preserves relative distances roughly (JL sanity)") {
    val d = 64
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(d)(j => (((i * 31 + j * 17) % 13) - 6).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Clustering.randomProject(df, "embedding", d, 16)
      .select("vec_id", "projected").as[(Long, Seq[Double])].collect().toMap
    // same vector projects identically; distinct vectors stay distinct
    assert(proj.values.toSeq.distinct.size == vecs.map(_._2.toSeq).distinct.size)
    // norms stay within a loose JL band (sign matrices are isometries in expectation)
    vecs.foreach { case (id, v) =>
      val orig = math.sqrt(v.map(x => x.toDouble * x).sum)
      val pr = math.sqrt(proj(id).map(x => x * x).sum)
      assert(pr > orig * 0.4 && pr < orig * 1.9, s"vec $id: $orig -> $pr")
    }
  }

  test("pruneByPrototype: distance is to the OWN centroid; hardest/easiest and TakeOrdered plan") {
    import spark.implicits._
    // one tight blob at (0,0) plus a far outlier; prototype = blob centroid
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0.1f, 0f)), (3L, Array(0f, 0.1f)),
      (4L, Array(10f, 10f))).toDF("vec_id", "embedding")
    val centroids = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val hard = Clustering.pruneByPrototype(df, "vec_id", "embedding",
        centroids, n = 2, hardest = true)
      .as[(Long, Int, Double)].collect()
    // 4 sits ON its own centroid (dist 0); the hardest are the blob's edge
    // members — prototype distance is to the OWN cell's centroid
    assert(hard.map(_._1).toSet === Set(2L, 3L))
    assert(hard.forall(r => math.abs(r._3 - 0.01) < 1e-6))
    val easy = Clustering.pruneByPrototype(df, "vec_id", "embedding",
        centroids, n = 2, hardest = false)
      .as[(Long, Int, Double)].collect()
    assert(easy.map(_._1).toSeq === Seq(1L, 4L)) // both exactly on centroids
    // no full sort: the global top-n must plan as TakeOrdered
    val plan = Clustering.pruneByPrototype(df, "vec_id", "embedding",
        centroids, n = 2).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("kCenterGreedy: picks the planted extremes, radius curve is non-increasing") {
    import spark.implicits._
    // four far corners + a dense blob near the first corner: greedy must
    // pick each remaining corner before any blob member
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0.1f, 0f)), (3L, Array(0f, 0.1f)),
      (10L, Array(100f, 0f)), (11L, Array(0f, 100f)), (12L, Array(100f, 100f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.kCenterGreedy(df, "vec_id", "embedding", k = 4)
      .orderBy("center_rank").as[(Int, Long, Double)].collect().toSeq
    assert(got.head === ((0, 1L, 0.0))) // deterministic min-id start
    assert(got.map(_._2).toSet === Set(1L, 10L, 11L, 12L))
    // corner 12 is farthest from (0,0): picked first, radius 2*100^2
    assert(got(1)._2 === 12L && math.abs(got(1)._3 - 20000.0) < 1e-6)
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a })
    // k=1 degenerates to the seed row alone
    assert(Clustering.kCenterGreedy(df, "vec_id", "embedding", 1)
      .as[(Int, Long, Double)].collect().toSeq === Seq((0, 1L, 0.0)))
  }

  test("hardNegatives: only other-label rows rank; the closest negative leads") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 0f), 0),     // anchor
      (2L, Array(0.99f, 0.1f), 0),// same label: NEVER a negative, however close
      (3L, Array(0.9f, 0.4f), 1), // hard negative (closest other-label)
      (4L, Array(0f, 1f), 1),     // easy negative
      (5L, Array(0f, 0f), 1)      // zero norm: dropped
    ).toDF("vec_id", "embedding", "label")
    val got = Clustering.hardNegatives(df, "vec_id", "embedding", "label",
        df.filter($"vec_id" === 1), k = 10)
      .orderBy("rank")
      .as[(Long, Int, Long, Double, Int)].collect().toSeq
    assert(got.map(_._3) === Seq(3L, 4L))
    assert(got.map(_._5).forall(_ == 1))
    assert(got(0)._4 > got(1)._4)
    // the label filter must sit under the rank window: no same-label row
    // may consume a rank position even when k is tight
    val tight = Clustering.hardNegatives(df, "vec_id", "embedding", "label",
        df.filter($"vec_id" === 1), k = 1)
      .as[(Long, Int, Long, Double, Int)].collect()
    assert(tight.length === 1 && tight.head._3 === 3L)
  }
}
