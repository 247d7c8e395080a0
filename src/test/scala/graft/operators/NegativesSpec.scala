package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class NegativesSpec extends SparkFunSuite {
  import spark.implicits._

  // anchor 1 with exact clone 2; 3 is close-but-not-positive; 4/5 far
  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(1.0f, 0.0f, 0.0f), 0),     // clone of 1: cosine 1
    (3L, Array(0.9f, 0.4f, 0.0f), 1),     // cosine ~0.91 to anchor
    (4L, Array(0.0f, 1.0f, 0.0f), 1),
    (5L, Array(0.0f, 0.0f, 1.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("hardNegatives drops positives and self, re-ranks the rest") {
    val q = vecs.filter($"vec_id" === 1)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val out = Similarity.hardNegatives(vecs, q, "vec_id", "embedding",
      "query_id", "qv", k = 3, positiveThreshold = 0.95)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toList
    // clone 2 (cosine 1 >= .95) and self are gone; 3 is the best negative
    assert(out.map(_._2) == List(3L, 4L, 5L), s"got $out")
    assert(out.map(_._1) == List(1, 2, 3))
  }

  test("negativeSample: deterministic, excludes self and exclude pairs") {
    val anchors = vecs.filter($"vec_id" === 1)
      .select($"vec_id".as("query_id"), $"label".as("qlabel"))
    val exclude = anchors.join(
        vecs.select($"vec_id".as("id"), $"label"),
        $"qlabel" === $"label")
      .select($"query_id", $"id")
    def run() = Sampling.negativeSample(vecs, anchors, "vec_id", "query_id",
        k = 10, exclude = exclude)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    val a = run(); val b = run()
    assert(a == b, "not deterministic")
    // label-0 rows (1 self, 2 same class) excluded: only 3, 4, 5 remain
    assert(a.map(_._3).toSet == Set(3L, 4L, 5L))
    assert(a.map(_._2) == List(1, 2, 3))
  }

  test("negativeSample sampleDenom pre-thins to the digest residue class") {
    val anchors = vecs.select($"vec_id".as("query_id")).filter($"query_id" === 1)
    val none = vecs.limit(0).select($"vec_id".as("query_id"), $"vec_id".as("id"))
    val out = Sampling.negativeSample(vecs, anchors, "vec_id", "query_id",
      k = 10, exclude = none, sampleDenom = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // every survivor's digest head decodes to an even residue
    out.foreach { case (q, id) =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$q|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val head = java.lang.Long.parseLong(digest.substring(0, 8), 16)
      assert(head % 2 == 0, s"($q,$id) digest head $head not in residue class")
    }
    // and it is a strict thinning of the denom=1 candidate set
    val full = Sampling.negativeSample(vecs, anchors, "vec_id", "query_id",
      k = 10, exclude = none).collect().map(_.getLong(2)).toSet
    assert(out.map(_._2).toSet.subsetOf(full))
  }
}
