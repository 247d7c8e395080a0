package graft.functions

import graft.SparkFunSuite
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** [[CompressOps]] / [[DeflateLength]] / [[ByteEntropy]]: entropy-class
  * orderings (the properties the quality filter relies on), exact entropy
  * on hand-computable distributions, and the report/filter operators.
  */
class CompressSpec extends SparkFunSuite {
  import spark.implicits._

  test("byteEntropy: hand-computed values") {
    assert(CompressOps.byteEntropy(Array.emptyByteArray) === 0.0)
    assert(CompressOps.byteEntropy("aaaa".getBytes) === 0.0)
    assert(math.abs(CompressOps.byteEntropy("abab".getBytes) - 1.0) < 1e-12)
    // 4 equiprobable symbols -> 2 bits
    assert(math.abs(CompressOps.byteEntropy("abcd".getBytes) - 2.0) < 1e-12)
  }

  test("deflateLength orders entropy classes: repetitive < prose < random-ish") {
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders across a field of questions nobody thought to ask before") * 4
    val rep = "ab" * (prose.length / 2)
    val rnd = Iterator.iterate("seed")(s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString)
      .drop(1).take(prose.length / 32 + 1).mkString.take(prose.length)
    val (lr, lp, ln) = (CompressOps.deflateLength(rep.getBytes, 6),
      CompressOps.deflateLength(prose.getBytes, 6),
      CompressOps.deflateLength(rnd.getBytes, 6))
    assert(lr < lp && lp < ln, s"ordering violated: rep=$lr prose=$lp rnd=$ln")
  }

  test("compressionReport columns and compressionFilter band") {
    val docsDf = Seq(
      (1L, "xy" * 400), // repetitive: ratio near 0
      (2L, ("a sentence with ordinary words that vary and flow naturally " +
        "like any document would when someone writes it out by hand") * 3))
      .toDF("doc_id", "text")
    val rep = TextAnalysis.compressionReport(docsDf, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Double, Double)].collect()
    assert(rep.forall(r => r._3 > 0 && r._3 <= r._2 + 16))
    assert(rep(0)._4 < rep(1)._4) // repetitive compresses harder
    assert(rep(0)._5 < rep(1)._5) // and has lower byte entropy
    // band keeps the prose doc, drops the repetitive tail
    val kept = TextAnalysis.compressionFilter(docsDf, "text",
      minRatio = rep(0)._4 + 1e-6, maxRatio = 1.0)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
  }

  test("null and type guards") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("id", "t")
    val got = df.select(col("id"),
        TextAnalysis.deflateLen(col("t")).as("d"),
        TextAnalysis.byteEntropy(col("t")).as("e"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).getInt(1) >= 0 && got(1).getDouble(2) === 0.0)
  }
}
