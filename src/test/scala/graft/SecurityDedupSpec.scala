package graft

import graft.operators.Dedup
import graft.policy.{DataMaskPolicy, RowFilterPolicy}
import org.apache.spark.sql.functions._

/** Security x pipeline composition contract (the r15 verdict #8 pin): when
  * a dedup operator consumes a SECURED frame, it must see exactly what the
  * policy says — masked values under the default filter-sees-masked
  * rewrite, and the raw-filter divergence switch must change which rows
  * enter the operator, not just what they look like.
  */
class SecurityDedupSpec extends SparkFunSuite {
  import spark.implicits._

  private val CAT = "spark_catalog"
  private val DB = "default"

  // two docs identical except for a digit run (masked: byte-identical ->
  // jaccard 1; raw: 3 of 9 distinct shingles differ -> well under 0.9),
  // plus an unrelated control doc
  private def corpus = Seq(
    (1L, "alpha beta 111 gamma delta one two three", "en"),
    (2L, "alpha beta 222 gamma delta one two three", "en"),
    (3L, "totally different words entirely over here", "en"))
    .toDF("doc_id", "text", "lang")

  test("dedup_minhash over a masked text column sees MASKED values under dfMixed") {
    corpus.createOrReplaceTempView("docs_secdd_mask")
    val ctx = new SecurityContext(spark)
    ctx.policyManager.addPolicy(DataMaskPolicy(
      "curator", CAT, DB, "docs_secdd_mask", "text", "MASK"))
    val secured = ctx.dfMixed("curator",
      "SELECT doc_id, text FROM docs_secdd_mask")
    // the operator input IS masked: digits -> n, letters -> x
    assert(secured.filter(col("text").rlike("[a-z&&[^xn]]|[0-9]")).count() == 0)
    val maskedPairs = Dedup.minhashDedup(secured, "doc_id", "text",
        threshold = 0.9, maxBucket = Int.MaxValue)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    // (1, 2) pair exists ONLY because the operator consumed masked text
    assert(maskedPairs.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(maskedPairs.head._3 == 1.0) // masked texts are byte-identical
    // negative control: over the RAW text the same operator finds nothing
    val rawPairs = Dedup.minhashDedup(corpus, "doc_id", "text",
        threshold = 0.9, maxBucket = Int.MaxValue).count()
    assert(rawPairs == 0L,
      "raw corpus must not pair — otherwise the masked pair proves nothing")
  }

  test("divergence switch decides which ROWS reach the dedup operator (filter-sees-masked vs raw)") {
    corpus.createOrReplaceTempView("docs_secdd_div")
    val ctx = new SecurityContext(spark)
    ctx.policyManager.addPolicy(DataMaskPolicy(
      "curator", CAT, DB, "docs_secdd_div", "text", "MASK"))
    ctx.policyManager.addPolicy(RowFilterPolicy(
      "curator", CAT, DB, "docs_secdd_div", "text LIKE '%111%'"))
    val sql = "SELECT doc_id, text FROM docs_secdd_div"
    // default (reference-faithful): the filter evaluates over MASKED text,
    // where '111' reads 'nnn' — nothing survives, the operator gets an
    // empty frame
    val mixedIn = ctx.dfMixed("curator", sql)
    assert(mixedIn.count() == 0L)
    assert(Dedup.minhashDedup(mixedIn, "doc_id", "text",
      threshold = 0.9, maxBucket = Int.MaxValue).count() == 0L)
    // raw-filter switch: the filter sees the raw text, doc 1 enters the
    // operator (still masked in the projection)
    val rawIn = ctx.dfMixedRawFilter("curator", sql)
    assert(rawIn.select(col("doc_id")).as[Long].collect().toSeq == Seq(1L))
    assert(rawIn.filter(col("text").rlike("[0-9]")).count() == 0,
      "projection must still be masked on the raw-filter path")
  }
}
