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

  test("sec_dedup_minhash fixture's band buckets stay under the DEFAULT cap (planted pairs survive capBuckets)") {
    // The bench/oracle query sec_dedup_minhash runs minhashDedup with the
    // DEFAULT maxBucket (capBuckets drops an ENTIRE oversized bucket, so a
    // planted clone pair would vanish from a band only if that band's
    // bucket overflows — and from the OUTPUT only if all 16 of its band
    // buckets overflow). This pins the fixture property that makes the
    // default cap a NO-OP there: at the oracle SF, every (band, band_hash)
    // bucket of the doubled en-only corpus stays at or under the cap, with
    // real headroom. If the fixture or corpus generation changes, this
    // fails BEFORE the oracle mismatches.
    // r17 advice: the no-headroom guarantee must hold at the BENCH SFs
    // too, not just the oracle dir — an over-cap bucket at sf0.1+ would
    // silently drop planted pairs and change output volume versus prior
    // rounds' uncapped runs. The structural argument that it holds:
    // ScaleUp replication grows the number of dup GROUPS, not their size,
    // and random 32-bit band-hash collisions stay negligible at these
    // corpus sizes — so max bucket is ~flat per decade. This measures it:
    // shipped dirs assert the 2x-headroom bound; transient ScaleUp decades
    // (/tmp) assert the cap itself when present, and every measured value
    // is printed so the round log carries the receipt.
    val dirs = Seq(
      ("/root/testdata/sf0.01", 50L), ("/root/testdata/sf0.1", 50L),
      ("/tmp/sf1", 100L), ("/tmp/sf10", 100L))
    val present = dirs.filter { case (d, _) => new java.io.File(d).isDirectory }
    assume(present.nonEmpty)
    present.foreach { case (dir, bound) =>
      val d = graft.queries.Tables.df(spark, dir, "documents")
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("text"))
      val fixture = d.unionAll(
        d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      val sets = fixture.select(col("doc_id"),
        expr("graft_shingle_hashes(text, 3)").as("sh"))
      val maxBucket = Dedup.bandRowsOf(sets, "doc_id", bands = 16, rowsPerBand = 4)
        .groupBy(col("band"), col("band_hash")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      info(s"$dir max band bucket = $maxBucket (bound $bound, cap 100)")
      assert(maxBucket <= bound,
        s"$dir: fixture max band bucket $maxBucket exceeds $bound — " +
          "sec_dedup_minhash's planted pairs may be cap-dropped; " +
          "re-evaluate the cap there before trusting the oracle/bench")
    }
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
