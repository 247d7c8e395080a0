package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The chunk-fingerprint persisted index family ([[Multimodal.chunkWriteBucketed]]
  * / [[Multimodal.chunkPairsIncremental]] / [[Multimodal.chunkAppendToIndex]]):
  * clone/fresh/tail probe semantics, the append-back loop, zero-chunk
  * payloads, and compaction via the shared [[Dedup.compactIndex]].
  */
class ChunkIndexSpec extends SparkFunSuite {
  import spark.implicits._

  /** High-entropy deterministic ASCII text; different seeds land on disjoint
    * windows of the underlying sequence (same generator discipline as
    * ChunkSpec — near-shifted seeds would make payloads share chunks).
    */
  private def text(n: Int, seed: Int): String =
    new String(Array.tabulate(n) { i =>
      var z = i + seed * 1000003L + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ('0' + ((z ^ (z >>> 31)) & 63)).toChar
    })

  private def corpus = Seq(
    (1L, text(1200, 1)), (2L, text(900, 2)), (3L, text(1500, 3)))
    .toDF("doc_id", "text")

  private def media(df: org.apache.spark.sql.DataFrame) =
    Multimodal.withFakeMedia(df, "doc_id", "text")

  private def dropDebris(table: String): Unit =
    Seq(table, s"${table}_meta", s"${table}_compact", s"${table}_old")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("clone probes at containment 1.0, fresh and empty payloads emit no pairs") {
    dropDebris("chk_ix")
    try {
      Multimodal.chunkWriteBucketed(media(corpus), "chk_ix", "media_id",
        "payload", numBuckets = 4)
      val batch = Seq((101L, text(1200, 1)), (102L, text(1000, 9)), (103L, ""))
        .toDF("doc_id", "text")
      val pairs = Multimodal.chunkPairsIncremental(media(batch), "chk_ix",
        "media_id", "payload", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.toSeq === Seq((101L, 1L, 1.0)))
      val survivors = media(batch)
        .join(Multimodal.chunkPairsIncremental(media(batch), "chk_ix",
            "media_id", "payload", 0.5)
            .select(col("batch_id").as("media_id")),
          Seq("media_id"), "left_anti")
        .select("media_id").as[Long].collect().sorted
      assert(survivors.toSeq === Seq(102L, 103L))
    } finally dropDebris("chk_ix")
  }

  test("tail-extended payload is detected against its source: prefix chunks survive the edit") {
    dropDebris("chk_tail")
    try {
      Multimodal.chunkWriteBucketed(media(corpus), "chk_tail", "media_id",
        "payload", numBuckets = 4)
      val batch = Seq((201L, text(1200, 1) + " tail-of-24-ascii-bytes."))
        .toDF("doc_id", "text")
      val pairs = Multimodal.chunkPairsIncremental(media(batch), "chk_tail",
        "media_id", "payload", threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.length === 1 && pairs.head._1 === 201L && pairs.head._2 === 1L)
      // 1200 bytes => >= 19 chunks (max 64); the tail can cost the final
      // chunk and add <= 6, so containment >= 18/24 — well above 0.5
      assert(pairs.head._3 >= 0.5, s"containment ${pairs.head._3}")
    } finally dropDebris("chk_tail")
  }

  test("append-back loop: a survivor joins the index and catches its own later clone") {
    dropDebris("chk_app")
    try {
      Multimodal.chunkWriteBucketed(media(corpus), "chk_app", "media_id",
        "payload", numBuckets = 4)
      val fresh = Seq((301L, text(1100, 7))).toDF("doc_id", "text")
      assert(Multimodal.chunkPairsIncremental(media(fresh), "chk_app",
        "media_id", "payload", 0.5).isEmpty)
      Multimodal.chunkAppendToIndex(media(fresh), "chk_app", "media_id", "payload")
      val clone = Seq((401L, text(1100, 7))).toDF("doc_id", "text")
      val pairs = Multimodal.chunkPairsIncremental(media(clone), "chk_app",
        "media_id", "payload", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.toSeq === Seq((401L, 301L, 1.0)))
    } finally dropDebris("chk_app")
  }

  test("compactIndex collapses a replayed append and preserves probe results") {
    dropDebris("chk_cmp")
    try {
      Multimodal.chunkWriteBucketed(media(corpus), "chk_cmp", "media_id",
        "payload", numBuckets = 4)
      Multimodal.chunkAppendToIndex(media(corpus), "chk_cmp", "media_id",
        "payload")
      assert(math.abs(Dedup.indexAccretion(spark, "chk_cmp") - 2.0) < 0.1)
      val batch = Seq((501L, text(1200, 1))).toDF("doc_id", "text")
      val pre = Multimodal.chunkPairsIncremental(media(batch), "chk_cmp",
        "media_id", "payload", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val rows = spark.table("chk_cmp").count()
      Dedup.compactIndex(spark, "chk_cmp")
      assert(spark.table("chk_cmp").count() * 2 === rows)
      assert(math.abs(Dedup.indexAccretion(spark, "chk_cmp") - 1.0) < 0.05)
      val post = Multimodal.chunkPairsIncremental(media(batch), "chk_cmp",
        "media_id", "payload", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(pre === post && post === Seq((501L, 1L, 1.0)))
      // bucket layout intact after the swap
      val spec = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser
          .parseTableIdentifier("chk_cmp")).bucketSpec
      assert(spec.exists(_.bucketColumnNames == Seq("chunk_fp")))
    } finally dropDebris("chk_cmp")
  }

  test("maxPostings drops ubiquitous chunks from the probe") {
    dropDebris("chk_cap")
    try {
      // every corpus doc shares the SAME payload: its chunk fps all have
      // posting lists of size 3, a fresh doc's have size 1
      val same = Seq((1L, text(1200, 1)), (2L, text(1200, 1)),
        (3L, text(1200, 1)), (4L, text(1300, 4))).toDF("doc_id", "text")
      Multimodal.chunkWriteBucketed(media(same), "chk_cap", "media_id",
        "payload", numBuckets = 4)
      val batch = Seq((601L, text(1200, 1)), (602L, text(1300, 4)))
        .toDF("doc_id", "text")
      val capped = Multimodal.chunkPairsIncremental(media(batch), "chk_cap",
        "media_id", "payload", 0.5, maxPostings = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // the 3-copy payload's postings are capped away; the unique one probes
      assert(capped === Seq((602L, 4L)))
    } finally dropDebris("chk_cap")
  }
}
