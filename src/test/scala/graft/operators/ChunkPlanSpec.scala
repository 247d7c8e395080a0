package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Plan-shape assertions for the chunk-fp index probe: the persisted index
  * side is read pre-bucketed (no Exchange above its scan), and the batch
  * side's denominator comes from the projection, not a window.
  */
class ChunkPlanSpec extends SparkFunSuite {
  import spark.implicits._

  test("probe plan: no exchange over the bucketed index scan, no window") {
    Seq("chk_plan", "chk_plan_meta", "chk_plan_compact", "chk_plan_old")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val corpus = Seq((1L, "x" * 800), (2L, "y" * 900)).toDF("doc_id", "text")
      Multimodal.chunkWriteBucketed(
        Multimodal.withFakeMedia(corpus, "doc_id", "text"),
        "chk_plan", "media_id", "payload", numBuckets = 4)
      val batch = Multimodal.withFakeMedia(
        Seq((9L, "x" * 800)).toDF("doc_id", "text"), "doc_id", "text")
      val plan = Multimodal.chunkPairsIncremental(batch, "chk_plan",
          "media_id", "payload", 0.5)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"window in probe plan:\n$plan")
      // the index scan must feed the join through its bucket layout: no
      // Exchange may appear between the chk_plan FileScan and the join
      val idxScanSide = plan.linesIterator.filter(_.contains("chk_plan"))
        .mkString("\n")
      assert(idxScanSide.nonEmpty)
      assert(plan.contains("SelectedBucketsCount") || !plan
        .linesIterator.exists(l => l.contains("Exchange hashpartitioning(chunk_fp")
          && l.contains("chk_plan")),
        s"index side reshuffled:\n$plan")
    } finally Seq("chk_plan", "chk_plan_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
