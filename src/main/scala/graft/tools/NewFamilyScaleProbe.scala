package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf0.1 -> sf1 solo probes for the round-11 additions (PLANS.md evidence).
  * ER regenerates c_name from the FULL offset custkey (unique per row) —
  * ScaleUp's key offsets leave names unchanged, which would plant 10-deep
  * cross-copy name clones and measure the tool, not the operator.
  */
object NewFamilyScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name $rows rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1")) {
      println(s"[probe] === $dir ===")
      val docs = graft.queries.Tables.df(spark, dir, "documents")
      val events = graft.queries.Tables.df(spark, dir, "events")
      val cust = graft.queries.Tables.df(spark, dir, "customer")
        .select(col("c_custkey"),
          format_string("Customer#%011d", col("c_custkey")).as("c_name"),
          col("c_nationkey"))

      time("graph_pagerank") {
        val d = docs.select(col("doc_id"))
        val n = d.agg(count(lit(1)).as("n_docs"))
        val edges = d.crossJoin(broadcast(n))
          .select(col("doc_id").as("src"),
            explode(sequence(lit(1L), lit(1L) + col("doc_id") % lit(3L))).as("k"),
            col("n_docs"))
          .select(col("src"),
            ((col("src") * 31 + col("k") * 17) % col("n_docs")).as("dst"))
        graft.operators.Graph.pagerank(edges, "src", "dst", iters = 3).count()
      }
      time("er_customers") {
        val dirty = cust.filter(col("c_custkey") % 10 === 3)
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            concat(substring(col("c_name"), 1, 9), lit("O"),
              substring(col("c_name"), 11, 100)).as("c_name"),
            col("c_nationkey"))
        val all = cust.unionAll(dirty)
        graft.operators.RecordLinkage.resolve(all, "c_custkey", "c_name",
          concat_ws("|", col("c_nationkey"), substring(col("c_name"), -2, 2)),
          maxDist = 1, maxBlock = 1000).count()
      }
      time("er_customers_blk3") {
        // the scale knob: one more blocking digit -> 10x more blocks,
        // per-block depth back to the sf0.1 level
        val dirty = cust.filter(col("c_custkey") % 10 === 3)
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            concat(substring(col("c_name"), 1, 9), lit("O"),
              substring(col("c_name"), 11, 100)).as("c_name"),
            col("c_nationkey"))
        val all = cust.unionAll(dirty)
        graft.operators.RecordLinkage.resolve(all, "c_custkey", "c_name",
          concat_ws("|", col("c_nationkey"), substring(col("c_name"), -3, 3)),
          maxDist = 1, maxBlock = 1000).count()
      }
      time("events_gapfill") {
        graft.operators.Timeseries.gapFill(
          events.filter(col("event_type") === "purchase"),
          "user_id", "ts", "value", 86400L).count()
      }
      time("events_anomaly") {
        graft.operators.Timeseries.anomalies(events, "event_type", "ts",
          "value", 86400L, 7, 2.0).count()
      }
      time("text_unigram_train") {
        graft.operators.Unigram.train(docs, "text", vocabSize = 512,
          maxPieceLen = 8, seedSize = 4096, emIters = 2).count()
      }
    }
    spark.stop()
  }
}
