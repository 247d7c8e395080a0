package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the dedup_jaccard (PPJoin) scale flag the r15
  * sf10 sweep raised (4.9 s sf1 -> 94 s sf10 warm, 19x for 10x): times the
  * operator's three phases separately — token-set materialization +
  * global document frequency, prefix candidate generation, exact verify —
  * and counts the candidate pairs, so a super-linear reading can be
  * attributed to candidate GROWTH (a fixture/threshold property) vs a
  * plan/memory cliff (spill, broadcast flip). Usage:
  *   SPARK_GRAFT_PROBE_DIRS=... runMain graft.tools.JaccardScaleProbe
  */
object JaccardScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS").map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    for (dir <- dirs) {
      val docs = graft.queries.Tables.df(spark, dir, "documents")
        .withColumn("len_band", expr("CAST(n_chars DIV 100 AS INT)"))
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[jprobe] $dir $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      // phase 1: token sets + global df (the two linear aggregates)
      val withSet = docs.select(col("doc_id"), col("lang"), col("len_band"),
          expr("graft_shingle_hashes(text, 1)").as("wset"))
        .localCheckpoint(eager = false)
      val nTok = timed("tokens+df") {
        withSet.select(explode(col("wset")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c")).count()
      }
      // full operator with candidate count (the verify join's input size)
      val pairs = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang", "len_band"), threshold = 0.6)
      val nPairs = timed("full-op")(pairs.count())
      println(s"[jprobe] $dir distinct_tokens=$nTok out_pairs=$nPairs")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
