package graft.tools

import graft.operators.LanguageModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for text_perplexity: model build vs scoring. */
object PerplexityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.df(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (_ <- 1 to 2) {
      val model = time("model build (count)") {
        val m = LanguageModel.charTrigramModel(docs, "text")
        m.count(); m
      }
      time("model rows") { println("  distinct grams: " + model.count()) }
      time("full selfScore") {
        LanguageModel.selfScore(docs, "doc_id", "text").count()
      }
      time("score-only (reuse model)") {
        LanguageModel.perplexityScore(docs, "doc_id", "text", model).count()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
