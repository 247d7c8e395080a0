package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: diff stream_tws_sessionize_late vs the ordered sessionize
  * on sf0.001 — which sessions diverge and why (not part of the API).
  */
object LateSessProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val late = graft.SparkEntry.queries("stream_tws_sessionize_late")(spark, dir)
      .select(col("user_id"), col("n_events"), col("session_start"), col("session_end"))
    val ord = graft.SparkEntry.queries("stream_tws_sessionize")(spark, dir)
      .select(col("user_id"), col("n_events"), col("session_start"), col("session_end"))
    val lateOnly = late.exceptAll(ord).orderBy(col("user_id"), col("session_start"))
    val ordOnly = ord.exceptAll(late).orderBy(col("user_id"), col("session_start"))
    println(s"== late-only rows: ${lateOnly.count()} ==")
    lateOnly.show(40, false)
    println(s"== ordered-only rows: ${ordOnly.count()} ==")
    ordOnly.show(40, false)
    spark.stop()
  }
}
