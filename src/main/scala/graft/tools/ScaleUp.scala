package graft.tools

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds an N-fold scaled copy of a testdata dir (default sf0.1 -> /tmp/sf1)
  * to measure how the engine scales beyond the driver-provided corpus.
  *
  * Volume tables are replicated with per-copy KEY OFFSETS so join fan-in,
  * group cardinality and per-user event density stay constant — the honest
  * scaling shape (10x rows, 10x groups), not 10x duplicates of every key.
  * documents/embeddings are copied unscaled: their dedup queries' outputs are
  * tied to the corpus's duplicate structure, which replication would square.
  * Dimension tables (nation/region/part/supplier) stay as-is.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val n = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val K = 100000000L // key offset stride per copy

    def scaled(name: String, keyCols: Seq[String]): DataFrame = {
      val base = Tables.df(spark, src, name)
      (0 until n).map { c =>
        keyCols.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(c * K)))
      }.reduce(_ unionAll _)
    }

    def write(df: DataFrame, name: String): Unit = {
      df.coalesce(8).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    write(scaled("lineitem", Seq("l_orderkey")), "lineitem")
    write(scaled("orders", Seq("o_orderkey", "o_custkey")), "orders")
    write(scaled("customer", Seq("c_custkey")), "customer")
    write(scaled("events", Seq("event_id", "user_id")), "events")
    Seq("nation", "region", "part", "supplier", "documents", "embeddings")
      .foreach(t => write(Tables.df(spark, src, t), t))
    spark.stop()
  }
}
