package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: does persist() of a foreachBatch micro-batch frame actually serve
  * derived actions from cache (InMemoryTableScan), or does each action
  * re-execute the batch plan? Drives a miniature streamingCurate-shaped body.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("cache_probe").toFile
    import spark.implicits._
    (1 to 1000).map(i => (i.toLong, s"doc text $i")).toDF("doc_id", "text")
      .repartition(1).write.parquet(new java.io.File(dir, "in").getPath)

    val schema = spark.read.parquet(new java.io.File(dir, "in").getPath).schema
    val stream = spark.readStream.schema(schema)
      .parquet(new java.io.File(dir, "in").getPath)
      .withColumn("flag", length(col("text")) % 2 === 0) // stand-in front end

    val perBatch: (DataFrame, Long) => Unit = (batch0, bid) => {
      batch0.persist()
      val derived = batch0.filter(col("flag"))
      println(s"== batch $bid: derived executedPlan ==")
      println(derived.queryExecution.executedPlan.toString.take(1200))
      println(s"batch0.logicalPlan.isStreaming = ${batch0.queryExecution.logical.isStreaming}")
      println(s"derived count = ${derived.count()}")
      val derived2 = batch0.join(derived.select("doc_id"), Seq("doc_id"), "left_anti")
      println("== derived2 executedPlan (after first action) ==")
      println(derived2.queryExecution.executedPlan.toString.take(1200))
      batch0.unpersist()
    }
    val q = stream.writeStream.outputMode("append").foreachBatch(perBatch).start()
    q.processAllAvailable(); q.stop()
    spark.stop()
  }
}
