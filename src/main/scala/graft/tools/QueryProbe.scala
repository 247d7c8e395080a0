package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo warm-rep probe for named SparkEntry queries across scale-factor
  * dirs — the adjudication harness for BenchDiff watch items (in-suite
  * readings carry position/JIT/page-cache noise; a watch item is confirmed
  * or retired on SOLO warm reps, last rep = the reading).
  *
  * Usage: runMain graft.tools.QueryProbe q1,q2[,...]
  * Env:   SPARK_GRAFT_PROBE_DIRS  comma-separated data dirs
  *        (default /root/testdata/sf0.01,/root/testdata/sf0.1,/tmp/sf1)
  *        SPARK_GRAFT_PROBE_REPS  reps per query (default 2)
  *
  * Same measurement discipline as graft.Bench: noop sink forces full
  * evaluation; blocking unpersist + cache clear between runs so one rep's
  * localCheckpoint blocks can't distort the next.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <query,query,...>")
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS").map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/sf1"))
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs; name <- names) {
      // the r14 sf10 lesson, codified: big dirs route streaming drains
      // through the parquet table sink (see StreamOps.configureDrainFor)
      graft.streaming.StreamOps.configureDrainFor(spark, dir)
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val outcome =
          try {
            graft.SparkEntry.queries(name)(spark, dir)
              .write.format("noop").mode("overwrite").save()
            "ok"
          } catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[qprobe] $dir $name#$rep $sec%.2f s $outcome")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.sharedState.cacheManager.clearCache()
        // the noop write consumed any table-routed drain; drop its sink table
        graft.streaming.StreamOps.dropDrainResidue(spark)
        System.gc()
      }
    }
    spark.stop()
  }
}
