package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for stream_tws_sessionize's decade-3 reading (r15
  * verdict #5): counts the WORK first (events, keys, sessions — the
  * JaccardScaleProbe pattern), then drains the exact pipeline once per dir
  * and prints per-batch StreamingQueryProgress — trigger duration split,
  * state-operator update/commit/removal times, and the RocksDB custom
  * metrics (compaction, flush, memtable) — so the 3x can be attributed to
  * a named linear driver (timer volume, state partitions, or RocksDB
  * machinery) instead of waved at.
  *
  * Usage: SPARK_GRAFT_PROBE_DIRS=/root/testdata/sf0.1,/tmp/sf1,/tmp/sf10
  *        runMain graft.tools.TwsSessProbe
  */
object TwsSessProbe {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS").map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gap = 1800L
    for (dir <- dirs) {
      // ---- the work, counted batch-side --------------------------------
      val ev = graft.queries.Tables.df(spark, dir, "events")
      val nEvents = ev.count()
      val nKeys = ev.select(col("user_id")).distinct().count()
      val nSessions = ev
        .select(col("user_id"), unix_timestamp(col("ts").cast("timestamp")).as("te"))
        .withColumn("prev", lag(col("te"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("te"))))
        .filter(col("prev").isNull || col("te") - col("prev") > gap)
        .count()
      val parts = graft.streaming.StreamOps.sessionStatePartitions(spark, dir)
      println(s"[twsprobe] $dir events=$nEvents keys=$nKeys sessions=$nSessions stateParts=$parts")
      // ---- the pipeline, with progress capture -------------------------
      graft.SparkUtil.withConfs(spark,
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "true") {
        graft.SparkUtil.withShufflePartitions(spark, parts) {
          // split FIXTURE STAGING (eventsStreamFenced writes the staged
          // parquet input — harness cost, not engine cost) from the drain.
          // SPARK_GRAFT_PROBE_LATE=1 probes the bounded-disorder +
          // watermark-paced pipeline (stream_tws_sessionize_late) instead.
          val late = sys.env.get("SPARK_GRAFT_PROBE_LATE").contains("1")
          def runOnce(label: String, trim: Boolean = true): Unit = {
            val tS = System.nanoTime()
            val pipeline =
              if (late) {
                val (ev, delaySec) = graft.streaming.StreamOps
                  .eventsStreamBoundedDisorder(spark, dir, gap)
                graft.streaming.StreamOps.transformWithStateSessionsOn(
                  spark, ev, gap, watermarkDelay = s"$delaySec seconds",
                  trimQuietFlush = trim)
              } else graft.streaming.StreamOps
                .transformWithStateSessions(spark, dir, gap, fenceAheadSec = 3 * gap)
            println(f"[twsprobe] $dir$label staging ${(System.nanoTime() - tS) / 1e9}%.2f s")
            val t0 = System.nanoTime()
            val q = pipeline
              .writeStream
              .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
              .format("noop")
              .start()
            try q.processAllAvailable() finally q.stop()
            println(f"[twsprobe] $dir$label total ${(System.nanoTime() - t0) / 1e9}%.2f s")
            var (updSum, rmSum, bytesSum) = (0L, 0L, 0L)
            q.recentProgress.foreach { p =>
              val dur = p.durationMs
              def d(k: String) = Option(dur.get(k)).map(_.toString).getOrElse("-")
              val st = p.stateOperators.headOption
              def s(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
                st.map(f(_).toString).getOrElse("-")
              st.foreach { so =>
                updSum += so.numRowsUpdated; rmSum += so.numRowsRemoved
                bytesSum += Option(so.customMetrics.get("rocksdbTotalBytesWritten"))
                  .map(_.longValue).getOrElse(0L)
              }
              val rocks = st.map(_.customMetrics).map { m =>
                Seq("rocksdbCommitCompactLatency", "rocksdbCommitFlushLatency",
                  "rocksdbCommitWriteBatchLatency", "rocksdbTotalCompactionLatencyMs",
                  "rocksdbTotalBytesWritten", "rocksdbTotalBytesRead")
                  .flatMap(k => Option(m.get(k)).map(v => s"$k=$v")).mkString(" ")
              }.getOrElse("")
              println(s"[twsprobe] $dir$label batch=${p.batchId} rows=${p.numInputRows} " +
                s"trigger=${d("triggerExecution")} addBatch=${d("addBatch")} " +
                s"updated=${s(_.numRowsUpdated)} updMs=${s(_.allUpdatesTimeMs)} " +
                s"removed=${s(_.numRowsRemoved)} rmMs=${s(_.allRemovalsTimeMs)} " +
                s"commitMs=${s(_.commitTimeMs)} stateRows=${s(_.numRowsTotal)} $rocks")
            }
            println(s"[twsprobe] $dir$label SUM updated=$updSum removed=$rmSum " +
              s"rocksdbBytesWritten=$bytesSum")
          }
          if (late) {
            // A/B the quiet-firing flush trim in one run: the toggle is a
            // CONSTRUCTOR argument of WatermarkSessionizeProcessor (r17
            // advice: no mutable probe globals in production state-machine
            // code), so each leg builds its own pipeline with the flag
            // pinned at plan time — the r16 verdict #6 receipt
            Seq("[trim]" -> true, "[notrim]" -> false).foreach { case (l, v) =>
              runOnce(l, trim = v)
            }
          } else runOnce("")
        }
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
