package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamOps

/** Cost breakdown of the streaming trio (stream_curate / sec_stream_curate
  * / stream_reconcile) — VERDICT r11 #3: the trio reads 41-47 s in-suite;
  * this probe splits each query into fixture prep / index init / query
  * start (incl. Bloom build) / per-micro-batch work (from
  * StreamingQueryProgress.durationMs) / final read, so the floor can be
  * attributed to Spark machinery vs per-batch processing vs test fixture.
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StreamTrioProbe
  */
object StreamTrioProbe {
  private def t[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[trio] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  private def dumpProgress(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      println(s"[trio]   batch=${p.batchId} rows=${p.numInputRows} " +
        s"triggerMs=${d.get("triggerExecution")} addBatchMs=${d.get("addBatch")} " +
        s"getBatchMs=${d.get("getBatch")} planMs=${d.get("queryPlanning")} " +
        s"commitMs=${d.get("commitOffsets")}")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    // ---- stream_curate, phase by phase (same construction as the query) --
    println(s"[trio] === stream_curate @ $sfDir ===")
    val d = graft.queries.Tables.df(s, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val bench = d.filter(col("doc_id") % 17 === 0)
    val corpus = d.filter(col("doc_id") % 17 =!= 0)
    val base = corpus.unionAll(corpus.select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" graftfuzz")).as("text")))
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_probe_sc").toFile
    val streamDir = new java.io.File(tmpRoot, "in"); streamDir.mkdirs()
    t("fixture: slice 2 batches to parquet (coalesce(1) x2)") {
      val slices = Seq(
        base.filter(col("doc_id") < 1000000),
        base.filter(col("doc_id") >= 1000000))
      val now = System.currentTimeMillis()
      slices.zipWithIndex.foreach { case (sl, i) =>
        val part = new java.io.File(tmpRoot, s"part$i")
        sl.coalesce(1).write.mode("overwrite").parquet(part.getPath)
        val f = part.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(streamDir, s"b$i.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath)
        dst.setLastModified(now - (slices.size - i) * 60000L)
      }
    }
    val tables = Seq("scp_ex_idx", "scp_lsh_idx", "scp_lsh_idx_sets",
      "scp_lsh_idx_meta", "scp_sink")
    tables.foreach(graft.sources.Sources.dropForOverwrite(s, _))
    graft.SparkUtil.withShufflePartitions(s, 8) {
      t("index init: two empty bucketed writes") {
        Dedup.exactWriteBucketed(base.limit(0).withColumn("k", col("text")),
          "scp_ex_idx", "doc_id", "k", numBuckets = 4)
        Dedup.minhashWriteBucketed(base.limit(0), "scp_lsh_idx", "doc_id",
          "text", numBuckets = 4)
      }
      val stream = s.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir.getPath)
      val q = t("query start: streamingCurate (incl. Bloom build on bench)") {
        StreamOps.streamingCurate(stream, "scp_ex_idx", "scp_lsh_idx",
          "doc_id", "text", "scp_sink", bench = Some(bench),
          minWords = 30, minStopHits = 1, maxBucket = Int.MaxValue,
          threshold = 0.9, batchShufflePartitions = Some(8))
      }
      try t("drain: processAllAvailable (2 corpus-sized batches)") {
        q.processAllAvailable()
      } finally { dumpProgress(q); q.stop() }
    }
    t("final read: sink count") {
      println(s"[trio]   sink rows=${s.table("scp_sink").count()}")
    }
    tables.foreach(graft.sources.Sources.dropForOverwrite(s, _))

    // ---- stream_reconcile: machinery floor on a 3-doc corpus ------------
    println("[trio] === stream_reconcile (3 docs — pure machinery) ===")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val baseTxt = "the quick brown foxes jumped over seven lazy sleeping dogs near quiet green rivers"
    val docs3 = Seq((1L, baseTxt), (2L, baseTxt + " alpha"), (3L, baseTxt + " alpha betaa"))
    Seq("vqp_ex_idx", "vqp_lsh_idx", "vqp_lsh_idx_sets", "vqp_lsh_idx_meta",
      "vqp_sink", "vqp_quar", "vqp_sink_reconciled", "vqp_sink_old")
      .foreach(graft.sources.Sources.dropForOverwrite(s, _))
    val all = docs3.toDF("doc_id", "text")
    t("reconcile: index init") {
      Dedup.exactWriteBucketed(all.limit(0).withColumn("k", col("text")),
        "vqp_ex_idx", "doc_id", "k", numBuckets = 4)
      Dedup.minhashWriteBucketed(all.limit(0), "vqp_lsh_idx", "doc_id",
        "text", numBuckets = 4)
    }
    val mem = MemoryStream[(Long, String)]
    val stream3 = mem.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val q3 = t("reconcile: query start") {
      StreamOps.streamingCurate(stream3, "vqp_ex_idx", "vqp_lsh_idx",
        "doc_id", "text", "vqp_sink", bench = None,
        minWords = 5, minStopHits = 1, maxBucket = Int.MaxValue,
        threshold = 0.9, quarantineTable = Some("vqp_quar"),
        batchShufflePartitions = Some(4))
    }
    try t("reconcile: 3 one-doc batches") {
      docs3.foreach { dd => mem.addData(dd); q3.processAllAvailable() }
    } finally { dumpProgress(q3); q3.stop() }
    t("reconcile: reconcileCurate pass") {
      graft.SparkUtil.withShufflePartitions(s, 4) {
        StreamOps.reconcileCurate(s, "vqp_sink", "vqp_lsh_idx", "vqp_quar",
          "doc_id", "text", maxBucket = Int.MaxValue, threshold = 0.9)
      }
    }
    spark.stop()
  }
}
