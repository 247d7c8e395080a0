package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming parity (SURVEY §7: the reference executes everything
  * on a streaming engine; our rules and operators are plan-level and
  * mode-agnostic). `readStream` -> windowed agg -> memory sink with a
  * synchronous drain gives deterministic results a DuckDB oracle can check —
  * the streaming analog of the reference's fetchRows
  * (SecurityContext.java:235-242).
  */
object StreamOps {

  /** Streaming read of the events table (nanos timestamps normalized to
    * micros, same as the batch loader).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource requires a DIRECTORY basePath: driver testdata ships
    // events.parquet as a single file (glob-filter its parent), while scaled
    // copies from graft.tools.ScaleUp write it as a directory of part files
    // (stream it directly)
    val path = new java.io.File(s"$dir/events.parquet")
    val raw =
      if (path.isDirectory) spark.readStream.schema(schema).parquet(path.getPath)
      else spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (schema.fields.exists(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType))
      raw.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    else raw
  }

  /** 1-hour tumbling-window counts/sums per event type (native streaming
    * window; same buckets as the batch q_events_bucket query).
    */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("bucket"), col("event_type"), col("cnt"), col("total"))

  /** Streaming dedup: drop duplicate keys across micro-batches with
    * watermark-bounded state. Unlike [[graft.operators.Dedup.exact]] (which
    * deterministically keeps min(id) per key), the surviving row per key is
    * the first one processed — streaming cannot see later duplicates when it
    * emits, so only key-level (not row-level) determinism holds.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)

  /** Streaming ingest with incremental near-dup dedup: each micro-batch
    * probes a persisted [[graft.operators.Dedup.minhashWriteBucketed]]
    * index, drops rows whose exact shingle Jaccard with an indexed doc
    * reaches `threshold`, appends the survivors to `sinkTable`, and (when
    * `extendIndex`) appends their band rows and shingle sets to the index —
    * so batch N+1 dedups against the original corpus AND every earlier
    * batch's survivors.
    *
    * foreachBatch rather than a stream-static join: the probe is a
    * multi-join batch plan (banding -> candidates -> distinct -> exact
    * verify -> anti join) plus bucketed-table appends, which the streaming
    * planner cannot express natively; per micro-batch it runs exactly the
    * batch operator, so the scale shape is unchanged — batch-sized shuffles
    * only, the corpus index scanned but never reshuffled. Two documented
    * limits: duplicates WITHIN one micro-batch both survive (neither is in
    * the index yet — pre-clean with [[graft.operators.Dedup.exact]] per
    * batch if that matters), and a replayed epoch re-appends its survivors
    * (the parquet sink is not idempotent; exactly-once needs a sink keyed
    * on (epoch, id)).
    */
  def streamingIncrementalDedup(docsStream: DataFrame, indexTable: String,
      idCol: String, textCol: String, sinkTable: String,
      maxBucket: Int = 100, threshold: Double = 0.7,
      extendIndex: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    // explicit function type: foreachBatch's Scala/Java overloads are
    // ambiguous for a SAM-converted lambda on Scala 2.13
    val perBatch: (DataFrame, Long) => Unit = (batch, _) => {
      val dupIds = Dedup.minhashDedupIncremental(batch, indexTable, idCol,
        textCol, maxBucket, threshold)
        .select(col("batch_id").as(idCol)).distinct()
      val survivors = batch.join(dupIds, Seq(idCol), "left_anti")
        .localCheckpoint(eager = false) // sink append + two index appends
      survivors.write.mode(org.apache.spark.sql.SaveMode.Append)
        .format("parquet").saveAsTable(sinkTable)
      if (extendIndex) Dedup.minhashAppendToIndex(survivors, indexTable, idCol, textCol)
    }
    docsStream.writeStream.outputMode("append").foreachBatch(perBatch).start()
  }

  /** Streaming EXACT-dedup ingest over a [[graft.operators.Dedup.exactWriteBucketed]]
    * index: each micro-batch collapses its own duplicates to the minimum id,
    * drops rows whose content the index already holds, appends survivors to
    * the sink and (by default) their hashes back into the index — so batch
    * N+1 dedups against the original corpus and every earlier batch's
    * survivors. Unlike [[streamingIncrementalDedup]] the within-micro-batch
    * duplicate case is handled (the min_by collapse runs before the index
    * probe). Same replay caveat: the parquet sink is not idempotent.
    */
  def streamingExactDedup(docsStream: DataFrame, indexTable: String,
      idCol: String, keyCol: String, sinkTable: String,
      extendIndex: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    val perBatch: (DataFrame, Long) => Unit = (batch, _) => {
      val survivors = Dedup.exactDedupIncremental(batch, indexTable, idCol, keyCol)
        .localCheckpoint(eager = false) // sink append + index append
      survivors.write.mode(org.apache.spark.sql.SaveMode.Append)
        .format("parquet").saveAsTable(sinkTable)
      if (extendIndex) Dedup.exactAppendToIndex(survivors, indexTable, idCol, keyCol)
    }
    docsStream.writeStream.outputMode("append").foreachBatch(perBatch).start()
  }

  /** Streaming SUBSTRING-dedup ingest over a persisted
    * [[graft.operators.Dedup.substringWriteBucketed]] window-hash index:
    * each micro-batch drops docs sharing at least `minShared` distinct
    * `windowTokens`-token windows with an indexed doc (the Lee et al. 2021
    * signal, window size pinned in the index's meta table), appends
    * survivors to `sinkTable` and (by default) their window hashes back
    * into the index. Same caveats as [[streamingIncrementalDedup]]:
    * within-micro-batch duplicates all survive, and replays re-append.
    * One window-specific caveat (mirror of [[streamingSemanticDedup]]'s
    * zero-norm note): docs shorter than the window — including blank or
    * whitespace-only docs — produce no window hashes, so they always pass
    * to the sink un-deduplicated and are never indexed.
    */
  def streamingSubstringDedup(docsStream: DataFrame, indexTable: String,
      idCol: String, textCol: String, sinkTable: String,
      maxBucket: Int = 100, minShared: Long = 1,
      extendIndex: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    val perBatch: (DataFrame, Long) => Unit = (batch, _) => {
      val dupIds = Dedup.substringDedupIncremental(batch, indexTable, idCol,
        textCol, maxBucket)
        .filter(col("n_shared") >= minShared)
        .select(col("batch_id").as(idCol)).distinct()
      val survivors = batch.join(dupIds, Seq(idCol), "left_anti")
        .localCheckpoint(eager = false) // sink append + index append
      survivors.write.mode(org.apache.spark.sql.SaveMode.Append)
        .format("parquet").saveAsTable(sinkTable)
      if (extendIndex) Dedup.substringAppendToIndex(survivors, indexTable, idCol, textCol)
    }
    docsStream.writeStream.outputMode("append").foreachBatch(perBatch).start()
  }

  /** Streaming SEMANTIC-dedup ingest over a persisted
    * [[graft.operators.Similarity.ivfWriteBucketed]] IVF index — the vector
    * member of the self-deduplicating-ingest family (exact: md5 index;
    * near-dup text: minhash LSH index; near-dup vectors: this). Each
    * micro-batch probes the index with
    * [[graft.operators.Dedup.semanticDedupIncremental]] (cells assigned by
    * the PERSISTED quantizer, batch-sized shuffles only), drops rows whose
    * exact cosine with an indexed vector reaches `threshold`, appends
    * survivors to `sinkTable` and (when `extendIndex`) quantizes them into
    * the index's bucket layout via
    * [[graft.operators.Similarity.ivfAppendToIndex]] — so batch N+1 dedups
    * against the original corpus AND every earlier batch's survivors,
    * while the quantizer never drifts.
    *
    * Same documented limits as [[streamingIncrementalDedup]]: near-dups
    * WITHIN one micro-batch all survive (none is indexed yet), and a
    * replayed epoch re-appends its survivors. One vector-specific caveat:
    * zero-norm vectors can never match (no direction), so they reach the
    * sink but are not appended to the index (the append path drops them).
    */
  def streamingSemanticDedup(vecsStream: DataFrame, indexTable: String,
      idCol: String, vecCol: String, sinkTable: String,
      threshold: Double = 0.9, maxCell: Int = 100,
      extendIndex: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{Dedup, Similarity}
    val perBatch: (DataFrame, Long) => Unit = (batch, _) => {
      val dupIds = Dedup.semanticDedupIncremental(batch, indexTable, idCol,
        vecCol, threshold, maxCell)
        .select(col("batch_id").as(idCol)).distinct()
      val survivors = batch.join(dupIds, Seq(idCol), "left_anti")
        .localCheckpoint(eager = false) // sink append + index append
      survivors.write.mode(org.apache.spark.sql.SaveMode.Append)
        .format("parquet").saveAsTable(sinkTable)
      if (extendIndex) Similarity.ivfAppendToIndex(survivors, indexTable, idCol, vecCol)
    }
    vecsStream.writeStream.outputMode("append").foreachBatch(perBatch).start()
  }

  /** Stream-stream interval join: every left event joined to right events of
    * the same key with rightTs in [leftTs - upper, leftTs - lower] (backward
    * window). Watermarks on BOTH sides bound the join state — Spark retains
    * each side only until the other's watermark passes the interval, so state
    * is O(rate x window), not O(stream length). Both sides shuffle on the
    * key; at 100 TB/day this is the same key-partitioned discipline as the
    * batch RangeJoin, with watermark-driven cleanup instead of buckets.
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lowerSec: Long, upperSec: Long,
      watermark: String = "2 hours"): DataFrame = {
    require(lowerSec <= upperSec, "interval lower bound must not exceed upper bound")
    val l = left.withWatermark(leftTs, watermark)
    // prefix ALL right columns: the common case is a self-join of two filters
    // of the same stream, where every unprefixed name would be ambiguous
    val r = right.toDF(right.columns.toIndexedSeq.map("_r_" + _): _*)
      .withWatermark("_r_" + rightTs, watermark)
    val keyCond = keys.map(k => col(k) === col("_r_" + k)).reduce(_ && _)
    val range = col(leftTs) >= col("_r_" + rightTs) + expr(s"INTERVAL $lowerSec SECONDS") &&
      col(leftTs) <= col("_r_" + rightTs) + expr(s"INTERVAL $upperSec SECONDS")
    l.join(r, keyCond && range)
  }

  /** Run a streaming query to a memory sink, drain all available input
    * synchronously, and return the result table. Complete mode for
    * aggregations (default); Append for stream-stream joins.
    *
    * `statePartitions` sizes the streaming state store (fixed at first
    * start): size it to the aggregate's key cardinality, not the batch scan
    * default — 32 state-store instances for a few thousand groups cost ~2x
    * per-batch overhead on this corpus.
    *
    * `allowNoDataBatches` MUST be true for plans whose final results only
    * emit on a trailing no-data micro-batch: Append-mode event-time
    * aggregations and event-time state timeouts (e.g.
    * [[graft.operators.Sessionize.streamingSessionsFlushed]]) finalize
    * when the watermark advances past them, which happens one batch AFTER
    * the last data batch. The default (false) skips that trailing batch —
    * correct and faster for Complete-mode aggregations and plain Append
    * joins/projections, silently wrong for the watermark-finalized shapes.
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      statePartitions: Option[Int] = None,
      outputMode: OutputMode = OutputMode.Complete(),
      allowNoDataBatches: Boolean = false): DataFrame = {
    def drain(): Unit = {
      // a synchronous drain doesn't need the trailing empty micro-batch that
      // event-time cleanup would use — skipping it saves a full batch round
      // trip per run (results are unaffected: all data batches still run).
      // The restore is its own finally so a throw from start()/stop() cannot
      // leave the session conf mutated.
      val key = "spark.sql.streaming.noDataMicroBatches.enabled"
      val saved = spark.conf.get(key)
      try {
        spark.conf.set(key, allowNoDataBatches.toString)
        val q = streamed.writeStream
          .outputMode(outputMode)
          .format("memory")
          .queryName(name)
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally spark.conf.set(key, saved)
    }
    statePartitions match {
      case Some(n) => graft.SparkUtil.withShufflePartitions(spark, n)(drain())
      case None => drain()
    }
    spark.table(name)
  }
}
