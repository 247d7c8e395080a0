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
    // SPARK_GRAFT_PROBE_ONLY=name,name filters probes (substring match)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").toSeq)
    // SPARK_GRAFT_PROBE_REPS=2 re-runs each probe; the LAST rep is the warm
    // reading (first-position probes otherwise absorb JVM/page-cache/JIT
    // warmup into their number — measured 2-4x inflation on small bases,
    // which corrupts cross-SF ratios)
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    def time(name: String)(f: => Long): Unit =
      if (only.forall(_.exists(name.contains))) {
        (1 to reps).foreach { rep =>
          val t0 = System.nanoTime()
          val rows = f
          val tag = if (reps > 1) s"$name#$rep" else name
          println(f"[probe] $tag $rows rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
    // SPARK_GRAFT_PROBE_DIRS=/tmp/sf1 narrows the sweep
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1", "/tmp/sf1"))
    for (dir <- dirs) {
      println(s"[probe] === $dir ===")
      val docs = graft.queries.Tables.df(spark, dir, "documents")
      val events = graft.queries.Tables.df(spark, dir, "events")
      // DENSE re-key before name regeneration: ScaleUp offsets copy c by
      // c*1e8, so copies of one base key share BOTH nationkey (1e8 % 25 ==
      // 0) and every low name-digit — 100 records per suffix block no
      // matter how many digits the key takes, which defeats suffix
      // blocking BY FIXTURE (real TPC-H keys are dense and their digit
      // suffixes distribute). Mapping c*1e8+k -> c*baseMax+k restores the
      // honest dense-key shape the operator is designed for.
      val rawCust = graft.queries.Tables.df(spark, dir, "customer")
      val custBaseMax = rawCust
        .agg(max(col("c_custkey") % 100000000L)).first().getLong(0)
      val cust = rawCust
        .withColumn("c_custkey",
          (col("c_custkey") / 100000000L).cast("long") * custBaseMax +
            col("c_custkey") % 100000000L)
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
          .select((col("c_custkey") + 1000000000L).as("c_custkey"),
            concat(substring(col("c_name"), 1, 9), lit("O"),
              substring(col("c_name"), 11, 100)).as("c_name"),
            col("c_nationkey"))
        val all = cust.unionAll(dirty)
        graft.operators.RecordLinkage.resolve(all, "c_custkey", "c_name",
          concat_ws("|", col("c_nationkey"), substring(col("c_name"), -2, 2)),
          maxDist = 1, maxBlock = 1000).count()
      }
      def erBlk3Input = {
        val dirty = cust.filter(col("c_custkey") % 10 === 3)
          .select((col("c_custkey") + 1000000000L).as("c_custkey"),
            concat(substring(col("c_name"), 1, 9), lit("O"),
              substring(col("c_name"), 11, 100)).as("c_name"),
            col("c_nationkey"))
        cust.unionAll(dirty)
      }
      def erBlk3Key = concat_ws("|", col("c_nationkey"),
        substring(col("c_name"), -3, 3))
      time("er_customers_blk3") {
        // the scale knob: one more blocking digit -> 10x more blocks,
        // per-block depth back to the sf0.1 level
        graft.operators.RecordLinkage.resolve(erBlk3Input, "c_custkey",
          "c_name", erBlk3Key, maxDist = 1, maxBlock = 1000).count()
      }
      time("er_customers_blk3_compact") {
        // the row-local HOF pair generator — measured SLOWER than the
        // codegen'd self-join at every probed block size (r13); kept
        // measurable so the comparison row stays honest
        graft.operators.RecordLinkage.resolve(erBlk3Input, "c_custkey",
          "c_name", erBlk3Key, maxDist = 1, maxBlock = 1000,
          compactBlocks = true).count()
      }
      time("er_blk3_pairs_only") {
        // decomposition: candidate generation + verify WITHOUT components
        // and the final assignment join — locates the sf1 residual
        graft.operators.RecordLinkage.blockedPairs(erBlk3Input, "c_custkey",
          "c_name", erBlk3Key, maxDist = 1, maxBlock = 1000).count()
      }
      time("er_customers_derived") {
        // the SELF-SETTING knob (r13 verdict #4): digits derived from the
        // corpus — 2 digits at sf0.1 (16.5k records incl. plants), 3 at
        // sf1 (181k), 4 at sf10 (1.8M) — so the per-decade ratio here is
        // the ratio the deployed default actually exhibits
        val in = erBlk3Input
        val digits = graft.operators.RecordLinkage
          .derivedNameSuffixDigits(in.count())
        graft.operators.RecordLinkage.resolve(in, "c_custkey", "c_name",
          concat_ws("|", col("c_nationkey"),
            substring(col("c_name"), -digits, digits)),
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
      // ---- round-12 extensions (VERDICT r11 #4) ----
      time("graph_ppr") {
        val d = docs.select(col("doc_id"))
        val n = d.agg(count(lit(1)).as("n_docs"))
        val edges = d.crossJoin(broadcast(n))
          .select(col("doc_id").as("src"),
            explode(sequence(lit(1L), lit(1L) + col("doc_id") % lit(3L))).as("k"),
            col("n_docs"))
          .select(col("src"),
            ((col("src") * 31 + col("k") * 17) % col("n_docs")).as("dst"))
        val seeds = docs.select(col("doc_id").as("id")).filter(col("id") % 50 === 0)
        graft.operators.Graph.pagerankPersonalized(edges, "src", "dst",
          seeds, "id", iters = 3).count()
      }
      time("events_gapfill_interp") {
        graft.operators.Timeseries.gapFill(
          events.filter(col("event_type") === "purchase"),
          "user_id", "ts", "value", 86400L, method = "linear").count()
      }
      time("mm_features_real_decode") {
        val media = graft.operators.Multimodal.withRealMedia(docs, "doc_id", "text")
        graft.operators.Multimodal.decodeImageFeatures(spark, media).count()
      }
      // CDC maintain core: the change-sized path every stream_cdc_* query
      // runs per batch (snapshot diff -> Debezium encode -> decode ->
      // delta fold/apply + bucketed state rewrite), at 10x change volume.
      // File/stream transport excluded deliberately — StreamTrioProbe pins
      // the micro-batch machinery as batch-count-bound fixed cost.
      time("cdc_debezium_maintain_core") {
        val d2 = docs.select(col("doc_id"), col("lang"),
          length(col("text")).as("chars"))
        val prev = d2.filter(col("doc_id") % 3 =!= 0)
        val next = d2.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("lang"),
            when(col("doc_id") % 5 === 0, col("chars") + 11)
              .otherwise(col("chars")).as("chars"))
        Seq("probe_ivm_state", "probe_ivm_state_staged", "probe_ivm_state_old")
          .foreach(t => graft.sources.Sources.dropForOverwrite(spark, t))
        graft.operators.ChangeLog.aggStateWriteBucketed(prev,
          "probe_ivm_state", "lang", Seq("chars"), numBuckets = 4)
        val changes = graft.operators.ChangeLog.fromSnapshotsFull(prev, next,
          "doc_id", Seq("lang", "chars"))
        val events2 = graft.sources.KafkaShapedLog.encodeDebezium(changes,
          "doc_id", Seq("lang", "chars"), db = "g", table = "d")
        // in-memory Kafka-record shape (no file transport)
        val rec = events2.select(lit(null).cast("binary").as("key"),
          encode(to_json(struct(events2.columns.map(col).toIndexedSeq: _*)),
            "UTF-8").as("value"),
          lit("t").as("topic"), lit(0).as("partition"), lit(0L).as("offset"),
          current_timestamp().as("timestamp"), lit(0).as("timestampType"))
        val decoded = graft.sources.KafkaShapedLog.decodeDebezium(rec,
          prev.schema, "doc_id")
        graft.operators.ChangeLog.maintainAggTable(decoded, "probe_ivm_state",
          "op", "lang", Seq("chars"))
        spark.table("probe_ivm_state").count()
      }
      time("text_wordpiece_train") {
        graft.operators.Vocab.wordpieceTrain(docs, "text", numMerges = 8).count()
      }
      time("emb_kmeans_stats_sqdist") {
        val emb = graft.queries.Tables.df(spark, dir, "embeddings")
        val (_, cents) = graft.operators.Clustering.kmeans(emb, "vec_id",
          "embedding", k = 8, iters = 3, dim = 64)
        emb.select(
            graft.operators.Clustering.assignCol("embedding", cents).as("cell"),
            graft.operators.Clustering.sqDistCol("embedding", cents).as("d"))
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("n"), sum(col("d")).as("inertia"))
          .count()
      }
      time("text_wordpiece_match_encode") {
        val merges = graft.operators.Vocab.wordpieceTrain(docs, "text",
            numMerges = 8).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.operators.Vocab.wordpieceMatchEncode(docs, "text", merges).count()
      }
      time("stream_sessionize_fenced") {
        val fenced = graft.streaming.StreamOps.eventsStreamFenced(spark, dir,
          fenceAheadSec = 5400)
        val flushed = graft.operators.Sessionize.streamingSessionsFlushed(
          spark, fenced, "user_id", "ts", gapSeconds = 1800)
        graft.streaming.StreamOps.runToMemory(spark, flushed.toDF(),
          "probe_sess", statePartitions = Some(8),
          outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
          allowNoDataBatches = true).count()
      }
      time("stream_session_window") {
        val fenced = graft.streaming.StreamOps.eventsStreamFenced(spark, dir,
            fenceAheadSec = 5400)
          .withWatermark("ts", "0 seconds")
        val agg = fenced
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        graft.streaming.StreamOps.runToMemory(spark, agg, "probe_sw",
          statePartitions = Some(8),
          outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
          allowNoDataBatches = true).count()
      }
      time("stream_session_window_p32") {
        // the scale knob: session-window state sorts per state partition
        // (n log n in sessions/partition); at 10x volume a deployment
        // raises state partitions with the cluster — measured here
        val fenced = graft.streaming.StreamOps.eventsStreamFenced(spark, dir,
            fenceAheadSec = 5400)
          .withWatermark("ts", "0 seconds")
        val agg = fenced
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        graft.streaming.StreamOps.runToMemory(spark, agg, "probe_sw32",
          statePartitions = Some(32),
          outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
          allowNoDataBatches = true).count()
      }
      time("q2_min_cost_decorrelated") {
        graft.queries.Tables.df(spark, dir, "part")
          .createOrReplaceTempView("part_probe")
        graft.queries.Tables.df(spark, dir, "lineitem")
          .createOrReplaceTempView("lineitem_probe")
        spark.sql("""SELECT p.p_partkey, l.l_suppkey, l.l_extendedprice
                    |FROM part_probe p JOIN lineitem_probe l
                    |  ON p.p_partkey = l.l_partkey
                    |WHERE l.l_extendedprice = (
                    |  SELECT min(l2.l_extendedprice) FROM lineitem_probe l2
                    |  WHERE l2.l_partkey = p.p_partkey)""".stripMargin).count()
      }
      time("q18_semi_join") {
        graft.queries.Tables.df(spark, dir, "orders")
          .createOrReplaceTempView("orders_probe")
        spark.sql("""SELECT o.o_orderkey FROM orders_probe o
                    |WHERE o.o_orderkey IN (
                    |  SELECT l_orderkey FROM lineitem_probe GROUP BY l_orderkey
                    |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)""".stripMargin)
          .count()
      }
      // ---- round-13 extensions (VERDICT r12 #3: r12 families not yet
      // probed solo) + the unpinned session-window default (r12 #2) ----
      time("stream_session_window_derived") {
        // the SHIPPED default since r13: volume-derived state partitions
        // (sessionStatePartitions) instead of the pinned 8 measured
        // 3.7-4.5x at sf1 / the hand-picked 32 measured 2.4x
        val fenced = graft.streaming.StreamOps.eventsStreamFenced(spark, dir,
            fenceAheadSec = 5400)
          .withWatermark("ts", "0 seconds")
        val agg = fenced
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        graft.streaming.StreamOps.runToMemory(spark, agg, "probe_swd",
          statePartitions =
            Some(graft.streaming.StreamOps.sessionStatePartitions(spark, dir)),
          outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
          allowNoDataBatches = true).count()
      }
      time("stream_session_window_rocksdb") {
        // disk-backed state at 10x session volume: where the heap store's
        // capacity story ends, RocksDB's begins — measured next to the
        // default-provider derived row above
        val fenced = graft.streaming.StreamOps.eventsStreamFenced(spark, dir,
            fenceAheadSec = 5400)
          .withWatermark("ts", "0 seconds")
        val agg = fenced
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        graft.SparkUtil.withConfs(spark,
          "spark.sql.streaming.stateStore.providerClass" ->
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
          graft.streaming.StreamOps.runToMemory(spark, agg, "probe_swrdb",
            statePartitions =
              Some(graft.streaming.StreamOps.sessionStatePartitions(spark, dir)),
            outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
            allowNoDataBatches = true).count()
        }
      }
      time("sec_stream_sessions") {
        val ctx = new graft.SecurityContext(spark)
        graft.streaming.StreamOps.eventsStreamFenced(spark, dir,
            fenceAheadSec = 5400)
          .createOrReplaceTempView("events_probe_sess")
        ctx.policyManager.addPolicy(graft.policy.RowFilterPolicy(
          "stream_user", "spark_catalog", "default", "events_probe_sess",
          "user_id % 3 != 0"))
        val secured = ctx.dfRowFilter("stream_user",
          "SELECT ts, user_id FROM events_probe_sess")
        val agg = secured.withWatermark("ts", "0 seconds")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        graft.streaming.StreamOps.runToMemory(spark, agg, "probe_secsess",
          statePartitions =
            Some(graft.streaming.StreamOps.sessionStatePartitions(spark, dir)),
          outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
          allowNoDataBatches = true).count()
      }
      time("stream_late_drop") {
        val stream = graft.streaming.StreamOps.eventsStreamLateReplay(spark,
            dir, fenceAheadSec = 7200)
          .withWatermark("ts", "0 seconds")
        val agg = stream
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        graft.streaming.StreamOps.runToMemory(spark, agg, "probe_late",
          statePartitions = Some(8),
          outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
          allowNoDataBatches = true).count()
      }
      time("stream_enrich_dim") {
        val dim = graft.queries.Tables.df(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        graft.streaming.StreamOps.runToMemory(spark,
          graft.streaming.StreamOps.eventsStream(spark, dir)
            .join(broadcast(dim), col("user_id") === col("c_custkey"))
            .select(col("event_id"), col("user_id"), col("c_mktsegment")),
          "probe_enrich",
          outputMode = org.apache.spark.sql.streaming.OutputMode.Append()).count()
      }
      time("stream_interval_join_outer") {
        val fenced = graft.streaming.StreamOps.eventsStreamFenced(spark, dir,
          fenceAheadSec = 1800)
        val purchases = fenced
          .filter(col("event_type") === "purchase" || col("user_id") === -1L)
          .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
        val errors = fenced
          .filter(col("event_type") === "error" || col("user_id") === -1L)
          .select(col("event_id"), col("user_id"), col("ts"))
        val joined = graft.streaming.StreamOps.streamIntervalJoin(purchases,
          errors, Seq("user_id"), "ts", "ts", lowerSec = 0, upperSec = 600,
          watermark = "0 seconds", joinType = "left_outer")
        graft.streaming.StreamOps.runToMemory(spark, joined, "probe_ivjo",
          statePartitions = Some(8),
          outputMode = org.apache.spark.sql.streaming.OutputMode.Append(),
          allowNoDataBatches = true).count()
      }
      time("cdc_schema_change_mat") {
        val (logDir, rowSchema) = graft.queries.PipelineQueries
          .schemaEvolveLog(spark, dir)
        val raw = spark.read.schema(graft.sources.KafkaShapedLog.schema)
          .parquet(logDir)
        val decoded = graft.sources.KafkaShapedLog.decodeDebezium(
          raw, rowSchema, "doc_id", extraCols = Seq("offset"))
        graft.operators.ChangeLog.materialize(
          decoded.select(col("doc_id"), col("offset"), col("op"),
            col("lang_after").as("lang"), col("chars_after").as("chars"),
            col("words_after").as("words")),
          "doc_id", Seq("offset"), "op", Seq("lang", "chars", "words"))
          .count()
      }
    }
    spark.stop()
  }
}
