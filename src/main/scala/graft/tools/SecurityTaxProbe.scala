package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Receipt for the security layer's "zero extra shuffles or passes" claim
  * (SecurityRules scaladoc; r16 verdict #5): quantifies the security tax on
  * the curation funnel instead of arguing it.
  *
  * Three measurements per probe dir:
  *
  * 1. PLAN PARITY — sec_pipeline_curate's frame vs the hand-written
  *    equivalent (same row filter + mask + provenance join composed
  *    directly on the Catalyst API, no SecurityContext): Exchange count
  *    and parquet PushedFilters must match node-for-node, proving the
  *    policy rewrite adds column expressions and a pushable predicate,
  *    never a shuffle or an extra pass.
  * 2. REWRITE LATENCY — the driver-side policy rewrite alone (parse +
  *    analyze + policy lookup + re-analyze), no execution: the actual tax,
  *    paid once per query regardless of data volume.
  * 3. WARM RUNTIMES of the verdict's named pairs (sec_pipeline_curate vs
  *    pipeline_curate, sec_stream_curate vs stream_curate), 2 reps, rep 2
  *    reported. These pairs are NOT equal work — the sec members add the
  *    en-only row filter (less data), the MASK_HASH projection, and a
  *    provenance join — so their delta is attributed, not expected zero.
  *
  * Usage: runMain graft.tools.SecurityTaxProbe
  * Env:   SPARK_GRAFT_PROBE_DIRS (default /root/testdata/sf0.1,/tmp/sf1,/tmp/sf10)
  */
object SecurityTaxProbe {
  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size

  private def scanFilters(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s"pushed=${s.metadata.getOrElse("PushedFilters", "-")} " +
          s"schema=${s.metadata.getOrElse("ReadSchema", "-")}"
    }

  /** Shuffle count + join strategies of the RUNTIME-FINAL plan under AQE:
    * executes the frame (noop sink), then walks the finalized adaptive plan
    * RECURSIVELY through query-stage boundaries (QueryStageExec is a leaf
    * node — a plain collect stops at the first stage). Reused exchanges are
    * not re-counted or re-entered.
    */
  private def aqeFinalSummary(df: DataFrame): (Int, Seq[String]) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.write.format("noop").mode("overwrite").save()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Nil
        case _ => p.children.flatMap(walk)
      }
      p +: inner
    }
    val all = walk(df.queryExecution.executedPlan)
    val shuffles = all.count {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _ => false
    }
    val joins = all.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.nodeName
    }
    (shuffles, joins)
  }

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS").map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- dirs) {
      graft.streaming.StreamOps.configureDrainFor(spark, dir)

      // ---- 1. plan parity: policy-injected vs hand-written ----------------
      // AQE off for the snapshot so both plans are compared pre-runtime
      // (same rule set either way; AQE decisions depend on runtime stats,
      // not on which side wrote the filter)
      def manualCurate(): DataFrame = {
        val d = graft.queries.Tables.df(spark, dir, "documents")
        import org.apache.spark.sql.graft.GraftSqlShims.{columnOf, expressionOf}
        val manualIn = d.filter(col("lang") === "en")
          .select(col("doc_id"), col("text"),
            columnOf(graft.functions.MaskFunctions.maskHash(
              Seq(expressionOf(col("source"))))).as("source"))
        graft.operators.TextAnalysis.curate(
            manualIn, "doc_id", "text", minWords = 30, minStopHits = 1)
          .join(manualIn.select(col("doc_id"), col("source")), "doc_id")
          .orderBy(col("doc_id"))
      }
      graft.SparkUtil.withConfs(spark, "spark.sql.adaptive.enabled" -> "false") {
        val secured = graft.SparkEntry.queries("sec_pipeline_curate")(spark, dir)
        val manual = manualCurate()
        val (es, em) = (exchanges(secured), exchanges(manual))
        println(s"[sectax] $dir plan-parity exchanges: sec=$es manual=$em " +
          (if (es == em) "MATCH" else "MISMATCH"))
        println(s"[sectax] $dir sec scans:    ${scanFilters(secured).mkString(" | ")}")
        println(s"[sectax] $dir manual scans: ${scanFilters(manual).mkString(" | ")}")
      }

      // ---- 1b. AQE-ON plan parity (r17 verdict caveat: the static
      // snapshot pins AQE off, but at 100 TB AQE is on and its skew/
      // coalesce/broadcast decisions are made from runtime stats — if the
      // policied side's stats diverged enough to flip a join strategy or
      // split a skewed partition differently, the parity argument would
      // have daylight). Execute both sides under AQE and compare the
      // FINALIZED plans: materialized shuffle count and join strategies
      // must match. ----
      {
        val (ss, js) = aqeFinalSummary(
          graft.SparkEntry.queries("sec_pipeline_curate")(spark, dir))
        val (ms, mj) = aqeFinalSummary(manualCurate())
        println(s"[sectax] $dir AQE-final shuffles: sec=$ss manual=$ms " +
          (if (ss == ms) "MATCH" else "MISMATCH") +
          s"; joins sec=[${js.mkString(",")}] manual=[${mj.mkString(",")}] " +
          (if (js == mj) "MATCH" else "MISMATCH"))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }

      // ---- 2. rewrite-only latency (driver side, no execution) ------------
      val ctx = new graft.SecurityContext(spark)
      graft.queries.Tables.df(spark, dir, "documents")
        .createOrReplaceTempView("documents_sectax")
      ctx.policyManager.addPolicy(graft.policy.RowFilterPolicy(
        "curator", "spark_catalog", "default", "documents_sectax", "lang = 'en'"))
      ctx.policyManager.addPolicy(graft.policy.DataMaskPolicy(
        "curator", "spark_catalog", "default", "documents_sectax", "source", "MASK_HASH"))
      val sql = "SELECT doc_id, text, source FROM documents_sectax"
      ctx.dfMixed("curator", sql) // warm the rule pipeline once, untimed
      val t0 = System.nanoTime()
      val rewriteReps = 20
      (1 to rewriteReps).foreach(_ => ctx.dfMixed("curator", sql))
      println(f"[sectax] $dir rewrite-only latency: " +
        f"${(System.nanoTime() - t0) / 1e6 / rewriteReps}%.1f ms/query " +
        f"($rewriteReps reps, parse+analyze+policy+inject, no execution)")

      // ---- 3. warm runtimes of the verdict's pairs -------------------------
      for (name <- Seq("pipeline_curate", "sec_pipeline_curate",
          "stream_curate", "sec_stream_curate")) {
        val times = (1 to 2).map { _ =>
          val t = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val s = (System.nanoTime() - t) / 1e9
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.sharedState.cacheManager.clearCache()
          graft.streaming.StreamOps.dropDrainResidue(spark)
          System.gc()
          s
        }
        println(f"[sectax] $dir $name cold=${times.head}%.2f s warm=${times.last}%.2f s")
      }
    }
    spark.stop()
  }
}
