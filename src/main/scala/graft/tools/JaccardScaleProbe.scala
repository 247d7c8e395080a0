package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for the dedup_jaccard (PPJoin) scale flag the r15
  * sf10 sweep raised (4.9 s sf1 -> 94 s sf10 warm, 19x for 10x): times the
  * operator's three phases separately — token-set materialization +
  * global document frequency, prefix candidate generation, exact verify —
  * and counts the candidate pairs, so a super-linear reading can be
  * attributed to candidate GROWTH (a fixture/threshold property) vs a
  * plan/memory cliff (spill, broadcast flip). Usage:
  *   SPARK_GRAFT_PROBE_DIRS=... runMain graft.tools.JaccardScaleProbe
  */
object JaccardScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS").map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    for (dir <- dirs) {
      val docs = graft.queries.Tables.df(spark, dir, "documents")
        .withColumn("len_band", expr("CAST(n_chars DIV 100 AS INT)"))
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[jprobe] $dir $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      // phase 1: token sets + global df (the two linear aggregates)
      val withSet = docs.select(col("doc_id"), col("lang"), col("len_band"),
          expr("graft_shingle_hashes(text, 1)").as("wset"))
        .localCheckpoint(eager = false)
      val nTok = timed("tokens+df") {
        withSet.select(explode(col("wset")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c")).count()
      }
      // phase 2: PREFIX-FILTER PRUNING (r15 verdict #2) — how many candidate
      // pairs does PPJoin's rarest-token prefix actually remove vs joining
      // on EVERY shared token? Mirrors Dedup.jaccardPairs' prefix
      // construction (same u, same df-then-tok rank). The no-prefix mass is
      // the closed-form per-(block, token) C(cnt, 2) sum — the join's input
      // work, cheap to count without materializing the pairs.
      val thr = 0.6
      val u = thr / (1.0 + thr) - 1e-9
      val toks = withSet
        .select(col("doc_id"), col("lang"), col("len_band"),
          size(col("wset")).as("sz"), explode(col("wset")).as("tok"))
      val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("tok_df"))
      val allCand = timed("all-token-mass") {
        toks.groupBy(col("lang"), col("len_band"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) DIV 2"))).head().getLong(0)
      }
      val prefix = toks.join(dfreq, "tok")
        .withColumn("_rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
            .orderBy(col("tok_df"), col("tok"))))
        .filter(col("_rk") <= col("sz") - ceil(lit(u) * col("sz")).cast("int") + 1)
      val prefixCand = timed("prefix-mass") {
        prefix.groupBy(col("lang"), col("len_band"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) DIV 2"))).head().getLong(0)
      }
      // full operator with candidate count (the verify join's input size).
      // TIMED AS ONE UNIT: on the capacity-floor path jaccardPairs
      // materializes its result eagerly inside the call, so timing only the
      // count would miss all the work.
      val nPairs = timed("full-op") {
        graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
          Seq("lang", "len_band"), threshold = thr).count()
      }
      println(s"[jprobe] $dir distinct_tokens=$nTok out_pairs=$nPairs " +
        s"all_token_pair_mass=$allCand prefix_pair_mass=$prefixCand " +
        f"prune=${1.0 - prefixCand.toDouble / math.max(1L, allCand)}%.4f")
      // the minhash sibling on the same corpus (verdict r15 #2 names both):
      // banded LSH bucket join + exact verify, default 200-member bucket cap
      val nMinhash = timed("minhash-op") {
        graft.operators.Dedup.minhashDedup(docs, "doc_id", "text",
          threshold = 0.9).count()
      }
      println(s"[jprobe] $dir minhash_pairs=$nMinhash")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
