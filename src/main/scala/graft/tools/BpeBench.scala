package graft.tools

import org.apache.spark.sql.functions._

/** Measurement main behind the PLANS.md crossover claim for
  * [[graft.operators.Vocab.bpeTrain]]'s adaptive trainer: times the delta
  * and recount loops at numMerges=64 in BOTH regimes — the tiny-vocab
  * documents corpus of the given sfDir (where recount should win) and a
  * synthetic 200k-distinct-word corpus (where delta should win) — asserting
  * merge-table identity each time.
  * Run: `sbt "runMain graft.tools.BpeBench [sfDir]"`.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def race(label: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
      val (delta, tDelta) = time(
        graft.operators.Vocab.bpeTrainDelta(corpus, "text", 64).collect().toList)
      val (recount, tRecount) = time(
        graft.operators.Vocab.bpeTrainRecount(corpus, "text", 64).collect().toList)
      require(delta == recount, s"$label: delta and recount merge tables diverged")
      println(f"[bpe-bench] $label numMerges=64 delta=$tDelta%.1fs " +
        f"recount=$tRecount%.1fs delta/recount=${tDelta / tRecount}%.2fx (tables identical)")
    }
    val docs = graft.queries.Tables.df(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    // warm the JIT/shuffle machinery once so neither form pays first-run cost
    graft.operators.Vocab.bpeTrainRecount(docs, "text", 2).collect()
    race(s"small-vocab($dir)", docs)
    // 200k distinct hex words, one per row: the large-vocab regime where the
    // whole-table pair explode dominates a recount iteration
    val big = spark.range(0, 200000)
      .select(col("id").as("doc_id"), md5(col("id").cast("string")).as("text"))
      .localCheckpoint()
    race("large-vocab(200k distinct words)", big)
    spark.stop()
  }
}
