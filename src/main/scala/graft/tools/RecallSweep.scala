package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures recall@10 of the bucketed-IVF probe against exact brute force
  * across an nprobe sweep — the tuning curve a user sets nprobe with
  * (documented in PLANS.md). Re-runnable:
  * `sbt "runMain graft.tools.RecallSweep <sfDir> [nQueries]"`.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = if (args.length > 1) args(1).toInt else 25
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.queries.Tables.df(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Similarity.ivfWriteBucketed(e, "graft_sweep_idx", "vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding",
      "query_id", "qv", k = 10).localCheckpoint(eager = true)
    val corpusN = e.count()
    println(s"corpus=$corpusN vectors, ${q.count()} queries, nlist=64, k=10")
    Seq(1, 2, 4, 8, 16, 32, 64).foreach { np =>
      val t0 = System.nanoTime()
      val ivf = Similarity.ivfTopKFromBucketed(spark, "graft_sweep_idx", q,
        "vec_id", "embedding", "query_id", "qv", k = 10, nprobe = np)
      val rec = Similarity.recallAtK(ivf, brute, 10)
        .agg(avg(col("recall"))).head().getDouble(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"nprobe=$np%2d  recall@10=$rec%.3f  probe_sec=$sec%.2f")
    }
    // the LSH analog: fewer hyperplane bits -> wider buckets -> higher
    // recall, more scanning (multi-probe over 1-bit flips is fixed at nBits
    // neighbors, so the scanned fraction is ~(nBits+1)/2^nBits)
    Seq(4, 6, 8, 10, 12).foreach { nb =>
      val t0 = System.nanoTime()
      val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding",
        "query_id", "qv", k = 10, nBits = nb)
      val rec = Similarity.recallAtK(lsh, brute, 10)
        .agg(avg(col("recall"))).head().getDouble(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"nBits=$nb%2d  recall@10=$rec%.3f  probe_sec=$sec%.2f")
    }
    // the PQ trade: more subspaces (m) -> finer codes -> higher ADC
    // fidelity at linearly more bytes per row (m ints vs 64 floats).
    // Full-corpus ADC sweep (no IVF pruning) isolates quantization loss.
    Seq(2, 4, 8, 16, 32).foreach { m =>
      val t0 = System.nanoTime()
      val cb = Similarity.pqCodebooks(e, "vec_id", "embedding", m = m,
        ksub = 64, sampleSize = 256, iters = 5)
      val pq = Similarity.pqTopK(e, q, "vec_id", "embedding",
        "query_id", "qv", k = 10, cb)
      val rec = Similarity.recallAtK(pq, brute, 10)
        .agg(avg(col("recall"))).head().getDouble(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pq m=$m%2d (ksub=64, ${m * 4}%3d B/row vs 256)  recall@10=$rec%.3f  train+probe_sec=$sec%.2f")
    }
    spark.stop()
  }
}
