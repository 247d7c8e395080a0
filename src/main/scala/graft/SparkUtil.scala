package graft

import org.apache.spark.sql.SparkSession

object SparkUtil {

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to `n`,
    * restoring the previous value afterwards. Used to size iterative or
    * stateful stages (dedup-graph label propagation, streaming state stores)
    * to their own data volume instead of the corpus-scan default.
    *
    * NOT safe under concurrent planning on the same session — the conf is
    * session-wide. Scope it to jobs that own their session, or isolate with
    * `spark.newSession()`. Materialize (checkpoint/collect) inside `body`:
    * plans evaluated lazily after return see the restored value.
    */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, saved)
  }
}
