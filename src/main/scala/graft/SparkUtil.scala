package graft

import org.apache.spark.sql.SparkSession

object SparkUtil {

  /** One lock per session (weakly keyed — must not outlive the session):
    * `spark.sql.shuffle.partitions` is session-global mutable state, so two
    * threads interleaving save/set/restore can permanently strand the conf
    * at a temporary value and run unrelated concurrent queries under it
    * (graft.Verify's parallel drain is exactly that shape). The lock makes
    * the whole override+body+restore atomic per session; reentrant so
    * nested overrides on one thread still save/restore pairwise.
    */
  private val shuffleLocks = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.locks.ReentrantLock]())

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to `n`,
    * restoring the previous value afterwards. Used to size iterative or
    * stateful stages (dedup-graph label propagation, streaming state stores)
    * to their own data volume instead of the corpus-scan default.
    *
    * Serialized per session: concurrent callers queue rather than race the
    * session-wide conf (and other queries on the session still observe the
    * temporary value while `body` runs — an override, not isolation; use
    * `spark.newSession()` for that). Materialize (checkpoint/collect)
    * inside `body`: plans evaluated lazily after return see the restored
    * value.
    */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    withConfs(spark, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** [[withShufflePartitions]] generalized to any session-conf overrides,
    * under the same per-session lock (one lock for ALL conf overrides: two
    * different-key overrides interleaving is just as racy as same-key).
    * Values are restored in reverse order; a key with no prior value is
    * unset. Materialize inside `body` — lazily-evaluated plans see the
    * restored values.
    */
  def withConfs[T](spark: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val lock = shuffleLocks.computeIfAbsent(spark,
      _ => new java.util.concurrent.locks.ReentrantLock())
    lock.lock()
    try {
      val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.reverse.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    } finally lock.unlock()
  }
}
