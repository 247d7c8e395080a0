package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins whose hot keys exceed what AQE's runtime
  * skew-splitting can rebalance (e.g. one key holding >1 executor's worth of
  * rows at 100 TB).
  *
  * The skewed (big) side gets a deterministic salt in [0, saltFactor) derived
  * from a unique column — deterministic so retried tasks and re-runs
  * partition identically (no rand()). The small side is replicated
  * saltFactor times via explode. The join key becomes (keys..., salt), which
  * splits each hot key's rows across saltFactor partitions at the cost of
  * replicating the small side's matching rows.
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      bigUniqueCol: String,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // the small side is replicated saltFactor times, so any join type that
    // preserves unmatched small-side rows would emit them saltFactor times
    val bigPreserving = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(bigPreserving.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports big-side-preserving join types only, got $joinType")
    val salted = big.withColumn("_graft_salt",
      pmod(xxhash64(col(bigUniqueCol)), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "_graft_salt", joinType).drop("_graft_salt")
  }
}
