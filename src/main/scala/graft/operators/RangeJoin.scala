package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: point t joined to intervals with
  * start <= t <= end on a shared key.
  *
  * Spark plans a plain inequality join as BroadcastNestedLoopJoin (quadratic,
  * broadcast-bound) — unusable at scale. This is the bucketized equi-join
  * formulation: time is cut into fixed-width buckets, each interval explodes
  * to the buckets it covers, each point maps to exactly one bucket, and the
  * join becomes an equi-join on (key…, bucket) with an exact range
  * post-filter. One hash shuffle on (key, bucket); interval replication is
  * ceil(len/bucketWidth)+1 rows, so pick bucketWidth near the typical
  * interval length — long-tail intervals cost replication, never a cross
  * join. The same shape backs stream-stream interval joins in Structured
  * Streaming; this is the batch form.
  */
object RangeJoin {

  /** Join `points` (column `tCol`) to `intervals` ([startCol, endCol], both
    * inclusive) on `keys` ++ range overlap. Non-key column names must not
    * collide between the two inputs.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      tCol: String, startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", floor(col(tCol) / bucketWidth))
    val i = intervals.withColumn("_bucket",
      explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    p.join(i, keys :+ "_bucket")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("_bucket")
  }
}
