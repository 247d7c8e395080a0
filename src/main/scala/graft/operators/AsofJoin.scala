package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: for every left row, the latest right row with
  * the same key and rightTs <= leftTs (backward, inclusive) — the
  * feature-store join of training-data pipelines (attach the most recent
  * snapshot/feature/label to each example without leaking the future).
  *
  * Spark has no native as-of join and a naive range join is quadratic per
  * key. This is the union + running-last-value formulation: tag each side,
  * union on (key, ts, side), take the running last non-null right payload per
  * key in (ts, side) order, keep the left rows — ONE shuffle on the key and
  * one linear pass per partition; no cross join, no per-key driver loop, so
  * it scales exactly like any windowed aggregation. At equal timestamps the
  * right row sorts first (side 0 < 1), making the match inclusive.
  *
  * If several right rows share (key, ts), the last in payload order wins —
  * pre-aggregate the right side to unique (key, ts) for determinism.
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightValueCols: Seq[String]): DataFrame = {
    require(rightValueCols.nonEmpty, "asof join needs at least one right value column")
    val rPayType = StructType(rightValueCols.map(c => right.schema(c)))
    val lU = left.select(
      keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side") :+
        struct(left.columns.toIndexedSeq.map(col): _*).as("_lpay") :+
        lit(null).cast(rPayType).as("_rpay"): _*)
    val rU = right.select(
      keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side") :+
        lit(null).cast(StructType(left.schema.fields)).as("_lpay") :+
        struct(rightValueCols.map(col): _*).as("_rpay"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lU.unionByName(rU)
      .withColumn("_asof", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val leftCols = left.columns.map(c => col(s"_lpay.`$c`").as(c))
    val rightCols = rightValueCols.map { c =>
      val name = if (left.columns.contains(c)) c + "_right" else c
      col(s"_asof.`$c`").as(name)
    }
    matched.select((leftCols ++ rightCols).toIndexedSeq: _*)
  }
}
