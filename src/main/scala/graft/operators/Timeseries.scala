package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Regular-grid preparation of event streams: bucketed resampling with
  * gap filling (the feature-engineering step that turns an irregular event
  * log into the fixed-step series sequence models and monitoring dashboards
  * consume), and first-order transition statistics over per-key event
  * sequences (behavior-model prep / Markov baseline).
  *
  * Scale design:
  *  - gapFill's spine is generated PER KEY from that key's own [min, max]
  *    bucket span — `explode(sequence(lo, hi))` is map-side row generation
  *    inside the projection, the same no-join discipline as
  *    [[Packing.packSegments]]; there is no calendar cross join against the
  *    key universe.
  *  - The only shuffles are the (key, bucket) pre-aggregate and the per-key
  *    window for carry-forward — both keyed on the key column, so a
  *    pre-partitioned input reuses its layout. Per-key state is bounded by
  *    that key's own time span, never the global one.
  *  - Bucket sums are rounded to 6 decimals so results are independent of
  *    partial-aggregation order (cross-engine determinism, as everywhere).
  *  - transitionMatrix is one per-key lag window + one |states|^2-row
  *    aggregate; the output is vocabulary-sized, not event-sized.
  */
object Timeseries {

  /** Resample `valCol` into `stepSeconds` buckets per key, then fill empty
    * buckets: `method = "locf"` carries the last observed bucket sum
    * forward; `method = "linear"` interpolates between the surrounding
    * observations (every gap is interior — the spine spans exactly the
    * key's own [min, max] observed buckets — so both neighbors always
    * exist). Returns (key, bucket_ts, observed, value); `observed` false
    * marks filled rows.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      stepSeconds: Long, method: String = "locf"): DataFrame = {
    require(method == "locf" || method == "linear",
      s"unknown gap-fill method: $method")
    val bucketed = df
      .select(col(keyCol).as("key"),
        floor(unix_timestamp(col(tsCol)) / stepSeconds).as("bucket"),
        col(valCol).as("v"))
      .groupBy(col("key"), col("bucket"))
      .agg(round(sum(col("v")), 6).as("v"))
    val spine = bucketed
      .groupBy(col("key"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val joined = spine.join(bucketed, Seq("key", "bucket"), "left")
    val back = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = method match {
      case "locf" => last(col("v"), ignoreNulls = true).over(back)
      case "linear" =>
        val pv = last(col("v"), ignoreNulls = true).over(back)
        val pb = last(when(col("v").isNotNull, col("bucket")),
          ignoreNulls = true).over(back)
        val nv = first(col("v"), ignoreNulls = true).over(fwd)
        val nb = first(when(col("v").isNotNull, col("bucket")),
          ignoreNulls = true).over(fwd)
        when(col("v").isNotNull, col("v")).otherwise(
          // exactly this arithmetic form on both engines
          round(pv + (nv - pv) * (col("bucket") - pb) / (nb - pb), 6))
    }
    joined.select(col("key"),
      timestamp_seconds(col("bucket") * stepSeconds).as("bucket_ts"),
      col("v").isNotNull.as("observed"),
      filled.as("value"))
  }

  /** Rolling z-score anomaly flags over a bucketed series: each (key,
    * bucket) sum is scored against the mean/std of its own TRAILING
    * `lookback` observed buckets (frame excludes the current row — an
    * anomaly must not inflate its own baseline). One (key, bucket)
    * pre-aggregate + one key-partitioned window, nothing global.
    *
    * Cross-engine determinism: std comes from the explicit sum/sum-of-
    * squares closed form — NOT the engine's stddev aggregate, whose
    * streaming formulation differs between engines in low-order bits —
    * with every intermediate rounded (inputs 6dp, variance floored at 0
    * for cancellation, z-score 4dp).
    */
  def anomalies(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      stepSeconds: Long, lookback: Int = 7, zThresh: Double = 3.0,
      minN: Int = 3): DataFrame = {
    // n = 1 would divide the variance term by zero and score NaN-derived
    // values as silently-unscored rows — reject, don't null out
    require(minN >= 2, s"minN must be >= 2 (variance divides by n-1), got $minN")
    val b = df
      .select(col(keyCol).as("key"),
        floor(unix_timestamp(col(tsCol)) / stepSeconds).as("bucket"),
        col(valCol).as("v"))
      .groupBy(col("key"), col("bucket"))
      .agg(round(sum(col("v")), 6).as("value"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    val n = count(col("value")).over(w)
    val sv = sum(col("value")).over(w)
    val svv = sum(col("value") * col("value")).over(w)
    b.select(col("key"),
        timestamp_seconds(col("bucket") * stepSeconds).as("bucket_ts"),
        col("value"), n.as("n"), sv.as("sv"), svv.as("svv"))
      .withColumn("mean", round(col("sv") / col("n"), 6))
      .withColumn("std", when(col("n") >= minN,
        round(sqrt(greatest(
          (col("svv") - col("sv") * col("sv") / col("n")) /
            (col("n") - 1), lit(0.0))), 6)))
      .withColumn("zscore", when(col("std") > 0,
        round((col("value") - col("mean")) / col("std"), 4)))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) > zThresh, lit(false)))
      .select(col("key"), col("bucket_ts"), col("value"),
        when(col("n") >= minN, col("mean")).as("mean"),
        col("std"), col("zscore"), col("is_anomaly"))
  }

  /** A finalized (key, bucket, value) series row arriving on a stream. */
  case class BucketRow(key: String, bucket: Long, value: Double)
  /** A scored series row — the streaming twin of [[anomalies]]' output. */
  case class AnomalyRow(key: String, bucket_ts: java.sql.Timestamp,
      value: Double, mean: Option[Double], std: Option[Double],
      zscore: Option[Double], is_anomaly: Boolean)

  private def roundD(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Score one value against its trailing window — the EXACT arithmetic of
    * [[anomalies]] (same summation order, same roundings), shared so the
    * streaming form cannot drift from the batch form. `window` is oldest
    * first.
    */
  private[operators] def scoreOne(window: Seq[Double], v: Double,
      zThresh: Double, minN: Int): (Option[Double], Option[Double],
      Option[Double], Boolean) = {
    require(minN >= 2, s"minN must be >= 2 (variance divides by n-1), got $minN")
    val n = window.size
    if (n < minN) return (None, None, None, false)
    var sv = 0.0; var svv = 0.0
    window.foreach { x => sv += x; svv += x * x }
    val mean = roundD(sv / n, 6)
    val std = roundD(math.sqrt(math.max((svv - sv * sv / n) / (n - 1), 0.0)), 6)
    if (std > 0) {
      val z = roundD((v - mean) / std, 4)
      (Some(mean), Some(std), Some(z), math.abs(z) > zThresh)
    } else (Some(mean), Some(std), None, false)
  }

  /** Streaming twin of [[anomalies]]: scores finalized (key, bucket, value)
    * rows as they arrive, keeping only the trailing `lookback` values per
    * key in group state (bounded — a key's state never exceeds `lookback`
    * doubles). Requires rows to arrive bucket-ordered per key across
    * batches (the producer is a windowed aggregate that finalizes buckets
    * in order); within a batch any order is fine (sorted before folding).
    * Replaying the same rows through any micro-batch slicing emits exactly
    * the batch [[anomalies]] rows — spec-pinned.
    */
  def streamingAnomalies(buckets: DataFrame, stepSeconds: Long,
      lookback: Int = 7, zThresh: Double = 3.0, minN: Int = 3)
      : Dataset[AnomalyRow] = {
    require(minN >= 2, s"minN must be >= 2 (variance divides by n-1), got $minN")
    val spark = buckets.sparkSession
    import spark.implicits._
    val typed = buckets
      .select(col("key").cast("string").as("key"), col("bucket").cast("long")
        .as("bucket"), col("value").cast("double").as("value"))
      .as[BucketRow]
    def fn(key: String, rows: Iterator[BucketRow],
        state: GroupState[Seq[Double]]): Iterator[AnomalyRow] = {
      var window = state.getOption.getOrElse(Seq.empty)
      val out = rows.toArray.sortBy(_.bucket).map { r =>
        val (mean, std, z, flag) = scoreOne(window, r.value, zThresh, minN)
        window = (window :+ r.value).takeRight(lookback)
        AnomalyRow(key, new java.sql.Timestamp(r.bucket * stepSeconds * 1000L),
          r.value, mean, std, z, flag)
      }
      state.update(window)
      out.iterator
    }
    typed.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn)
  }

  /** First-order transition matrix over per-key event sequences: for each
    * observed (prev_state, state) adjacency (ordered by `tsCol`, ties
    * broken by `tieCol` so the sequence is total), the transition count and
    * the row-normalized probability. Keys' first events have no
    * predecessor and are excluded.
    */
  def transitionMatrix(df: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val counts = df
      .select(col(stateCol).as("state"),
        lag(col(stateCol), 1).over(w).as("prev_state"))
      .filter(col("prev_state").isNotNull)
      .groupBy(col("prev_state"), col("state"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_state"))), 6))
  }
}
