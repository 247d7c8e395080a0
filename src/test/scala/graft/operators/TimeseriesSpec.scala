package graft.operators

import graft.SparkFunSuite
import java.sql.Timestamp

class TimeseriesSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gapFill fills interior gaps with LOCF and flags them unobserved") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2.0),
      (1L, ts("2024-01-01 10:00:30"), 3.0),  // same bucket as above (sum 5)
      (1L, ts("2024-01-01 10:03:10"), 7.0),  // bucket +3: two-gap
      (2L, ts("2024-01-01 00:00:00"), 1.0)   // single-bucket key: no spine
    ).toDF("k", "t", "v")
    val out = Timeseries.gapFill(df, "k", "t", "v", stepSeconds = 60L)
      .orderBy("key", "bucket_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getBoolean(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 10:00:00.0", true, 5.0),
      (1L, "2024-01-01 10:01:00.0", false, 5.0),
      (1L, "2024-01-01 10:02:00.0", false, 5.0),
      (1L, "2024-01-01 10:03:00.0", true, 7.0),
      (2L, "2024-01-01 00:00:00.0", true, 1.0)))
  }

  test("gapFill linear interpolation fills interior gaps proportionally") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:03:30"), 40.0)   // bucket +3: two-gap
    ).toDF("k", "t", "v")
    val out = Timeseries.gapFill(df, "k", "t", "v", stepSeconds = 60L,
        method = "linear")
      .orderBy("bucket_ts")
      .collect().map(r => (r.getBoolean(2), r.getDouble(3)))
    assert(out.toSeq == Seq((true, 10.0), (false, 20.0), (false, 30.0),
      (true, 40.0)))
  }

  test("streamingAnomalies replays to the batch result across slicings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = ((0 until 7).map(i =>
      ("a", ts(f"2024-01-${i + 1}%02d 12:00:00"), 10.0 + (i % 3) - 1)) ++
      Seq(("a", ts("2024-01-08 12:00:00"), 100.0)) ++
      (0 until 5).map(i => ("b", ts(f"2024-01-${i + 1}%02d 06:00:00"), 2.0 * i)))
      .toDF("k", "t", "v")
    val expected = Timeseries.anomalies(raw, "k", "t", "v", 86400L,
        lookback = 7, zThresh = 3.0)
      .orderBy("key", "bucket_ts").collect().map(_.toSeq)
    // the finalized bucket rows the stream would carry (same pre-aggregate)
    val buckets = raw
      .select(col("k").as("key"),
        floor(unix_timestamp(col("t")) / 86400).as("bucket"), col("v"))
      .groupBy("key", "bucket").agg(round(sum("v"), 6).as("value"))
      .orderBy("bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // three bucket-ordered slices (cross-key interleaving is fine)
    val mem = MemoryStream[(String, Long, Double)]
    val out = Timeseries.streamingAnomalies(
      mem.toDF().toDF("key", "bucket", "value"), 86400L,
      lookback = 7, zThresh = 3.0)
    val q = out.writeStream.format("memory").outputMode("append")
      .queryName("ts_anom_stream").start()
    try {
      buckets.grouped(math.max(1, buckets.length / 3)).foreach { slice =>
        mem.addData(slice.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("ts_anom_stream")
      .orderBy("key", "bucket_ts").collect().map(_.toSeq)
    assert(got.toSeq == expected.toSeq)
  }

  test("transitionMatrix counts per-key adjacencies and row-normalizes") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 0L),
      (1L, "b", ts("2024-01-01 00:01:00"), 1L),
      (1L, "a", ts("2024-01-01 00:02:00"), 2L),
      (2L, "a", ts("2024-01-01 00:00:00"), 3L),  // first event: no prev
      (2L, "b", ts("2024-01-01 00:01:00"), 4L)
    ).toDF("k", "state", "t", "eid")
    val out = Timeseries.transitionMatrix(df, "k", "state", "t", "eid")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("a", "b") -> (2L, 1.0),
      ("b", "a") -> (1L, 1.0)))
  }

  test("anomalies flags a planted spike against its trailing window") {
    // key 1: seven quiet days (value 10 +/- 1) then a 100 spike; the spike
    // scores against the quiet baseline and flags; the quiet days don't.
    val rows = (0 until 7).map(i =>
      (1L, ts(f"2024-01-${i + 1}%02d 12:00:00"), 10.0 + (i % 3) - 1)) :+
      ((1L, ts("2024-01-08 12:00:00"), 100.0))
    val df = rows.toDF("k", "t", "v")
    val out = Timeseries.anomalies(df, "k", "t", "v", stepSeconds = 86400L,
      lookback = 7, zThresh = 3.0)
      .orderBy("bucket_ts").collect()
    assert(out.length == 8)
    // first minN-1 rows have no baseline: null mean/std, not anomalous
    assert(out.take(3).forall(r => r.isNullAt(3) && !r.getBoolean(6)))
    assert(out.dropRight(1).forall(r => !r.getBoolean(6)))
    val spike = out.last
    assert(spike.getBoolean(6), s"spike not flagged: $spike")
    assert(spike.getDouble(5) > 3.0) // zscore
  }

  test("anomalies/streamingAnomalies reject minN < 2 (n=1 would divide variance by zero)") {
    val df = Seq(("k", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1.0))
      .toDF("key", "ts", "v")
    intercept[IllegalArgumentException] {
      Timeseries.anomalies(df, "key", "ts", "v", 3600L, minN = 1)
    }
    intercept[IllegalArgumentException] {
      Timeseries.streamingAnomalies(
        df.selectExpr("key", "CAST(0 AS BIGINT) AS bucket", "v AS value"),
        3600L, minN = 1)
    }
  }

  test("anomalies: zero-variance baseline yields null zscore, no flag") {
    val df = (0 until 5).map(i =>
      (1L, ts(f"2024-01-${i + 1}%02d 12:00:00"), 5.0)).toDF("k", "t", "v")
    val out = Timeseries.anomalies(df, "k", "t", "v", 86400L).collect()
    assert(out.forall(r => r.isNullAt(5) && !r.getBoolean(6)))
  }

  test("transitionMatrix breaks timestamp ties with the tie column") {
    val t0 = ts("2024-01-01 00:00:00")
    val df = Seq((1L, "x", t0, 1L), (1L, "y", t0, 0L), (1L, "z", t0, 2L))
      .toDF("k", "state", "t", "eid")
    val out = Timeseries.transitionMatrix(df, "k", "state", "t", "eid")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // order by (t, eid): y -> x -> z
    assert(out == Set(("y", "x"), ("x", "z")))
  }
}
