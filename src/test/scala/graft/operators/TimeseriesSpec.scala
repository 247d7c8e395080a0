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
