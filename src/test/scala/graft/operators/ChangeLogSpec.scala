package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[ChangeLog]] — changelog replay semantics on hand-computed logs, plus
  * the two structural invariants: compaction is replay-equivalent, and
  * fromSnapshots is materialize's inverse (replaying the derived changelog
  * over the previous state reproduces the next state).
  */
class ChangeLogSpec extends SparkFunSuite {
  import spark.implicits._

  // (key, seq, op, v): key 1 inserted then updated; key 2 inserted then
  // deleted; key 3 deleted then re-inserted (delete must NOT win when it is
  // not latest); key 4 delete-only (tombstone for a key never seen alive)
  private def log = Seq(
    (1L, 10L, "I", "a"), (1L, 20L, "U", "b"),
    (2L, 10L, "I", "c"), (2L, 30L, "D", null.asInstanceOf[String]),
    (3L, 10L, "D", null.asInstanceOf[String]), (3L, 15L, "I", "d"),
    (4L, 5L, "D", null.asInstanceOf[String])
  ).toDF("k", "seq", "op", "v")

  test("materialize: latest op wins, tombstoned keys absent") {
    val got = ChangeLog.materialize(log, "k", Seq("seq"), "op", Seq("v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "b"), (3L, "d")))
  }

  test("stateAsOf replays only the seq-bounded prefix") {
    val got = ChangeLog.stateAsOf(log, "k", Seq("seq"), "op", Seq("v"),
        lit(12L)).orderBy("k").as[(Long, String)].collect().toSeq
    // at seq 12: key 1 still 'a', key 2 alive 'c', key 3 still tombstoned
    assert(got === Seq((1L, "a"), (2L, "c")))
  }

  test("compact keeps tombstones and is replay-equivalent to the full log") {
    val compacted = ChangeLog.compact(log, "k", Seq("seq"), "op", Seq("v"))
    assert(compacted.count() === 4) // one row per ever-seen key
    assert(compacted.filter(col("op") === "D").select("k")
      .as[Long].collect().toSet === Set(2L, 4L))
    // replaying the compacted log (seq collapsed to one rank) = full replay
    val replayed = ChangeLog.materialize(
        compacted.withColumn("seq", lit(0L)), "k", Seq("seq"), "op", Seq("v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(replayed === Seq((1L, "b"), (3L, "d")))
  }

  test("seq tuple breaks timestamp ties deterministically") {
    val tied = Seq((1L, 10L, 1L, "U", "x"), (1L, 10L, 2L, "U", "y"))
      .toDF("k", "ts", "lsn", "op", "v")
    val got = ChangeLog.materialize(tied, "k", Seq("ts", "lsn"), "op", Seq("v"))
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "y")))
  }

  test("fromSnapshots emits I/U/D and round-trips through materialize") {
    val prev = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"))
      .toDF("k", "v", "src")
    val next = Seq((1L, "a", "s1"), (2L, "B", "s1"), (4L, "e", "s3"))
      .toDF("k", "v", "src")
    val delta = ChangeLog.fromSnapshots(prev, next, "k", Seq("v", "src"))
    val ops = delta.orderBy("k").select("k", "op")
      .as[(Long, String)].collect().toSeq
    assert(ops === Seq((2L, "U"), (3L, "D"), (4L, "I")))
    // D carries the dying row's payload (Flink -D semantics)
    assert(delta.filter(col("k") === 3L).select("v").as[String].head() === "c")
    // round trip: prev (as an 'I' log at rank 0) + delta (rank 1) -> next
    val asLog = prev.select(col("k"), lit(0L).as("seq"), lit("I").as("op"),
        col("v"), col("src"))
      .unionAll(delta.select(col("k"), lit(1L).as("seq"), col("op"),
        col("v"), col("src")))
    val replayed = ChangeLog.materialize(asLog, "k", Seq("seq"), "op",
        Seq("v", "src")).orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    val want = next.orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(replayed === want)
  }

  test("null-safe change detection: value moving to/from NULL is a U") {
    val prev = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("k", "v")
    val next = Seq((1L, Option.empty[String]), (2L, Option("b")))
      .toDF("k", "v")
    val ops = ChangeLog.fromSnapshots(prev, next, "k", Seq("v"))
      .orderBy("k").select("k", "op").as[(Long, String)].collect().toSeq
    assert(ops === Seq((1L, "U"), (2L, "U")))
  }

  test("incremental aggregate maintenance: maintained state equals recompute across insert/update/delete/group-move/group-death") {
    // prev: g1 holds rows 1 (v=10) and 2 (v=20); g2 holds row 3 (v=5);
    //       g3 holds row 4 (v=7) — g3 will DIE.
    // next: row 1 updated in place (v=15), row 2 MOVES g1 -> g2 (v=20),
    //       row 4 deleted (g3 empties), row 5 inserted into NEW group g4.
    val prev = Seq((1L, "g1", 10), (2L, "g1", 20), (3L, "g2", 5),
      (4L, "g3", 7)).toDF("id", "g", "v")
    val next = Seq((1L, "g1", 15), (2L, "g2", 20), (3L, "g2", 5),
      (5L, "g4", 9)).toDF("id", "g", "v")
    val full = ChangeLog.fromSnapshotsFull(prev, next, "id", Seq("g", "v"))
    // both images present exactly where defined
    val ops = full.select("id", "op").as[(Long, String)].collect().toMap
    assert(ops === Map(1L -> "U", 2L -> "U", 4L -> "D", 5L -> "I"))
    val maintained = ChangeLog.applyAggDeltas(
        ChangeLog.aggState(prev, "g", Seq("v")),
        ChangeLog.aggDeltas(full, "op", "g", Seq("v")), "g", Seq("v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val recomputed = ChangeLog.aggState(next, "g", Seq("v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(maintained === recomputed)
    // and by hand: g1 lost the moved row, kept the updated one; g2 gained
    // it; g3 is GONE (row count reached zero); g4 is new
    assert(maintained === Seq(("g1", 1L, 15L), ("g2", 2L, 25L), ("g4", 1L, 9L)))
    // empty delta batch: state passes through unchanged
    val none = ChangeLog.applyAggDeltas(ChangeLog.aggState(prev, "g", Seq("v")),
        ChangeLog.aggDeltas(full.limit(0), "op", "g", Seq("v")), "g", Seq("v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(none === ChangeLog.aggState(prev, "g", Seq("v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq)
  }

  test("IVM property: maintained == recomputed over seeded random snapshot pairs") {
    // random prev/next over a shared key space: every op mix, group moves,
    // group births/deaths and value collisions arise by construction
    (1 to 4).foreach { round =>
      val rnd = new scala.util.Random(round * 131L)
      def snap() = (0L until 60L).flatMap { k =>
        if (rnd.nextDouble() < 0.7)
          Some((k, s"g${rnd.nextInt(5)}", rnd.nextInt(100)))
        else None
      }
      val prev = snap().toDF("id", "g", "v")
      val next = snap().toDF("id", "g", "v")
      val maintained = ChangeLog.applyAggDeltas(
          ChangeLog.aggState(prev, "g", Seq("v")),
          ChangeLog.aggDeltas(
            ChangeLog.fromSnapshotsFull(prev, next, "id", Seq("g", "v")),
            "op", "g", Seq("v")), "g", Seq("v"))
        .orderBy("g").as[(String, Long, Long)].collect().toSeq
      val recomputed = ChangeLog.aggState(next, "g", Seq("v"))
        .orderBy("g").as[(String, Long, Long)].collect().toSeq
      assert(maintained === recomputed, s"round $round diverged")
    }
  }

  test("widenAggState backfills new sums as 0, keeps layout, no-ops when complete; old-schema batches after widening maintain correctly") {
    val prev = Seq((1L, "g1", 10), (2L, "g1", 20), (3L, "g2", 5))
      .toDF("id", "g", "v")
    Seq("graft_widen_t", "graft_widen_t_staged", "graft_widen_t_old")
      .foreach(t => graft.sources.Sources.dropForOverwrite(spark, t))
    ChangeLog.aggStateWriteBucketed(prev, "graft_widen_t", "g", Seq("v"),
      numBuckets = 2)
    // widen for a column the state has never seen
    ChangeLog.widenAggState(spark, "graft_widen_t", Seq("v", "w"))
    val widened = spark.table("graft_widen_t").orderBy("g")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(widened === Seq(("g1", 2L, 30L, 0L), ("g2", 1L, 5L, 0L)))
    // bucket layout preserved through the staged swap
    val spec = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_widen_t")).bucketSpec
    assert(spec.exists(s => s.numBuckets == 2 && s.bucketColumnNames == Seq("g")))
    // no-op when nothing is missing (same table, same contents)
    ChangeLog.widenAggState(spark, "graft_widen_t", Seq("v", "w"))
    assert(spark.table("graft_widen_t").orderBy("g")
      .as[(String, Long, Long, Long)].collect().toSeq === widened)
    // an OLD-SCHEMA change batch arriving after the widening (rewound or
    // mixed log): w images ride as nulls -> null deltas add 0, the w sums
    // survive the maintenance rewrite
    val oldBatch = Seq((1L, "U", "g1", 10, "g1", 15))
      .toDF("id", "op", "g_before", "v_before", "g_after", "v_after")
      .withColumn("w_before", lit(null).cast("int"))
      .withColumn("w_after", lit(null).cast("int"))
    ChangeLog.maintainAggTable(oldBatch, "graft_widen_t", "op", "g", Seq("v", "w"))
    assert(spark.table("graft_widen_t").orderBy("g")
      .as[(String, Long, Long, Long)].collect().toSeq ===
      Seq(("g1", 2L, 35L, 0L), ("g2", 1L, 5L, 0L)))
    Seq("graft_widen_t", "graft_widen_t_staged", "graft_widen_t_old")
      .foreach(t => graft.sources.Sources.dropForOverwrite(spark, t))
  }

  test("narrowAggState drops stale sums, keeps n_rows/surviving sums and layout; no-ops when current") {
    val prev = Seq((1L, "g1", 10, 100), (2L, "g1", 20, 200), (3L, "g2", 5, 50))
      .toDF("id", "g", "v", "w")
    Seq("graft_narrow_t", "graft_narrow_t_staged", "graft_narrow_t_old")
      .foreach(t => graft.sources.Sources.dropForOverwrite(spark, t))
    ChangeLog.aggStateWriteBucketed(prev, "graft_narrow_t", "g", Seq("v", "w"),
      numBuckets = 2)
    ChangeLog.narrowAggState(spark, "graft_narrow_t", Seq("v"))
    val narrowed = spark.table("graft_narrow_t")
    assert(narrowed.columns.toSeq == Seq("g", "n_rows", "sum_v"))
    assert(narrowed.orderBy("g").as[(String, Long, Long)].collect().toSeq ===
      Seq(("g1", 2L, 30L), ("g2", 1L, 5L)))
    val spec = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_narrow_t")).bucketSpec
    assert(spec.exists(s => s.numBuckets == 2 && s.bucketColumnNames == Seq("g")))
    // no-op when nothing is stale
    ChangeLog.narrowAggState(spark, "graft_narrow_t", Seq("v"))
    assert(spark.table("graft_narrow_t").columns.toSeq == Seq("g", "n_rows", "sum_v"))
    Seq("graft_narrow_t", "graft_narrow_t_staged", "graft_narrow_t_old")
      .foreach(t => graft.sources.Sources.dropForOverwrite(spark, t))
  }

  test("materialize plans one exchange, partially aggregated map-side") {
    val plan = ChangeLog.materialize(log, "k", Seq("seq"), "op", Seq("v"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"expected exactly one exchange in:\n$plan")
    // the partial max_by must run BELOW the exchange (the wire carries one
    // (key, seq, payload) per key per task, not the log)
    val exchangeAt = plan.indexOf("Exchange")
    val partialAt = plan.indexOf("partial_max_by")
    assert(partialAt > exchangeAt && partialAt >= 0,
      s"expected map-side partial_max_by under the exchange in:\n$plan")
  }
}
