package graft.streaming

import graft.SparkFunSuite

/** [[StreamOps.BatchLedger]] after the r19 direct-file record: the first
  * record creates the table normally; later records land as directly
  * written one-row parquet files (no Spark job). These pins prove the
  * mixed layout stays a normal readable parquet table, the memo and the
  * persisted table agree, and a FRESH session (the crash-recovery shape —
  * empty memo, reload from the table) sees every record including the
  * directly written ones.
  */
class BatchLedgerSpec extends SparkFunSuite {
  import StreamOps.BatchLedger

  test("record: mixed saveAsTable + direct-file layout reads back as one table") {
    val t = "ledger_spec_mixed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      assert(!BatchLedger.applied(spark, t, 0L))
      BatchLedger.record(spark, t, 0L) // creates the table (saveAsTable)
      BatchLedger.record(spark, t, 1L) // direct file
      BatchLedger.record(spark, t, 2L) // direct file
      // the table itself (not the memo) holds all three rows
      assert(spark.table(t).collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(0L, 1L, 2L))
      // hot path: the memo answers applied() for every id
      assert(Seq(0L, 1L, 2L).forall(BatchLedger.applied(spark, t, _)))
      assert(!BatchLedger.applied(spark, t, 3L))
      // fresh-session reload (the crash-recovery shape): a session with an
      // EMPTY memo must recover the directly-written records from the
      // persisted table alone
      val fresh = spark.newSession()
      assert(Seq(0L, 1L, 2L).forall(BatchLedger.applied(fresh, t, _)))
      assert(!BatchLedger.applied(fresh, t, 3L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("record after drop+recreate: stale memo entries cannot survive") {
    val t = "ledger_spec_recreate"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      BatchLedger.record(spark, t, 7L)
      assert(BatchLedger.applied(spark, t, 7L))
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // table observed missing -> memo entry dropped, nothing applied
      assert(!BatchLedger.applied(spark, t, 7L))
      BatchLedger.record(spark, t, 1L)
      assert(BatchLedger.applied(spark, t, 1L))
      assert(!BatchLedger.applied(spark, t, 7L))
      assert(spark.table(t).collect().map(_.getLong(0)).toSeq === Seq(1L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
