package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShims

/** The unpersistCheckpoint leaf contract: the shim releases the blocks of
  * the checkpoint frame ITSELF and must leave any derived frame alone — a
  * checkpoint truncates lineage, so reaching through a derived handle could
  * release an RDD other live frames still scan (the r17 advice item).
  */
class GraftShimsSpec extends SparkFunSuite {
  import spark.implicits._

  test("unpersistCheckpoint releases the checkpoint frame itself, leaves derived frames alone") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val ck = (1 to 100).toDF("x").localCheckpoint(eager = true)
    val persisted0 = spark.sparkContext.getPersistentRDDs.size
    assert(persisted0 >= 1, "eager localCheckpoint must persist its RDD")
    // a frame DERIVED over the checkpoint is not the checkpoint: no-op,
    // blocks stay, both frames stay readable
    val derived = ck.filter(col("x") > 50)
    GraftSqlShims.unpersistCheckpoint(derived, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size == persisted0,
      "shim must not reach through a derived plan to the checkpoint's RDD")
    assert(derived.count() == 50L)
    // the checkpoint frame itself: released now, not at ContextCleaner GC
    GraftSqlShims.unpersistCheckpoint(ck, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size == persisted0 - 1,
      "shim must release the checkpoint frame's own blocks")
  }
}
