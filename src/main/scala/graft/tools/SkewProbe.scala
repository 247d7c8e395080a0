package graft.tools

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the planted-hot-key events⋈customer join three ways — plain with
  * AQE skew handling, plain without, salted — so the PLANS.md skew notes
  * carry measured numbers instead of folklore. Re-runnable:
  * `sbt "runMain graft.tools.SkewProbe <sfDir> [saltFactor]"`.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val saltFactor = if (args.length > 1) args(1).toInt else 8
    val fanout = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional fanout replicates events in the plan (distinct event_ids per
    // copy) to push the hot key past what one task absorbs quietly
    val ev = graft.queries.Tables.df(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("_copy", explode(sequence(lit(0), lit(fanout - 1))))
      .select((col("event_id") * fanout + col("_copy")).as("event_id"),
        col("user_id"), col("value"))
      .withColumn("hot_id",
        when(col("user_id") % 5 < 2, lit(7L)).otherwise(col("user_id")))
    val cust = graft.queries.Tables.df(spark, dir, "customer")
      .select(col("c_custkey").as("hot_id"), col("c_mktsegment"))
    val nEv = ev.count()
    val hotN = ev.filter(col("hot_id") === 7L).count()
    println(s"events=$nEv hotKeyRows=$hotN (${100.0 * hotN / nEv}%)")

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n groups)")
    }
    // broadcast off everywhere: the dim side fits in a broadcast at every
    // test SF, which would sidestep the skew entirely; at 100 TB the dim
    // side of a skewed join often does not fit
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (round <- 1 to 3) {
      println(s"-- round $round")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      time("plain join, AQE skew on") {
        agg(ev.join(cust, Seq("hot_id"))).count()
      }
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      time("plain join, AQE skew off") {
        agg(ev.join(cust, Seq("hot_id"))).count()
      }
      time(s"salted join (x$saltFactor)") {
        agg(SkewJoin.saltedJoin(ev, cust, Seq("hot_id"), "event_id", saltFactor)).count()
      }
    }
    spark.stop()
  }
}
