package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ErProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val c = graft.queries.Tables.df(spark, dir, "customer")
    val dirty = c.filter(col("c_custkey") % 10 === 3)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        concat(substring(col("c_name"), 1, 9), lit("O"),
          substring(col("c_name"), 11, 100)).as("c_name"),
        col("c_nationkey"))
    val all = c.select(col("c_custkey"), col("c_name"), col("c_nationkey")).unionAll(dirty)
    val t0 = System.nanoTime()
    val pairs = graft.operators.RecordLinkage.blockedPairs(all, "c_custkey", "c_name",
      concat_ws("|", col("c_nationkey"), substring(col("c_name"), -2, 2)), 1, Int.MaxValue)
      .localCheckpoint(eager = true)
    println(s"pairs: ${pairs.count()} in ${(System.nanoTime()-t0)/1e9}s")
    val t1 = System.nanoTime()
    val labels = graft.operators.Dedup.components(pairs)
    println(s"labels: ${labels.count()} in ${(System.nanoTime()-t1)/1e9}s")
    val t2 = System.nanoTime()
    val sizes = labels.groupBy("label").count().agg(max("count"), count(lit(1))).head()
    println(s"max cluster ${sizes.get(0)}, n clusters ${sizes.get(1)}, ${(System.nanoTime()-t2)/1e9}s")
    spark.stop()
  }
}
