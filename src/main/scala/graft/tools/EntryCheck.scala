package graft.tools
import org.apache.spark.sql.SparkSession
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry] rows=${rows.length}")
    rows.take(3).foreach(r => println(s"[entry] $r"))
    spark.stop()
  }
}
