package graft
import org.apache.spark.sql.SparkSession
/** Scratch main for ad-hoc debugging (not part of the engine). */
object Dbg {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"flagship rows = ${df.count()}")
    df.show(5, false)
    spark.stop()
  }
}
