package graft
import org.apache.spark.sql.SparkSession
/** Scratch main for ad-hoc debugging (not part of the engine). */
object Dbg {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).show(5, false)
    spark.stop()
  }
}
