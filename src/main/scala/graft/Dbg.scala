package graft
import org.apache.spark.sql.SparkSession
/** Scratch main for ad-hoc debugging (not part of the engine). */
object Dbg {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q01_pricing_summary", "q51_row_diff", "q80_knn_brute",
                     "q31_compaction", "q72_schema_asof")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).linesIterator
        .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("Exchange")
          || l.contains("PushedFilters") || l.contains("ReadSchema")
          || l.contains("WholeStageCodegen") || l.contains("Broadcast"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
