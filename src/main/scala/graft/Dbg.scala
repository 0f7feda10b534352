package graft
import org.apache.spark.sql.SparkSession
/** Scratch main for ad-hoc debugging (not part of the engine). */
object Dbg {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (a.nonEmpty) a.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val doExplain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    names.foreach { n =>
      System.err.println(s"=== $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (doExplain) df.explain("formatted") else df.count(): Unit
    }
    spark.stop()
  }
}
