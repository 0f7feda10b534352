package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
/** Scratch main for ad-hoc debugging (not part of the engine). */
object Dbg {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id").isin(0L, 1L))
    val p = e.as("a").join(e.as("b"), col("a.vec_id") === 0 && col("b.vec_id") === 1)
      .select(col("a.embedding").as("va"), col("b.embedding").as("vb"))
    val row = p.select(
      VectorOps.dot(col("va"), col("vb")).as("dot"),
      VectorOps.cosine(col("va"), col("vb")).as("cos")).collect()(0)
    println("SPARK dot = " + row.getDouble(0))
    println("SPARK cos = " + row.getDouble(1))
    spark.stop()
  }
}
