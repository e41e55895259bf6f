package graft.tools
import org.apache.spark.sql.SparkSession
object CheckBm25 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q85_bm25")(spark, "/root/testdata/sf0.01")
    println(df.queryExecution.optimizedPlan.toString)
    spark.stop()
  }
}
