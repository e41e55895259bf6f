package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tests whether the 4.88 M-group hash aggregate's cost is the fast
  * two-level map overflowing its default 2^16-row capacity (every
  * insert past 65 k falls to the slow BytesToBytesMap path). Times the
  * same resident-fan-out aggregate under capacityBit 16 (default), 20
  * and with the two-level map disabled. Diagnostic only.
  */
object Bm25Probe4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)

    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val qs = docs
      .where(col("text").isNotNull && col("doc_id") % 5 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.words(col("text")), 1, 4),
          " ").as("query_text"))
      .localCheckpoint()
    qs.count()
    val qTerms = qs.select(col("query_id").cast("long").as("query_id"),
      explode(array_distinct(graft.operators.Dedup.words(col("query_text")))).as("term"))
    val toks = docs.where(col("text").isNotNull)
      .select(col("doc_id"), graft.operators.Dedup.words(col("text")).as("toks"))
    val fanout = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(qTerms), Seq("term"))
      .select(col("query_id"), col("doc_id"), lit(7L).as("s"))
      .localCheckpoint()
    println(s"fanout rows: ${fanout.count()}")

    def t(name: String)(f: => Any): Unit = {
      val s = System.nanoTime()
      val r = f
      println(f"$name%-34s ${(System.nanoTime() - s) / 1e9}%8.3f s   $r")
    }
    def agg() = fanout.groupBy("query_id", "doc_id").agg(sum("s")).count()

    for (bit <- Seq(16, 16, 20, 24)) {
      spark.conf.set("spark.sql.codegen.aggregate.fastHashMap.capacityBit", bit)
      t(s"agg capacityBit=$bit")(agg())
      t(s"agg capacityBit=$bit rep2")(agg())
    }
    spark.conf.set("spark.sql.codegen.aggregate.fastHashMap.capacityBit", 16)
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", false)
    t("agg twolevel off")(agg())
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", true)
    spark.stop()
  }
}
