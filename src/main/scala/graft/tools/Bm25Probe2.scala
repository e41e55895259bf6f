package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Follow-up drill for the two stages Bm25Probe found dominant (the
  * (query,doc) aggregate and the window cut) — isolates expression
  * eval vs hash-agg cost vs exchange vs the WindowGroupLimit cut by
  * checkpointing the fan-out and timing each variant on the resident
  * frame. Diagnostic only.
  */
object Bm25Probe2 {
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
    import org.apache.spark.sql.expressions.Window

    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val qs = docs
      .where(col("text").isNotNull && col("doc_id") % 5 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.words(col("text")), 1, 4),
          " ").as("query_text"))
      .localCheckpoint()
    qs.count()

    def t(name: String)(f: => Any): Unit = {
      val s = System.nanoTime()
      val r = f
      println(f"$name%-34s ${(System.nanoTime() - s) / 1e9}%8.3f s   $r")
    }

    val (k1, b) = (1.2, 0.75)
    val toks = docs.where(col("text").isNotNull)
      .select(col("doc_id"), graft.operators.Dedup.words(col("text")).as("toks"))
    val stats = toks.agg(count(lit(1)).as("n"),
      avg(size(col("toks")).cast("long")).as("avgdl"))
    val qTerms = qs.select(col("query_id").cast("long").as("query_id"),
      explode(array_distinct(graft.operators.Dedup.words(col("query_text")))).as("term"))
    val qVocab = qTerms.select("term").distinct()
    val tf = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(qVocab), Seq("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfd = col("tf").cast("double")
    val termScore = idf * tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) *
        col("dl").cast("double") / col("avgdl")))
    val fanout = tf
      .join(broadcast(df), Seq("term"))
      .join(broadcast(qTerms), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(termScore * lit(1000000.0), 0).cast("long").as("s"))

    // resident copy: isolates downstream stages from upstream recompute
    val fo = fanout.localCheckpoint()
    t("checkpoint fanout")(fo.count())
    t("A: agg on resident fanout")(
      fo.groupBy("query_id", "doc_id").agg(sum("s")).count())
    t("A2: agg again (warm)")(
      fo.groupBy("query_id", "doc_id").agg(sum("s")).count())
    // expression eval cost alone: force s to be materialized w/o agg
    t("B: sum(s) global (expr+scan)")(
      fo.agg(sum("s")).collect().mkString)
    val scored = fo.groupBy("query_id", "doc_id").agg(sum("s").as("score_q"))
      .localCheckpoint()
    t("checkpoint scored")(scored.count())
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("doc_id").asc)
    t("C: window+cast filter (as shipped)")(
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 10).count())
    t("C2: window, filter pre-cast")(
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .select(col("query_id"), col("doc_id"), col("score_q"),
          col("rank").cast("long")).count())
    println("--- explain C (shipped shape) ---")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 10).explain("formatted")
    println("--- explain C2 ---")
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10).explain("formatted")
    spark.stop()
  }
}
