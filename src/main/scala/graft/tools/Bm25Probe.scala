package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage breakdown for [[graft.operators.TextStats.bm25Retrieve]]
  * at the bench's ~1.3 k-query load (NOT part of the graded surface).
  * bm25_retrieve_1k entered BENCH_CLEAN_r15 at 16.1 s — the most
  * expensive clean entry — without anyone ever having measured WHICH
  * stage dominates (tf prune join? df agg? the Σ_term df·qf scored
  * fan-out? the WindowGroupLimit cut?). This mirrors the operator's
  * internal frames and times each as its own action, plus the row
  * counts that size the fan-out, so the optimization lever is chosen
  * from evidence.
  *
  * Usage: runMain graft.tools.Bm25Probe [sfDir]
  */
object Bm25Probe {
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
    println(s"queries: ${qs.count()}")

    def t(name: String)(f: => Any): Unit = {
      val s = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - s) / 1e9}%8.3f s   $r")
    }

    val (k, k1, b) = (10, 1.2, 0.75)
    val toks = docs.where(col("text").isNotNull)
      .select(col("doc_id"), graft.operators.Dedup.words(col("text")).as("toks"))
    t("toks tokenize+count")(toks.count())
    val stats = toks.agg(count(lit(1)).as("n"),
      avg(size(col("toks")).cast("long")).as("avgdl"))
    t("stats agg")(stats.collect().mkString)
    val qTerms = qs.select(col("query_id").cast("long").as("query_id"),
      explode(array_distinct(graft.operators.Dedup.words(col("query_text")))).as("term"))
    t("qTerms count")(qTerms.count())
    val qVocab = qTerms.select("term").distinct()
    t("qVocab count")(qVocab.count())
    val tf = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(qVocab), Seq("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    t("tf count")(tf.count())
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    t("df count")(df.count())
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
    t("fanout rows (pre-agg)")(fanout.count())
    val scored = fanout.groupBy("query_id", "doc_id").agg(sum("s").as("score_q"))
    t("scored agg count")(scored.count())
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("doc_id").asc)
    val full = scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
    t("full (window cut)")(full.count())
    // ---- r16 kernel shape (what bm25Retrieve now ships): per-doc
    // (s, tid) entries + Bm25ScoreQueries reference-table fan-out
    val qGroups = qTerms.groupBy("term")
      .agg(collect_list("query_id").as("qids"))
    t("driver collect qGroups")(qGroups.count())
    import spark.implicits._
    val qg = qGroups.as[(String, Seq[Long])].collect().sortBy(_._1)
    val qidsByTid = qg.map(_._2.toArray)
    val vocabTid = spark.createDataset(
      qg.iterator.map(_._1).zipWithIndex.toSeq).toDF("term", "tid")
    val tf2 = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(vocabTid), Seq("term"))
      .groupBy("doc_id", "dl", "tid")
      .agg(count(lit(1)).as("tf"))
    val df2 = tf2.groupBy("tid").agg(count(lit(1)).as("df"))
    val docEntries = tf2
      .join(broadcast(df2), Seq("tid"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        struct(round(termScore * lit(1000000.0), 0).cast("long").as("s"),
          col("tid")).as("e"))
      .groupBy("doc_id")
      .agg(collect_list(col("e")).as("entries"))
    t("docEntries collapse")(docEntries.count())
    val scoredNew = docEntries
      .select(col("doc_id"), explode(
        org.apache.spark.sql.GraftSqlShim.column(
          graft.functions.Bm25ScoreQueries(
            org.apache.spark.sql.GraftSqlShim.lazyExpression(col("entries")),
            qidsByTid))).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("doc_id"),
        col("qs.score_q").as("score_q"))
    t("kernel fan-out rows")(scoredNew.count())
    t("kernel fan-out + window cut")(
      scoredNew.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k).count())
    // end-to-end, fresh (what the bench measures), 3 reps
    for (i <- 1 to 3)
      t(s"end-to-end rep$i")(graft.operators.TextStats.bm25Retrieve(
        docs, "doc_id", "text", qs, "query_id", "query_text", k = 10).count())
    spark.stop()
  }
}
