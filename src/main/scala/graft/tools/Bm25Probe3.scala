package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prototype shootout for the bm25Retrieve hot stage (see Bm25Probe/2):
  * variant R keys the fan-out's ONE exchange on query_id so the
  * (query,doc) aggregate and the window top-k cut both run on the same
  * partitioning (no agg exchange, no window exchange); variant M
  * removes the (query,doc) aggregate entirely (per-doc term->score
  * maps + broadcast query maps, score summed inside one projection).
  * Verifies both against the shipped operator's rows. Diagnostic only.
  */
object Bm25Probe3 {
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
      println(f"$name%-30s ${(System.nanoTime() - s) / 1e9}%8.3f s   $r")
    }

    val (k, k1, b) = (10, 1.2, 0.75)
    def common() = {
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
      (toks, stats, qTerms, tf, df)
    }
    def termScoreCol = {
      val idf = log(lit(1.0) +
        (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      val tfd = col("tf").cast("double")
      idf * tfd * lit(k1 + 1.0) /
        (tfd + lit(k1) * (lit(1.0 - b) + lit(b) *
          col("dl").cast("double") / col("avgdl")))
    }

    // ---- variant R: one query_id-keyed exchange feeds agg AND window
    def variantR() = {
      val (_, stats, qTerms, tf, df) = common()
      val fanout = tf
        .join(broadcast(df), Seq("term"))
        .join(broadcast(qTerms), Seq("term"))
        .crossJoin(broadcast(stats))
        .select(col("query_id"), col("doc_id"),
          round(termScoreCol * lit(1000000.0), 0).cast("long").as("s"))
      val scored = fanout.repartition(col("query_id"))
        .groupBy("query_id", "doc_id").agg(sum("s").as("score_q"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_q").desc, col("doc_id").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k)
    }

    // ---- variant M: no (q,d) aggregate; per-doc maps + broadcast query maps
    def variantM() = {
      val (_, stats, qTerms, tf, df) = common()
      // per-(doc, term) quantized score, then collapse to a per-doc map
      // (keyed by doc_id: the exchange carries the already-collapsed
      // 116k (doc,term) rows, output 5k map rows)
      val docMaps = tf
        .join(broadcast(df), Seq("term"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"),
          round(termScoreCol * lit(1000000.0), 0).cast("long").as("s"))
        .groupBy("doc_id")
        .agg(map_from_entries(collect_list(struct(col("term"), col("s")))).as("m"))
      // 1-row broadcast maps: term -> query_ids, query_id -> terms
      val qByTerm = qTerms.groupBy("term")
        .agg(collect_list("query_id").as("qids"))
        .agg(map_from_entries(collect_list(struct(col("term"), col("qids")))).as("qmap"))
      val termsByQ = qTerms.groupBy("query_id")
        .agg(collect_list("term").as("terms"))
        .agg(map_from_entries(collect_list(struct(col("query_id"), col("terms")))).as("tmap"))
      val exploded = docMaps
        .crossJoin(broadcast(qByTerm))
        .crossJoin(broadcast(termsByQ))
        .select(col("doc_id"), col("m"), col("tmap"),
          explode(array_distinct(flatten(
            map_values(map_filter(col("qmap"),
              (t, _) => map_contains_key(col("m"), t)))))).as("query_id"))
        .select(col("query_id"), col("doc_id"),
          aggregate(
            filter(element_at(col("tmap"), col("query_id")),
              t => map_contains_key(col("m"), t)),
            lit(0L), (acc, t) => acc + element_at(col("m"), t)).as("score_q"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_q").desc, col("doc_id").asc)
      exploded.repartition(col("query_id"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k)
    }

    val base = graft.operators.TextStats.bm25Retrieve(
      docs, "doc_id", "text", qs, "query_id", "query_text", k = 10)
    t("shipped rep1")(base.count())
    for (i <- 1 to 3) t(s"variant R rep$i")(variantR().count())
    for (i <- 1 to 3) t(s"variant M rep$i")(variantM().count())
    // row equality vs shipped
    val b0 = base.select("query_id", "doc_id", "score_q", "rank")
    t("R equality (diff count)")(
      variantR().select("query_id", "doc_id", "score_q", "rank")
        .exceptAll(b0).count() + b0.exceptAll(
          variantR().select("query_id", "doc_id", "score_q", "rank")).count())
    t("M equality (diff count)")(
      variantM().select("query_id", "doc_id", "score_q", "rank")
        .exceptAll(b0).count() + b0.exceptAll(
          variantM().select("query_id", "doc_id", "score_q", "rank")).count())
    spark.stop()
  }
}
