package graft.tools

import graft.operators.Similarity

/** Throwaway: IVF recall@10 vs exact top-10 across SFs and probe widths. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1")) {
      val emb = graft.Tables.load(spark, sf, "embeddings")
      val q = emb.orderBy("vec_id").select("embedding").head()
        .getSeq[Float](0).toArray
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (k <- Seq(16, 32, 64)) {
        val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", k)
        val path = s"/tmp/graft_ivf_check_${sf.split('/').last}_$k"
        Similarity.ivfBucketize(emb, "vec_id", "embedding", cents, path)
        for (frac <- Seq(0.375, 0.5, 0.625, 0.75)) {
          val nProbe = math.max(1, (k * frac).round.toInt)
          val ivf = Similarity
            .ivfTopK(spark, path, "vec_id", "embedding", q, 10, cents, nProbe)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          println(s"IVFRECALL sf=$sf k=$k nProbe=$nProbe frac=$frac " +
            s"overlap=${exact.intersect(ivf).size}")
        }
      }
    }
    spark.stop()
  }
}
