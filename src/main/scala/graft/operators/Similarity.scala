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
    * hyperplanes. Plane components are ±1 derived from xxhash64(plane,
    * dim) parity — deterministic, no stored model, identical on every
    * executor. */
  def srpBucket(vec: Column, planes: Int, dim: Int): Column = {
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val s = aggregate(zip_with(vec, sequence(lit(0), lit(dim - 1)),
        (x, d) => when(xxhash64(p * dim + d).bitwiseAND(lit(1L)) =!= 0,
          x.cast("double")).otherwise(-x.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      when(s > 0, lit(1)).otherwise(lit(0))
    })
    aggregate(zip_with(bits, sequence(lit(0), lit(planes - 1)),
      (bit, i) => bit.cast("long") * call_function("shiftleft", lit(1L),
        i.cast("int"))),
      lit(0L), (a, x) => a + x)
  }

  /** Approximate top-k: candidates = rows whose SRP bucket equals the
    * query's bucket or differs in exactly one bit (multi-probe), exact
    * cosine re-rank within candidates. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, planes: Int = 8): DataFrame = {
    val dim = query.length
    val q = typedlit(query.toSeq)
    // query bucket + 1-bit neighbors, computed once as a literal-free
    // expression (evaluates per-row but constant-folds on the query side)
    val qBucket = srpBucket(q, planes, dim)
    val probes = array((qBucket +:
      (0 until planes).map(b => qBucket.bitwiseXOR(lit(1L << b)))): _*)
    emb.select(col(idCol), col(vecCol),
        srpBucket(col(vecCol), planes, dim).as("bucket"))
      .where(array_contains(probes, col("bucket")))
      .select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
