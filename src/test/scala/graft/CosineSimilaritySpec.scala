package graft

import graft.operators.Similarity

import org.apache.spark.sql.functions._

/** Tests of the codegen'd cosine_similarity expression. */
class CosineSimilaritySpec extends SparkTestBase {

  import spark.implicits._

  test("matches the declarative zip_with/aggregate formulation") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(50)((Seq.fill(16)(rnd.nextFloat() * 2 - 1),
      Seq.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("a", "b")
    val declarative = Similarity.dot($"a", $"b") /
      (Similarity.l2norm($"a") * Similarity.l2norm($"b"))
    val rows = df.select(
      Similarity.cosine($"a", $"b").as("fast"), declarative.as("slow"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("identical vectors → 1.0; orthogonal → 0.0") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).toDF("a", "b")
    val got = df.select(round(Similarity.cosine($"a", $"b"), 9))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("null inputs, mismatched lengths, zero norms → NULL") {
    val df = Seq(
      (Some(Seq(1f, 2f)), None),
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f, 3f))),
      (Some(Seq(0f, 0f)), Some(Seq(1f, 2f)))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("registered as SQL function cosine_similarity") {
    GraftSession.install(spark)
    val v = spark.sql(
      "SELECT cosine_similarity(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)))").head().getDouble(0)
    assert(v == 1.0)
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    // force interpreted evaluation by evaluating the expression directly
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1f, 2f, 3f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3f, 2f, 1f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    val interp = e.eval(null).asInstanceOf[Double]
    val expected = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(interp - expected) < 1e-12)
  }
}
