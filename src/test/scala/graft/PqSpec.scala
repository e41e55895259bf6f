package graft

import graft.functions.QuantizedDot
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product quantization vs a driver-side brute force that replicates the
  * engine's exact quantized-integer arithmetic (round(x·scale) Longs,
  * squared L2 per subspace, lowest-id tie-breaks) — codes and the ADC
  * ranking must agree element-for-element on random data. */
class PqSpec extends SparkTestBase {

  private val scale = 10000
  private def qz(v: Array[Float]): Array[Long] =
    v.map(QuantizedDot.q(_, scale))
  private def sqL2(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  test("pqEncode codes and pqAdcTopK ranking match brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 32; val m = 4; val dsub = dim / m; val kRefs = 8
    val vecs = (0 until 120).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")

    val refs = df.where(col("vec_id") < kRefs)
    val cb = Similarity.pqCodebook(refs, "vec_id", "embedding", m)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb, m)
    val lut = Similarity.pqLut(df.where(col("vec_id") === 3),
      "vec_id", "embedding", cb, m)
    val top = Similarity.pqAdcTopK(codes, "vec_id", "codes", lut, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // brute force with the identical integer arithmetic
    val qAll = vecs.map { case (id, v) =>
      id -> (0 until m).map(j => qz(v.slice(j * dsub, (j + 1) * dsub))).toArray
    }.toMap
    val cents = (0 until m).map(j =>
      (0 until kRefs).map(c => qAll(c.toLong)(j)).toArray).toArray
    def encode(id: Long): Array[Int] =
      (0 until m).map { j =>
        val ds = cents(j).map(c => sqL2(qAll(id)(j), c))
        ds.indexOf(ds.min) // first index of min = lowest-cid tie-break
      }.toArray
    val gotCodes = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    vecs.foreach { case (id, _) =>
      assert(gotCodes(id).map(_.toInt).toSeq == encode(id).toSeq,
        s"codes diverge for vec $id")
    }

    val lutBf = (0 until m).map(j =>
      cents(j).map(c => sqL2(qAll(3L)(j), c))).toArray
    val want = vecs.map { case (id, _) =>
      (id, encode(id).zipWithIndex.map { case (c, j) => lutBf(j)(c) }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(7)
    assert(top.toSeq == want.toSeq)
  }
}
