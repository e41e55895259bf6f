package graft

import graft.operators.Sampling

import org.apache.spark.sql.functions._

/** Deterministic sampling operators: md5-keyed stratified top-k,
  * rate-based mixture, train/val/test hash split. */
class SamplingSpec extends SparkTestBase {

  import spark.implicits._

  private def rows(n: Int) = (1L to n.toLong)
    .map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    .toDF("id", "s")

  test("stratifiedSample is deterministic across runs and repartitioning") {
    val df = rows(300)
    val first = Sampling.stratifiedSample(df, "s", "id", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val second = Sampling.stratifiedSample(df.repartition(13), "s", "id", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(first == second)
    assert(first.groupBy(_._2).forall(_._2.size == 7))
  }

  test("stratifiedSample prune path equals the exact unpruned window") {
    val df = rows(500)
    // fudge small enough that the prune engages (n=166+ per stratum,
    // fudge*k = 8 << n), large strata
    val pruned = Sampling.stratifiedSample(df, "s", "id", 4, fudge = 2.0)
      .collect().map(r => r.getLong(0)).toSet
    // oracle: per-stratum k smallest md5(id) — plain window, no prune
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("s").orderBy(md5(col("id").cast("string")
      .cast("binary")), col("id"))
    val exact = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 4).collect().map(r => r.getLong(0)).toSet
    assert(pruned == exact)
  }

  test("stratifiedSample returns whole strata smaller than k") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "s")
    val out = Sampling.stratifiedSample(df, "s", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "x"), (2L, "x"), (3L, "y")))
  }

  test("stratifiedSample keeps the caller's column order") {
    val out = Sampling.stratifiedSample(rows(50), "s", "id", 2)
    assert(out.columns.toSeq == Seq("id", "s"))
  }

  test("mixtureSample holds rates approximately and exactly repeats") {
    val df = rows(3000)
    val out = Sampling.mixtureSample(df, "s", "id",
      rates = Map("a" -> 0.25, "b" -> 0.0), defaultRate = 0.75)
    val byS = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~1000 rows per stratum: a=0.25 -> ~250, b=0.0 -> absent, c=0.75 -> ~750
    assert(!byS.contains("b"))
    assert(byS("a") > 150 && byS("a") < 350, s"a=${byS("a")}")
    assert(byS("c") > 650 && byS("c") < 850, s"c=${byS("c")}")
    val again = Sampling.mixtureSample(df.repartition(7), "s", "id",
      rates = Map("a" -> 0.25, "b" -> 0.0), defaultRate = 0.75)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedSample: a NULL stratum is its own group on both paths") {
    val df = (1L to 120L)
      .map(i => (i, if (i % 4 == 0) null else s"s${i % 2}"))
      .toDF("id", "s")
    // pruned path (default fudge) and exact path must agree and both
    // must return k rows for the null stratum
    val a = Sampling.stratifiedSample(df, "s", "id", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Sampling.stratifiedSample(df, "s", "id", 3, fudge = 1000.0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    assert(a.count(_._2 == null) == 3)
    assert(a.count(_._2 == "s0") == 3 && a.count(_._2 == "s1") == 3)
  }

  test("mixtureSample keeps NULL-stratum rows under the default rate") {
    val df = Seq((1L, "a"), (2L, null), (3L, null)).toDF("id", "s")
    val kept = Sampling.mixtureSample(df, "s", "id",
      rates = Map("a" -> 0.0), defaultRate = 1.0)
      .collect().map(_.getLong(0)).toSet
    // stratum a filtered to nothing; null stratum takes defaultRate 1.0
    assert(kept == Set(2L, 3L))
  }

  test("mixtureSample rate 1.0 keeps every row") {
    val df = rows(100)
    assert(Sampling.mixtureSample(df, "s", "id", rates = Map.empty).count()
      == 100L)
  }

  test("rate threshold: a rate just under 1 must not invert the filter") {
    // 1 - 1e-12 rounds to 2^32; a naive 9-char hex rendering
    // ("100000000") sorts BELOW almost every 8-char key and would keep
    // ~nothing — it must collapse to the keep-all sentinel instead
    assert(Sampling.rateThresholdHex(1.0 - 1e-12) == "g")
    assert(Sampling.rateThresholdHex(1.0) == "g")
    assert(Sampling.rateThresholdHex(0.0) == "")
    assert(Sampling.rateThresholdHex(0.5) == "80000000")
    val df = rows(200)
    val kept = Sampling.mixtureSample(df, "s", "id",
      rates = Map("a" -> (1.0 - 1e-12)), defaultRate = 1.0).count()
    assert(kept == 200L)
  }

  test("hashSplit labels are disjoint, exhaustive and near the fractions") {
    val df = (1L to 5000L).toDF("id")
    val out = Sampling.hashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() == 5000L)
    val byLabel = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 3800 && byLabel("train") < 4200)
    assert(byLabel("val") > 350 && byLabel("val") < 650)
    assert(byLabel("test") > 350 && byLabel("test") < 650)
    // deterministic: same labels after repartitioning
    val again = Sampling.hashSplit(df.repartition(11), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("budgetSample keeps the exact md5-ordered prefix within budget") {
    val df = (1L to 60L).map(i => (i, s"g${i % 3}", 10L + i % 7))
      .toDF("id", "grp", "w")
    val kept = Sampling.budgetSample(df, "grp", "id", "w", budget = 60L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    // reference: simulate the same md5-ordered prefix walk per group
    val ordered = df.select(col("id"), col("grp"), col("w"),
        Sampling.hashKey(col("id")).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expect = ordered.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      // cum accumulates EVERY row's weight (the window sums all
      // predecessors, kept or cut), so after the first overshoot no
      // later row can pass — same cut-the-rest semantics as the operator
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).flatMap { case (id, g, w, _) =>
        val row = if (cum + w <= 60L) Some((id, g, cum)) else None
        cum += w
        row
      }
    }.toSet
    assert(kept == expect && kept.nonEmpty && kept.size < 60)
    // deterministic under repartitioning
    val again = Sampling.budgetSample(df.repartition(7), "grp", "id", "w", 60L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(again == kept)
  }

  test("packSequences: chunk arithmetic, determinism, intra-bucket order") {
    val df = (1L to 400L).map(i => (i, 100L)).toDF("id", "w")
    val packed = Sampling.packSequences(df, "id", "w", capacity = 250L)
    assert(packed.count() == 400L)
    val rowsOut = packed.collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    // within a bucket, walking rows in hash order gives pack_id =
    // floor(100 * position / 250): positions 0,1 -> pack 0, position 2 ->
    // pack 0 (cum 200 < 250)... recompute exactly per bucket
    rowsOut.groupBy(_._2).foreach { case (_, rs) =>
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val ordered = rs.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
      ordered.zipWithIndex.foreach { case ((_, _, pack), pos) =>
        assert(pack == (100L * pos) / 250L, s"pos=$pos pack=$pack") }
    }
    // deterministic under repartitioning
    val again = Sampling.packSequences(df.repartition(9), "id", "w", 250L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == rowsOut.map(r => (r._1, r._3)).toSet)
  }

  test("mixtureSample and hashSplit are zero-shuffle (no Exchange in plan)") {
    val df = rows(100)
    val mixPlan = Sampling.mixtureSample(df, "s", "id", Map("a" -> 0.5))
      .queryExecution.executedPlan.toString
    val splitPlan = Sampling.hashSplit(df, "id",
      Seq("train" -> 0.9, "test" -> 0.1))
      .queryExecution.executedPlan.toString
    assert(!mixPlan.contains("Exchange"), mixPlan)
    assert(!splitPlan.contains("Exchange"), splitPlan)
  }

  test("hashSplit validates fractions") {
    val df = (1L to 10L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("only" -> 1.0))
    }
  }

  test("tokenBudgetPlan: exact shares, epochs, NULL for zero tokens") {
    val docs = Seq(
      ("t1 t2 t3 t4", "a"), ("t5 t6", "a"), // 6 tokens
      ("x", "b"),                           // 1 token
      ("", "c")                             // 0 tokens
    ).toDF("text", "source")
    // tau = 1: q_a = 6e6, q_b = 1e6, q_c = 0 -> qt = 7e6
    val got = Sampling.tokenBudgetPlan(docs, "text", "source",
        budgetTokens = 70L, tau = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else Double.box(r.getDouble(4)))).toMap
    assert(got("a") == ((2L, 6L, 60L, Double.box(10.0))))
    assert(got("b") == ((1L, 1L, 10L, Double.box(10.0))))
    assert(got("c") == ((1L, 0L, 0L, null)))
    // tau = 0.5 flattens: a's share falls, b's rises
    val flat = Sampling.tokenBudgetPlan(docs, "text", "source",
        budgetTokens = 70L, tau = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(flat("a") == 50L && flat("b") == 20L)
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPlan(docs, "text", "source", budgetTokens = 0L)
    }
    // all-zero-token corpus: Σq = 0 and every share is 0/0 — targets
    // pin to 0 (never a NaN cast), epochs stay NULL
    val empty = Seq(("", "a"), ("  ", "b")).toDF("text", "source")
    val z = Sampling.tokenBudgetPlan(empty, "text", "source",
        budgetTokens = 70L, tau = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.isNullAt(4)))).toMap
    assert(z == Map("a" -> ((0L, true)), "b" -> ((0L, true))))
  }
}
