package graft

import graft.operators.IntervalOps

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Interval merge / coverage (bedtools merge / genomecov-lite): golden
 * fixtures for touching/contained/gapped intervals and a randomized
 * equivalence against a brute-force union-of-points oracle.
 */
class IntervalOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("merge: overlapping, touching, contained, and gapped intervals") {
    val df = Seq(
      ("c1", 1, 5), ("c1", 4, 8),    // overlap -> [1,8]
      ("c1", 8, 10),                  // touches (shared coord 8) -> [1,10]
      ("c1", 12, 20), ("c1", 14, 15), // contained -> [12,20]
      ("c1", 30, 31),
      ("c2", 1, 2)
    ).toDF("contig", "pos_start", "pos_end")
    val merged = IntervalOps
      .mergeIntervals(df, Seq("contig"), "pos_start", "pos_end")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(merged == Set(
      ("c1", 1, 10, 3L), ("c1", 12, 20, 2L), ("c1", 30, 31, 1L),
      ("c2", 1, 2, 1L)))
  }

  test("maxGap bridges nearby intervals; adjacency merges at gap 0") {
    val df = Seq(("c", 1, 5), ("c", 7, 9), ("c", 20, 21))
      .toDF("contig", "pos_start", "pos_end")
    // gap of 1 between [1,5] and [7,9] (coordinate 6 uncovered)
    val g0 = IntervalOps.mergeIntervals(df, Seq("contig"), "pos_start",
      "pos_end").count()
    assert(g0 == 3)
    // adjacency ([1,5] + [6,9]: nothing uncovered) merges at default gap
    val adj = Seq(("c", 1, 5), ("c", 6, 9)).toDF("contig", "pos_start", "pos_end")
    assert(IntervalOps.mergeIntervals(adj, Seq("contig"), "pos_start",
      "pos_end").count() == 1)
    val g1 = IntervalOps.mergeIntervals(df, Seq("contig"), "pos_start",
      "pos_end", maxGap = 1).collect()
      .map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(g1 == Set((1, 9), (20, 21)))
  }

  test("merge near Long.MaxValue: sentinel end does not wrap into a split") {
    val df = Seq(
      ("c", 0L, Long.MaxValue),      // open-ended sentinel
      ("c", 100L, 200L)              // fully contained
    ).toDF("contig", "pos_start", "pos_end")
    val merged = IntervalOps
      .mergeIntervals(df, Seq("contig"), "pos_start", "pos_end")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(merged.toSeq == Seq((0L, Long.MaxValue, 2L)))
  }

  test("randomized: covered bases ≡ brute-force distinct covered points") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map { _ =>
      val s = rnd.nextInt(500)
      (s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(40))
    }
    val df = rows.toDF("contig", "pos_start", "pos_end")
    val got = IntervalOps
      .coverageStats(df, Seq("contig"), "pos_start", "pos_end")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    val exp = rows.groupBy(_._1).map { case (k, rs) =>
      val pts = rs.flatMap(r => r._2 to r._3).toSet
      // region count = number of maximal runs in the covered point set
      val runs = pts.toSeq.sorted.foldLeft((0, Int.MinValue)) {
        case ((n, prev), p) => if (p == prev + 1) (n, p) else (n + 1, p)
      }._1
      k -> ((runs.toLong, pts.size.toLong, rs.size.toLong))
    }
    assert(got == exp)
  }

  test("cluster: transitive overlap shares one id; no iteration, no join") {
    // A[1,5] B[4,8] C[8,10] overlap transitively (A∩C = ∅) -> one
    // cluster; D[20,25] is its own; other key independent numbering
    val df = Seq(
      ("k1", 1, 5), ("k1", 4, 8), ("k1", 8, 10), ("k1", 20, 25),
      ("k2", 1, 2)).toDF("contig", "pos_start", "pos_end")
    val out = IntervalOps
      .clusterIntervals(df, Seq("contig"), "pos_start", "pos_end")
    val got = out.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(got == Map(("k1", 1) -> 1L, ("k1", 4) -> 1L, ("k1", 8) -> 1L,
      ("k1", 20) -> 2L, ("k2", 1) -> 1L))
    // single window pass: no join operator of any kind in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("randomized: cluster ids ≡ merge-run membership") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 300).map { _ =>
      val s = rnd.nextInt(400)
      (s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(30))
    }
    val df = rows.toDF("contig", "pos_start", "pos_end")
    val labeled = IntervalOps
      .clusterIntervals(df, Seq("contig"), "pos_start", "pos_end")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3)))
    // two rows of one key share a cluster iff their intervals fall in
    // the same maximal covered run of that key's point set
    labeled.groupBy(_._1).foreach { case (k, rs) =>
      val pts = rows.filter(_._1 == k).flatMap(r => r._2 to r._3).toSet
      def runStart(p: Int): Int =
        Iterator.iterate(p)(_ - 1).dropWhile(pts.contains).next() + 1
      rs.foreach { case (_, s, _, cid) =>
        rs.foreach { case (_, s2, _, cid2) =>
          assert((runStart(s) == runStart(s2)) == (cid == cid2)) } }
    }
  }

  test("intervalSetJaccard: golden fixture incl. one-side-only keys") {
    val a = Seq(("k1", 1, 10), ("k1", 20, 29), ("ka", 1, 5))
      .toDF("contig", "pos_start", "pos_end")
    val b = Seq(("k1", 6, 24), ("kb", 1, 5))
      .toDF("contig", "pos_start", "pos_end")
    // k1: a covers [1,10]∪[20,29] = 20 bases, b covers [6,24] = 19,
    // intersection [6,10]∪[20,24] = 10, union = 29 -> 10/29
    val got = IntervalOps
      .intervalSetJaccard(a, b, Seq("contig"), "pos_start", "pos_end")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got("k1") == ((10L, 29L, math.rint(10.0 / 29.0 * 1e6) / 1e6)))
    assert(got("ka") == ((0L, 5L, 0.0)))
    assert(got("kb") == ((0L, 5L, 0.0)))
  }

  test("randomized: intervalSetJaccard ≡ per-point brute force") {
    val rnd = new scala.util.Random(23)
    def mk() = (0 until 150).map { _ =>
      val s = rnd.nextInt(300)
      (s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(25))
    }
    val ra = mk(); val rb = mk()
    val got = IntervalOps.intervalSetJaccard(
      ra.toDF("contig", "pos_start", "pos_end"),
      rb.toDF("contig", "pos_start", "pos_end"),
      Seq("contig"), "pos_start", "pos_end")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val keys = (ra.map(_._1) ++ rb.map(_._1)).toSet
    keys.foreach { k =>
      val pa = ra.filter(_._1 == k).flatMap(r => r._2 to r._3).toSet
      val pb = rb.filter(_._1 == k).flatMap(r => r._2 to r._3).toSet
      assert(got(k) == ((pa.intersect(pb).size.toLong,
        pa.union(pb).size.toLong)), s"key $k")
    }
  }

  test("complement: uncovered sub-ranges of each key's extent") {
    val cov = Seq(("k1", 10, 20), ("k1", 40, 50), ("k2", 1, 100))
      .toDF("contig", "pos_start", "pos_end")
    val extents = Seq(("k1", 1, 60), ("k2", 1, 100), ("k3", 5, 9))
      .toDF("contig", "pos_start", "pos_end")
    val got = IntervalOps
      .complementIntervals(cov, extents, Seq("contig"), "pos_start", "pos_end")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(("k1", 1L, 9L), ("k1", 21L, 39L), ("k1", 51L, 60L),
      ("k3", 5L, 9L))) // k2 fully covered; k3 has no coverage at all
  }

  test("depth histogram: golden fixture incl. nesting and exact boundaries") {
    val df = Seq(
      ("c", 1, 10),   // depth 1 over [1,10]
      ("c", 5, 10),   // raises [5,10] to 2
      ("c", 5, 6),    // raises [5,6] to 3
      ("c", 20, 20)   // point at depth 1
    ).toDF("contig", "pos_start", "pos_end")
    val got = IntervalOps
      .depthHistogram(df, Seq("contig"), "pos_start", "pos_end")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // depth 1: [1,4] (4) + [20,20] (1) = 5; depth 2: [7,10] = 4;
    // depth 3: [5,6] = 2
    assert(got == Map(1L -> 5L, 2L -> 4L, 3L -> 2L))
  }

  test("depth histogram with an open-ended sentinel end (no +1 wrap)") {
    val df = Seq(
      ("c", 0L, Long.MaxValue),  // sentinel: covers everything onward
      ("c", 10L, 20L)
    ).toDF("contig", "pos_start", "pos_end")
    val got = IntervalOps
      .depthHistogram(df, Seq("contig"), "pos_start", "pos_end")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // events: +1@0, +1@10, -1@21 -> depth 1 over [0,9] (10 bases),
    // depth 2 over [10,20] (11); the unbounded depth-1 tail after 21 is
    // out of sweep range (dropped, as for any trailing segment)
    assert(got == Map(1L -> 10L, 2L -> 11L))
  }

  test("subtract: inverted and NULL-bounded a rows emit no fragments") {
    val a = Seq(("c", Option(10), Option(5)), ("c", Option(1), None))
      .toDF("contig", "pos_start", "pos_end")
    val bEmpty = Seq.empty[(String, Int, Int)]
      .toDF("contig", "pos_start", "pos_end")
    assert(IntervalOps.subtractIntervals(a, bEmpty, Seq("contig"),
      "pos_start", "pos_end").count() == 0)
    val b = Seq(("c", 3, 20)).toDF("contig", "pos_start", "pos_end")
      .select(col("contig"), col("pos_start").cast("int").as("pos_start"),
        col("pos_end").cast("int").as("pos_end"))
    val a2 = a.select(col("contig"), col("pos_start").cast("int").as("pos_start"),
      col("pos_end").cast("int").as("pos_end"))
    assert(IntervalOps.subtractIntervals(a2, b, Seq("contig"),
      "pos_start", "pos_end").count() == 0)
  }

  test("randomized: depth histogram ≡ per-point brute force") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { _ =>
      val s = rnd.nextInt(400)
      (s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(30))
    }
    val df = rows.toDF("contig", "pos_start", "pos_end")
    val got = IntervalOps
      .depthHistogram(df, Seq("contig"), "pos_start", "pos_end")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exp = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val depth = scala.collection.mutable.Map[Int, Int]()
      rs.foreach(r => (r._2 to r._3).foreach(p =>
        depth(p) = depth.getOrElse(p, 0) + 1))
      depth.groupBy(_._2).map { case (d, pts) =>
        (k, d.toLong) -> pts.size.toLong
      }
    }
    assert(got == exp)
  }

  test("subtract: golden fixture incl. full-cover, poke-out, no-overlap") {
    val a = Seq(
      ("c", 10, 30),  // b covers [12,15],[20,40] -> frags [10,11],[16,19]
      ("c", 50, 60),  // no b overlap -> whole [50,60]
      ("c", 70, 75),  // fully covered -> no fragments
      ("d", 1, 5)     // different key, b has none -> whole
    ).toDF("contig", "pos_start", "pos_end")
    val b = Seq(
      ("c", 12, 15), ("c", 20, 40), ("c", 65, 80)
    ).toDF("contig", "pos_start", "pos_end")
    val got = IntervalOps
      .subtractIntervals(a, b, Seq("contig"), "pos_start", "pos_end")
      .select("contig", "pos_start", "frag_start", "frag_end")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      ("c", 10, 10L, 11L), ("c", 10, 16L, 19L),
      ("c", 50, 50L, 60L), ("d", 1, 1L, 5L)))
  }

  test("subtract plans through the custom interval join") {
    val a = Seq(("c", 1, 10)).toDF("contig", "pos_start", "pos_end")
    val b = Seq(("c", 3, 5)).toDF("contig", "pos_start", "pos_end")
    val df = IntervalOps.subtractIntervals(a, b, Seq("contig"),
      "pos_start", "pos_end")
    assert(df.queryExecution.executedPlan.toString
      .contains("IntervalJoinExec"), df.queryExecution.executedPlan.toString)
    assert(df.select("frag_start", "frag_end").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (6L, 10L)))
  }

  test("subtract at the Long domain extremes: no ±1 wrap") {
    val a = Seq(("c", Long.MinValue, Long.MaxValue))
      .toDF("contig", "pos_start", "pos_end")
    val b = Seq(("c", Long.MinValue, -10L), ("c", 10L, Long.MaxValue))
      .toDF("contig", "pos_start", "pos_end")
    val got = IntervalOps
      .subtractIntervals(a, b, Seq("contig"), "pos_start", "pos_end")
      .select("frag_start", "frag_end").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((-9L, 9L)))
    // b fully covering the whole domain -> zero fragments
    val b2 = Seq(("c", Long.MinValue, Long.MaxValue))
      .toDF("contig", "pos_start", "pos_end")
    assert(IntervalOps.subtractIntervals(a, b2, Seq("contig"),
      "pos_start", "pos_end").count() == 0)
  }

  test("randomized: subtract ≡ per-point brute force") {
    val rnd = new scala.util.Random(17)
    def mk(n: Int) = (0 until n).map { _ =>
      val s = rnd.nextInt(300)
      (s"k${rnd.nextInt(2)}", s, s + rnd.nextInt(25))
    }
    val aRows = mk(120)
    val bRows = mk(80)
    val a = aRows.toDF("contig", "pos_start", "pos_end")
    val b = bRows.toDF("contig", "pos_start", "pos_end")
    val got = IntervalOps
      .subtractIntervals(a, b, Seq("contig"), "pos_start", "pos_end")
      .groupBy("contig")
      .agg(count(lit(1)).as("n"),
        sum(col("frag_end") - col("frag_start") + 1).as("bases"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val exp = aRows.groupBy(_._1).flatMap { case (k, as) =>
      val bPts = bRows.filter(_._1 == k)
        .flatMap(r => r._2 to r._3).toSet
      // fragments across all a rows of this key (per-row runs)
      val frags = as.flatMap { ar =>
        val pts = (ar._2 to ar._3).filterNot(bPts)
        // count maximal runs + total points
        pts.foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
          acc match {
            case (s, e) :: tail if p == e + 1 => (s, p) :: tail
            case _ => (p, p) :: acc
          }
        }
      }
      if (frags.isEmpty) None
      else Some(k -> ((frags.size.toLong,
        frags.map(f => f._2 - f._1 + 1L).sum)))
    }
    assert(got == exp)
  }

  test("reciprocal-overlap-fraction residual compiles into the indexed join") {
    val a = Seq(("c", 100, 199), ("c", 300, 309))
      .toDF("contig", "pos_start", "pos_end")
      .select($"contig".as("ac"), $"pos_start".as("a_s"), $"pos_end".as("a_e"))
    val b = Seq(("c", 150, 249), ("c", 300, 400))
      .toDF("contig", "pos_start", "pos_end")
      .select($"contig".as("bc"), $"pos_start".as("b_s"), $"pos_end".as("b_e"))
    val frac = (least($"a_e", $"b_e") - greatest($"a_s", $"b_s") + 1) * 2
    val df = a.join(b, $"ac" === $"bc" &&
      $"a_s" <= $"b_e" && $"a_e" >= $"b_s" &&
      frac >= ($"a_e" - $"a_s" + 1) && frac >= ($"b_e" - $"b_s" + 1))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoinExec"), plan)
    // [100,199]x[150,249]: overlap 50, halves of both (100 long) -> in
    // [300,309]x[300,400]: overlap 10 >= half of a (10) but < half of b (101/2)
    assert(df.count() == 1)
  }
}
