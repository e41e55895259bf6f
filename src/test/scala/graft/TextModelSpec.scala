package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextStats}

/** Corpus-LM scoring operators (DSIR importance, interpolated-bigram
  * perplexity filter) and quality-ranked canonical dedup. */
class TextModelSpec extends SparkTestBase {

  import spark.implicits._

  test("importanceWeights: target-vocab docs score higher, values exact") {
    // target slice (src t) speaks "alpha beta"; background adds "gamma"
    val docs = Seq(
      (1L, "alpha beta", "t"),
      (2L, "alpha beta", "t"),
      (3L, "gamma gamma", "b"),
      (4L, "alpha gamma", "b")
    ).toDF("doc_id", "text", "source")
    val got = TextStats
      .importanceWeights(docs, "doc_id", "text", col("source") === "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // corpus: alpha c_all=3 c_t=2, beta c_all=2 c_t=2, gamma c_all=3 c_t=0
    // T_all=8, T_t=4, V=3
    def r(cT: Long, cAll: Long): Double =
      math.log((cT + 1).toDouble / (4 + 3)) - math.log((cAll + 1).toDouble / (8 + 3))
    def round6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == round6((r(2, 3) + r(2, 2)) / 2))
    assert(got(3L) == round6(r(0, 3)))
    assert(got(4L) == round6((r(2, 3) + r(0, 3)) / 2))
    // target-looking docs above background-looking ones
    assert(got(1L) > got(4L) && got(4L) > got(3L))
  }

  test("importanceTopK: cut on rounded score, rank 1..k, doc_id tie-break") {
    val docs = Seq(
      (10L, "alpha beta", "t"), (2L, "alpha beta", "t"),
      (3L, "gamma gamma", "b"), (4L, "alpha gamma", "b")
    ).toDF("doc_id", "text", "source")
    val rows = TextStats
      .importanceTopK(docs, "doc_id", "text", col("source") === "t", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.length == 3)
    // docs 2 and 10 tie exactly (identical text) — lower id ranks first
    assert(rows.toSeq == Seq((2L, 1L), (10L, 2L), (4L, 3L)))
    intercept[IllegalArgumentException] {
      TextStats.importanceTopK(docs, "doc_id", "text", lit(true), k = 0)
    }
  }

  test("bigramLogProb: exact interpolated value; short docs absent") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "c"), // single token: no bigram positions -> absent
      (4L, "")   // no tokens -> absent
    ).toDF("doc_id", "text")
    val got = TextStats.bigramLogProb(docs, "doc_id", "text", lambda = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got.contains(3L) && !got.contains(4L))
    // unigrams: a=3, b=3, c=1, T=7; bigrams: (a,b)=3, (b,a)=1
    val pAB = 0.5 * (3.0 / 3.0) + 0.5 * (3.0 / 7.0) // p(b|a), p(b)
    val pBA = 0.5 * (1.0 / 3.0) + 0.5 * (3.0 / 7.0) // p(a|b), p(a)
    def round6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) ==
      round6((math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3))
    assert(got(2L) == round6(math.log(pAB)))
    // repetitive doc 1 scores higher (more-probable bigrams on average)
    // than ... both docs share the mix here; check boundary validation
    intercept[IllegalArgumentException] {
      TextStats.bigramLogProb(docs, "doc_id", "text", lambda = 1.5)
    }
  }

  test("keepBest: per-group argmax by ranking, id tie-break, passthrough") {
    val docs = Seq(
      (1L, "x", 0.2), (2L, "x", 0.9), (3L, "x", 0.9), // group {1,2,3}
      (4L, "y", 0.5),                                 // untouched
      (5L, "z", 0.1), (6L, "z", 0.1)                  // group {5,6}
    ).toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    val kept = Dedup.keepBest(docs, "doc_id", pairs, Seq(col("quality").desc))
      .select("doc_id").as[Long].collect().toSet
    // group 1: quality 0.9 tie between 2 and 3 -> lower id 2
    // group 2: tie between 5 and 6 -> 5; doc 4 passes through
    assert(kept == Set(2L, 4L, 5L))
    // schema preserved (all original columns, no helper columns)
    val cols = Dedup.keepBest(docs, "doc_id", pairs, Seq(col("quality").desc))
      .columns.toSeq
    assert(cols == Seq("doc_id", "text", "quality"))
    intercept[IllegalArgumentException] {
      Dedup.keepBest(docs, "doc_id", pairs, Seq.empty)
    }
  }

  test("keepBest survives caller columns named id / group_id") {
    // drop-by-name removes every match: before the graft_cc_ prefixes,
    // a corpus carrying its own 'id' or 'group_id' lost that column
    val docs = Seq(
      (1L, 10L, "g_a", 0.2), (2L, 20L, "g_b", 0.9),
      (3L, 30L, "g_c", 0.5)
    ).toDF("doc_id", "id", "group_id", "quality")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val kept = Dedup.keepBest(docs, "doc_id", pairs, Seq(col("quality").desc))
    assert(kept.columns.toSeq == Seq("doc_id", "id", "group_id", "quality"))
    val rows = kept.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq((2L, 20L, "g_b"), (3L, 30L, "g_c")))
  }

  test("temperatureMixture keeps NULL strata as their own group") {
    val docs = (0 until 200).map(i => (i.toLong, "head")) ++
      (200 until 300).map(i => (i.toLong, null: String))
    val df = docs.toDF("doc_id", "source")
    // tau = 0: equal mass per group — the NULL stratum must survive the
    // rates join (null-safe <=>), not vanish at the last step
    val kept = Sampling.temperatureMixture(df, "source", "doc_id",
        tau = 0.0, targetFraction = 0.9)
      .groupBy("source").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(kept.contains(None), "NULL stratum dropped by the rates join")
    assert(kept(None) > 0L)
  }

  test("shingleNovelty: singleton-shingle fraction per doc") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles {a b c, b c d}; "a b c" shared with 2
      (2L, "a b c x"),   // shingles {a b c, b c x}
      (3L, "q r s t u")  // all singletons
    ).toDF("doc_id", "text")
    val got = TextStats.shingleNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.5, 2L -> 0.5, 3L -> 1.0))
    // short doc: a single whole-text shingle, unique -> 1.0
    val short = Seq((1L, "xy zz"), (2L, "other words")).toDF("doc_id", "text")
    val g2 = TextStats.shingleNovelty(short, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(g2 == Map(1L -> 1.0, 2L -> 1.0))
  }

  test("sourceLeakage: unordered source-pair duplicate counts") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta", "web"),
      (2L, "alpha bravo charlie delta", "mirror"), // dup across sources
      (3L, "alpha bravo charlie delta", "web"),    // dup within web
      (4L, "totally different words here", "books")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceLeakage(docs, "doc_id", "text", "source",
        threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // pairs: (1,2) web-mirror, (1,3) web-web, (2,3) mirror-web
    assert(got == Map(("mirror", "web") -> 2L, ("web", "web") -> 1L))
  }

  test("vocabCoverage: smallest head reaching each token-mass fraction") {
    // a x5, b x3, c x2 -> total 10
    val docs = Seq((1L, "a a a b b c"), (2L, "a a b c")).toDF("doc_id", "text")
    val got = TextStats.vocabCoverage(docs, "doc_id", "text",
        thresholds = Seq(0.5, 0.8, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == Map(0.5 -> 1L, 0.8 -> 2L, 0.9 -> 3L, 1.0 -> 3L))
  }

  test("containmentDupPairs: subset docs found, direction correct") {
    val big = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, "charlie delta echo foxtrot golf"), // contiguous run of big
      (2L, big),
      (3L, big), // exact copy: contained both ways
      (4L, "zulu yankee xray whiskey victor uniform tango sierra")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = got.map(t => (t._1, t._2)).toSet
    // doc 1's shingles are a strict subset of 2 and 3 (containment 1.0,
    // one direction only); 2 and 3 contain each other; 4 is untouched
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 2L)))
    assert(got.forall(_._3 == 1.0))
    // the reverse (big contained in fragment) must NOT appear
    assert(!pairs.contains((2L, 1L)))
  }

  test("containmentDupPairs: partial containment thresholded exactly") {
    // 10-word doc: 8 shingles; fragment shares a 7-word run = 5 shingles
    // of its own 5 -> fragment->big containment 1.0; big->fragment 5/8
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val at06 = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(at06 == Set((1L, 2L, 1.0), (2L, 1L, 0.625)))
    val at07 = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at07 == Set((1L, 2L)))
    intercept[IllegalArgumentException] {
      Dedup.containmentDupPairs(docs, "doc_id", "text", 0.0)
    }
  }

  test("containmentDupPairs: maxShingleDf drops boilerplate index keys") {
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    // cutoff 0 empties the index entirely -> no candidates, no pairs
    val none = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.9,
      maxShingleDf = 0L)
    assert(none.count() == 0)
  }

  test("containmentDupPairs: hot-key cut is recall-invisible here") {
    // the straggler-guard default (16384) only drops shingles carried
    // by 16 k+ docs; this pins the recall argument at test scale by
    // cutting at df > 50 in a 120-doc corpus where EVERY doc shares a
    // boilerplate trailer (df = 120, the hot key the cap exists for):
    // every true pair differs by < probeK shingles, so recall rides
    // the pair's own non-hot probe keys and the cut changes nothing
    val base = spark.range(0, 60).select(col("id").as("doc_id"),
      concat(lit("document number "), col("id").cast("string"),
        lit(" talks about topic "), (col("id") % 7).cast("string"),
        lit(" at length with shared boilerplate trailer text appended " +
          "to every single document in this corpus")).as("text"))
    val copies = base.where(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val docs = base.union(copies)
    def pairs(df: Long) = Dedup
      .containmentDupPairs(docs, "doc_id", "text", 0.9, maxShingleDf = df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cut = pairs(50L) // trailer shingles (df 120) dropped from index
    val unbounded = pairs(1L << 40)
    assert(cut == unbounded && cut.nonEmpty,
      s"cut=${cut.size} unbounded=${unbounded.size}")
  }

  test("containment broadcast gate conf switches path, not results") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "a completely different unrelated document about engines")
    ).toDF("doc_id", "text")
    def run() = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.9)
    // path signature: the over-gate branch dedups CANDIDATES (id_a,
    // id_b) before the verify joins; the broadcast branch dedups the
    // verified survivors after (id_contained, id_container). AQE may
    // still broadcast the tiny test joins, so the aggregate's position
    // is the branch probe, not the join strategy.
    def dedupsCandidatesFirst(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
        .contains("Aggregate [id_a#")
    val viaBroadcast = run() // tiny frame, under the default gate
    assert(!dedupsCandidatesFirst(viaBroadcast))
    val expected = viaBroadcast.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.conf.set(Dedup.ContainmentBroadcastMaxBytesConf, "0")
    try {
      val viaCount = run() // gate 0 forces the candidates-dedup-first shape
      assert(dedupsCandidatesFirst(viaCount))
      // the over-gate path verifies by COUNTING inverted-index rows —
      // the shingle arrays must never appear downstream of the
      // candidate join (the retired array-shipping fallback died of
      // exactly that at scale)
      assert(!viaCount.queryExecution.optimizedPlan.toString.contains("sh_a"))
      val got = viaCount.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected && got.nonEmpty, s"got $got")
      // bounded-scratch mode: a 1-byte scratch budget forces the
      // candidate batching (k > 1, eager per-batch materialization) —
      // the union of batch survivors must still be the exact result
      spark.conf.set(Dedup.ContainmentScratchBytesConf, "1")
      try {
        val batched = run().collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(batched == expected, s"batched got $batched")
      } finally spark.conf.unset(Dedup.ContainmentScratchBytesConf)
      // third tier: the index-broadcast gate at 0 forces the fully
      // SHUFFLED verify (the 100-TB regime where even the 16-byte
      // index rows are too big to ship) — same results again
      spark.conf.set(Dedup.ContainmentIndexBroadcastMaxBytesConf, "0")
      try {
        val shuffled = run()
        assert(dedupsCandidatesFirst(shuffled))
        val got3 = shuffled.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got3 == expected, s"shuffled-tier got $got3")
      } finally spark.conf.unset(Dedup.ContainmentIndexBroadcastMaxBytesConf)
    } finally spark.conf.unset(Dedup.ContainmentBroadcastMaxBytesConf)
  }

  test("containmentDupPairs: candidate cap semantics (r18)") {
    // family of 6 mutually-containing docs (suffix-perturbed copies of
    // one base — the GenScale shape the curation cap defers) plus one
    // genuine subset doc and one unrelated doc
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((0 until 6).map(i => (i.toLong, s"$base v$i")) ++
      Seq((100L, "alpha beta gamma delta epsilon"),
        (200L, "totally unrelated words about engines and turbines")))
      .toDF("doc_id", "text")
    def run() = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run()
    // a roomy cap is exact: every doc has < 8 candidates here
    spark.conf.set(Dedup.ContainmentMaxCandidatesConf, "64")
    val roomy = try run()
      finally spark.conf.unset(Dedup.ContainmentMaxCandidatesConf)
    assert(roomy == uncapped && uncapped.nonEmpty)
    // cap 1: each contained doc keeps exactly its ONE strongest
    // candidate (ties by lowest container id), so every doc that HAD a
    // container still has one — the loser DECISION (is this doc
    // contained in anything?) is preserved while the pair volume drops
    // to one per doc
    spark.conf.set(Dedup.ContainmentMaxCandidatesConf, "1")
    val capped1 = try run()
      finally spark.conf.unset(Dedup.ContainmentMaxCandidatesConf)
    val containedUncapped = uncapped.map(_._1)
    val containedCapped = capped1.map(_._1)
    assert(containedCapped == containedUncapped,
      s"capped contained set $containedCapped vs $containedUncapped")
    assert(capped1.groupBy(_._1).forall(_._2.size == 1))
    assert(capped1.subsetOf(uncapped))
    // deterministic tie-break: family members share all probe hashes,
    // so each keeps its lowest-id other member (0 keeps 1, others keep 0)
    val famKept = capped1.filter(p => p._1 < 6 && p._2 < 6)
    assert(famKept == Set((0L, 1L), (1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 0L), (5L, 0L)), s"famKept $famKept")
    // cap applies identically on the over-gate tier
    spark.conf.set(Dedup.ContainmentBroadcastMaxBytesConf, "0")
    spark.conf.set(Dedup.ContainmentMaxCandidatesConf, "1")
    val overGate = try run() finally {
      spark.conf.unset(Dedup.ContainmentBroadcastMaxBytesConf)
      spark.conf.unset(Dedup.ContainmentMaxCandidatesConf)
    }
    assert(overGate == capped1, s"over-gate capped $overGate vs $capped1")
    // heap-budget flush identity (r18: for N >= 2 the cap's top-N runs
    // as a per-partition budgeted heap prune before the rank window —
    // the fix for the sf10 window-sort ENOSPC). Cap 2 keeps the heap
    // path engaged (cap 1 routes to the declarative argmin aggregate);
    // a 1-entry budget flushes after every row, so every heap state is
    // exercised; flushed supersets must re-cut to the identical result
    spark.conf.set(Dedup.ContainmentMaxCandidatesConf, "2")
    val capped2 = try run()
      finally spark.conf.unset(Dedup.ContainmentMaxCandidatesConf)
    assert(capped2.subsetOf(uncapped) && capped2.map(_._1) == containedUncapped)
    spark.conf.set(Dedup.ContainmentMaxCandidatesConf, "2")
    spark.conf.set(Dedup.ContainmentCapHeapBudgetConf, "1")
    val flushed = try run() finally {
      spark.conf.unset(Dedup.ContainmentMaxCandidatesConf)
      spark.conf.unset(Dedup.ContainmentCapHeapBudgetConf)
    }
    assert(flushed == capped2, s"budget-flushed capped $flushed vs $capped2")
    // cap-1 declarative path under a tiny budget conf too: the budget
    // must be a no-op there (no heap in that plan), same results
    spark.conf.set(Dedup.ContainmentMaxCandidatesConf, "1")
    spark.conf.set(Dedup.ContainmentCapHeapBudgetConf, "1")
    val flushed1 = try run() finally {
      spark.conf.unset(Dedup.ContainmentMaxCandidatesConf)
      spark.conf.unset(Dedup.ContainmentCapHeapBudgetConf)
    }
    assert(flushed1 == capped1, s"cap-1 under tiny budget $flushed1 vs $capped1")
  }

  test("containmentDupPairs: randomized ≡ brute force (seeded)") {
    // corpus where every qualifying pair sits inside the recall
    // guarantee: contained docs are contiguous slices (diff = 0);
    // distractors are random word soup (qualifying cross-pairs are
    // astronomically unlikely at tau = 0.9, and the fixed seed makes
    // the test deterministic forever either way)
    val rnd = new scala.util.Random(4242)
    val vocab = (0 until 30).map(i => s"w$i")
    def soup(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0 until 30).map(i => (i.toLong, soup(20 + rnd.nextInt(20))))
    val slices = (0 until 15).map { i =>
      val (bid, btxt) = bases(rnd.nextInt(bases.size))
      val ws = btxt.split(" ")
      val start = rnd.nextInt(ws.length / 2)
      val len = 5 + rnd.nextInt(ws.length - start - 5)
      (1000L + i, ws.slice(start, start + len).mkString(" "))
    }
    val all = bases ++ slices
    val docs = all.toDF("doc_id", "text")
    def shingles(t: String): Set[String] = {
      val ws = t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
      else Set(ws.mkString(" "))
    }
    val brute = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia != ib
      sa = shingles(ta); sb = shingles(tb)
      c = sa.intersect(sb).size.toDouble / sa.size
      cr = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cr >= 0.9
    } yield (ia, ib, cr)).toSet
    // guarantee precondition: every qualifying pair differs by < probeK
    assert(brute.forall { case (ia, ib, _) =>
      val sa = shingles(all.find(_._1 == ia).get._2)
      val sb = shingles(all.find(_._1 == ib).get._2)
      (sa -- sb).size < 8
    })
    val got = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"got ${got.size} pairs, brute ${brute.size}")
    assert(brute.nonEmpty) // the fixture actually exercises the path
  }

  test("removeContained: strict losers drop, mutual classes keep low id") {
    val big = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, "charlie delta echo foxtrot golf"), // strictly inside 2/3
      (2L, big),
      (3L, big), // mutual with 2 -> 2 survives
      (4L, "zulu yankee xray whiskey victor uniform tango sierra")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.9)
    val kept = Dedup.removeContained(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("removeContained: one-directional chain keeps the maximal doc") {
    val docs = Seq(
      (1L, "c d e f g"),
      (2L, "b c d e f g h"),
      (3L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    // full-containment chain 1 < 2 < 3, one direction only
    val pairs = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.99)
    val dirs = pairs.select("id_contained", "id_container")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dirs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val kept = Dedup.removeContained(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("nearDedupAgainstSeen: fuzzy screen vs the store, batch-local dups kept") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val seen = Seq((100L, base)).toDF("sid", "stext")
    val batch = Seq(
      (1L, base),                                  // exact vs seen -> drop
      (2L, base + " extra trailing words"),        // near vs seen -> drop at 0.7
      (3L, "completely unrelated content about spark catalyst planning"),
      (4L, "completely unrelated content about spark catalyst planning")
    ).toDF("doc_id", "text") // 3/4 duplicate EACH OTHER but no seen doc
    val kept = Dedup.nearDedupAgainstSeen(batch, "doc_id", "text",
        seen, "sid", "stext", threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    // a stricter threshold keeps the near-but-not-exact doc
    val strict = Dedup.nearDedupAgainstSeen(batch, "doc_id", "text",
        seen, "sid", "stext", threshold = 0.99)
      .select("doc_id").as[Long].collect().toSet
    assert(strict == Set(2L, 3L, 4L))
  }

  test("importanceWeights: randomized ≡ brute force (seeded)") {
    val rnd = new scala.util.Random(9182)
    val vocab = (0 until 25).map(i => s"t$i")
    val all = (0 until 60).map { i =>
      val n = 5 + rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        if (rnd.nextBoolean()) "t" else "b")
    }
    val docs = all.toDF("doc_id", "text", "source")
    val got = TextStats
      .importanceWeights(docs, "doc_id", "text", col("source") === "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // brute force with the same add-one smoothing
    val toks = all.flatMap { case (id, t, s) =>
      t.split(" ").map(w => (id, w, s == "t")) }
    val cAll = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cT = toks.filter(_._3).groupBy(_._2).view.mapValues(_.size.toLong)
      .toMap.withDefaultValue(0L)
    val (tAll, tT, v) =
      (toks.size.toDouble, toks.count(_._3).toDouble, cAll.size.toDouble)
    def round6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val brute = toks.groupBy(_._1).map { case (id, ts) =>
      id -> round6(ts.map { case (_, w, _) =>
        math.log((cT(w) + 1) / (tT + v)) - math.log((cAll(w) + 1) / (tAll + v))
      }.sum / ts.size)
    }
    assert(got.keySet == brute.keySet)
    // avg-of-logs summation order differs; agree to within 1 ulp of 6dp
    assert(got.forall { case (id, s) => (s - brute(id)).abs <= 1e-6 })
  }

  test("bigramLogProb: randomized ≡ brute force (seeded)") {
    val rnd = new scala.util.Random(5151)
    val vocab = (0 until 12).map(i => s"w$i")
    val all = (0 until 50).map { i =>
      val n = 2 + rnd.nextInt(25)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = all.toDF("doc_id", "text")
    val got = TextStats.bigramLogProb(docs, "doc_id", "text", lambda = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val toks = all.flatMap(_._2.split(" "))
    val uc = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = toks.size.toDouble
    val bis = all.flatMap { case (_, txt) =>
      val ws = txt.split(" "); ws.zip(ws.tail) }
    val bc = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def round6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val brute = all.flatMap { case (id, txt) =>
      val ws = txt.split(" ")
      val ps = ws.zip(ws.tail).map { case (w1, w2) =>
        math.log(0.5 * (bc((w1, w2)).toDouble / uc(w1)) +
          0.5 * (uc(w2).toDouble / t)) }
      if (ps.isEmpty) None else Some(id -> round6(ps.sum / ps.size))
    }.toMap
    assert(got.keySet == brute.keySet)
    assert(got.forall { case (id, s) => (s - brute(id)).abs <= 1e-6 })
  }

  test("NULL text: LM scorers drop the doc, containment ignores it") {
    val docs = Seq((1L, "a b c d e", "t"), (2L, null, "t"),
      (3L, "a b c d e", "b")).toDF("doc_id", "text", "source")
    val imp = TextStats.importanceWeights(docs, "doc_id", "text",
      col("source") === "t").select("doc_id").as[Long].collect().toSet
    assert(imp == Set(1L, 3L)) // NULL text has no tokens -> absent
    val lm = TextStats.bigramLogProb(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(lm == Set(1L, 3L))
    val pairs = Dedup.containmentDupPairs(docs, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (3L, 1L))) // NULL doc in no pair
  }

  test("curationReport: first-failing-stage reasons, stage scoping") {
    import graft.operators.Curation
    val prose = "the quick brown fox jumps over the lazy dog and it " +
      "was seen by the river bank at dawn with a friend of the miller"
    val docs = Seq(
      (1L, prose),                       // keeper
      (2L, prose),                       // exact dup of 1 -> near_dup
      (3L, "der hund und die katze sind nicht mit der maus im haus " +
        "und das ist ein gutes zeichen fuer die stadt"), // -> lang (de)
      (4L, "zzz qqq xxx www"),           // no stopwords -> lang 'und'
      (5L, prose + " extra trailing marker tokens"), // jaccard < .95 vs 1
                                         // -> survives near, contained
      (6L, prose)                        // another exact dup -> near_dup
    ).toDF("doc_id", "text")
    val rep = Curation.curationReport(docs, "doc_id", "text",
        langs = Seq("en"), minQuality = 0.2,
        nearThreshold = 0.95, containThreshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) "KEEP" else r.getString(1))).toMap
    assert(rep(2L) == "near_dup" && rep(6L) == "near_dup")
    assert(rep(3L) == "lang" && rep(4L) == "lang")
    // doc 1 is STRICTLY contained in doc 5 (all of prose's shingles
    // appear in the extended doc, not vice versa) — the containment
    // stage keeps the superset: the doc with MORE content survives
    assert(rep(1L) == "contained")
    assert(rep(5L) == "KEEP")
    // curate() returns exactly the keepers with original columns
    val kept = Curation.curate(docs, "doc_id", "text",
        langs = Seq("en"), minQuality = 0.2,
        nearThreshold = 0.95, containThreshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L))
  }

  test("curationReport: lshMaxBucketSize guards the near-dup stage") {
    import graft.operators.Curation
    val prose = "the quick brown fox jumps over the lazy dog and it " +
      "was seen by the river bank at dawn with a friend of the miller"
    // a 30-member exact-dup family (one oversized LSH bucket per band)
    // plus one small dup pair of a DIFFERENT text
    val family = spark.range(0, 30)
      .select(col("id").as("doc_id"), lit(prose).as("text"))
    val other = "an entirely different english sentence that the lazy " +
      "dog did not expect to see printed twice in this test corpus"
    val docs = family.union(
      Seq((100L, other), (101L, other)).toDF("doc_id", "text"))
    // cap below the family: the near-dup stage's LSH skips the
    // oversized bucket, but BYTE-EQUAL members still collapse at
    // stage 3 via the corpus-linear exact-dup star edges
    // (Dedup.exactDupStars rides along with the LSH pairs in every
    // curationReport run — r16: without it the capped report paid the
    // saved LSH quadratic back as containment work on the
    // uncollapsed families). The guard's skip itself is pinned by
    // OperatorsSpec's capped lshCandidatePairs count; here the pin is
    // that the cap's recall cost falls only on NON-exact near-dups.
    val capped = Curation.curationReport(docs, "doc_id", "text",
        langs = Seq("en"), minQuality = 0.2,
        nearThreshold = 0.95, containThreshold = 0.9,
        lshMaxBucketSize = 8)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) "KEEP" else r.getString(1))).toMap
    assert(capped(0L) == "KEEP" &&
      (1L until 30L).forall(capped(_) == "near_dup"), s"got $capped")
    assert(capped(100L) == "KEEP" && capped(101L) == "near_dup")
    // default (unbounded): the family collapses to its min id
    val full = Curation.curationReport(docs, "doc_id", "text",
        langs = Seq("en"), minQuality = 0.2,
        nearThreshold = 0.95, containThreshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) "KEEP" else r.getString(1))).toMap
    assert(full(0L) == "KEEP" &&
      (1L until 30L).forall(full(_) == "near_dup"), s"got $full")
  }

  test("curationReport: eval-set stage tags contaminated LAST") {
    import graft.operators.Curation
    val prose = "the quick brown fox jumps over the lazy dog and it " +
      "was seen by the river bank at dawn with a friend of the miller"
    val other = "a completely different story about the spark planner " +
      "and the catalyst optimizer that is of interest to the engine"
    val docs = Seq(
      (1L, prose), (2L, prose), // 2 = near_dup of 1
      (3L, other)               // survives internal stages
    ).toDF("doc_id", "text")
    val eval_ = Seq((900L, other + " v2")).toDF("eval_id", "eval_text")
    val rep = Curation.curationReport(docs, "doc_id", "text",
        langs = Seq("en"), minQuality = 0.2,
        nearThreshold = 0.9, containThreshold = 0.99,
        evalDocs = Some(eval_), evalIdCol = "eval_id",
        evalTextCol = "eval_text", decontaminationThreshold = 0.8)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) "KEEP" else r.getString(1))).toMap
    assert(rep(1L) == "KEEP")
    // 2 matches the eval doc too (same prose family? no — 2 is prose);
    // 2 is dropped as near_dup BEFORE decontamination is consulted
    assert(rep(2L) == "near_dup")
    assert(rep(3L) == "contaminated")
    // without the eval set, doc 3 keeps
    val rep2 = Curation.curationReport(docs, "doc_id", "text",
        langs = Seq("en"), minQuality = 0.2,
        nearThreshold = 0.9, containThreshold = 0.99)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) "KEEP" else r.getString(1))).toMap
    assert(rep2(3L) == "KEEP")
  }

  test("termDriftPsi: zero for identical corpora, positive under drift") {
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val same = TextStats.termDriftPsi(docs, docs, "text", buckets = 8)
      .collect()
    assert(same.forall(_.getDouble(3) == 0.0)) // identical -> psi 0
    val shifted = Seq((1L, "alpha beta gamma delta"),
      (2L, "omega omega omega omega omega omega")).toDF("doc_id", "text")
    val drift = TextStats.termDriftPsi(docs, shifted, "text", buckets = 8)
      .collect().map(_.getDouble(3)).sum
    assert(drift > 0.1, s"expected clear drift, got $drift")
    intercept[IllegalArgumentException] {
      TextStats.termDriftPsi(docs, docs, "text", buckets = 0)
    }
  }

  test("scoreDriftPsi: fixed bins clamp edges, drift detected") {
    val a = Seq(0.1, 0.2, 0.3, 0.4, 0.5).toDF("score")
    val same = TextStats.scoreDriftPsi(a, a, "score", bins = 5)
      .collect()
    assert(same.forall(_.getDouble(3) == 0.0))
    // out-of-range values clamp to the edge bins instead of vanishing
    val edges = Seq(-5.0, 5.0).toDF("score")
    val bins = TextStats.scoreDriftPsi(edges, edges, "score", bins = 5)
      .collect().map(_.getLong(0)).sorted
    assert(bins.toSeq == Seq(0L, 4L))
    val shifted = Seq(0.9, 0.92, 0.94, 0.96, 0.98).toDF("score")
    val drift = TextStats.scoreDriftPsi(a, shifted, "score", bins = 5)
      .collect().map(_.getDouble(3)).sum
    assert(drift > 0.5, s"expected strong drift, got $drift")
    intercept[IllegalArgumentException] {
      TextStats.scoreDriftPsi(a, a, "score", bins = 5, lo = 1.0, hi = 0.0)
    }
  }

  test("diverseTopK: round-robin across cells, best-first inside each") {
    import graft.operators.Similarity
    // 2 orthogonal centroids; 3 points near each with distinct scores
    val cents = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f))
    ).toDF("cid", "cvec")
    val pts = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.8f, 0.2f)),
      (12L, Array(0.7f, 0.3f)),
      (20L, Array(0.1f, 0.9f)), (21L, Array(0.2f, 0.8f)),
      (22L, Array(0.3f, 0.7f))
    ).toDF("id", "vec")
    val scores = Seq((10L, 5L), (11L, 9L), (12L, 1L),
      (20L, 4L), (21L, 2L), (22L, 8L)).toDF("sid", "s")
    val got = Similarity.diverseTopK(pts, "id", "vec",
        cents, "cid", "cvec", scores, "sid", "s", k = 4)
      .orderBy("pick_order")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // picks 1-2: each cluster's best (11 from cell 0, 22 from cell 1);
    // picks 3-4: each cluster's second (10, then 20)
    assert(got.toSeq == Seq((11L, 1L), (22L, 2L), (10L, 3L), (20L, 4L)))
    // k = cluster count -> one pick per cluster, never two from one
    val spread = Similarity.diverseTopK(pts, "id", "vec",
        cents, "cid", "cvec", scores, "sid", "s", k = 2)
      .select("cluster_id").as[Long].collect().toSeq
    assert(spread.sorted == Seq(0L, 1L))
    intercept[IllegalArgumentException] {
      Similarity.diverseTopK(pts, "id", "vec", cents, "cid", "cvec",
        scores, "sid", "s", k = 0)
    }
  }

  test("temperatureMixture: tau flattens head/tail, deterministic") {
    val docs = (0 until 900).map(i => (i.toLong, "head")) ++
      (900 until 1000).map(i => (i.toLong, "tail")) // 9:1 imbalance
    val df = docs.toDF("doc_id", "source")
    def kept(tau: Double): Map[String, Long] =
      Sampling.temperatureMixture(df, "source", "doc_id", tau,
          targetFraction = 0.5)
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tau = 1: natural proportions — each group keeps ~50%
    val t1 = kept(1.0)
    assert(math.abs(t1("head") - 450) < 60 && math.abs(t1("tail") - 50) < 25)
    // tau = 0: equal mass per group — tail keeps (capped) everything,
    // head keeps ~ the same absolute COUNT as tail's full size
    val t0 = kept(0.0)
    assert(t0("tail") == 100L) // rate capped at 1.0
    assert(t0("head") < 280L)  // flattened well below its natural 450
    // deterministic: identical selection on a rerun
    val a = Sampling.temperatureMixture(df, "source", "doc_id", 0.5, 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureMixture(df, "source", "doc_id", 0.5, 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "source", "doc_id", 1.5, 0.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "source", "doc_id", 0.5, 0.0)
    }
  }

  test("psiReport: pre-bucketed counts, missing buckets smoothed") {
    val a = Seq(("x", 50L), ("y", 50L)).toDF("bucket", "n_a")
    val b = Seq(("x", 100L)).toDF("bucket", "n_b") // y vanished
    val got = TextStats.psiReport(a, b, domain = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got.keySet == Set("x", "y"))
    assert(got("y") > 0.5) // the vanished bucket dominates the drift
    assert(got.values.forall(v => !v.isNaN && !v.isInfinite)) // smoothing
    intercept[IllegalArgumentException] {
      TextStats.psiReport(a, b, domain = 0)
    }
  }

  test("keepBest quality ordering can beat the min-id canonical choice") {
    val docs = Seq(
      (1L, "low quality fragment"),
      (2L, "low quality fragment plus richer longer cleaner content here")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val kept = Dedup.keepBest(docs, "doc_id", pairs,
        Seq(TextStats.qualityScore(col("text")).desc))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L)) // longer doc wins on the length signal
    // while keepCanonical would keep doc 1
    val canon = Dedup.keepCanonical(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSeq
    assert(canon == Seq(1L))
  }

  private def round6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pmiBigrams: exact values, minCount cut") {
    // tokens a,b,a,b,a,c -> uni a=3 b=2 c=1, Nuni=6
    // bigrams (a,b)x2 (b,a) (a,c) -> Nbi=4
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextStats.pmiBigrams(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def pmi(bc: Long, u1: Long, u2: Long): Double =
      round6(math.log(bc.toDouble * 6 * 6 / (4.0 * u1 * u2)))
    assert(got == Map(
      ("a", "b") -> (2L, pmi(2, 3, 2)),
      ("b", "a") -> (1L, pmi(1, 2, 3)),
      ("a", "c") -> (1L, pmi(1, 3, 1))))
    // the frequent pair survives the default-style cut alone
    val cut = TextStats.pmiBigrams(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cut == Seq(("a", "b")))
    intercept[IllegalArgumentException] {
      TextStats.pmiBigrams(docs, "text", minCount = 0L)
    }
  }

  test("zipfFit: closed-form least squares over the ranked head") {
    // tf: a=4 b=2 c=1 -> ranks 1,2,3
    val docs = Seq((1L, "a a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = TextStats.zipfFit(docs, "text", topN = 1000).head()
    val xs = Seq(1d, 2d, 3d).map(math.log)
    val ys = Seq(4d, 2d, 1d).map(math.log)
    val n = 3d
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == round6(slope))
    assert(r.getDouble(2) == round6((sy - slope * sx) / n))
    // a frequency-halving corpus slopes near -1 by construction
    assert(r.getDouble(1) < -0.9 && r.getDouble(1) > -1.5)
    // topN cuts the head: with topN=2 only ranks 1..2 enter the fit
    val r2 = TextStats.zipfFit(docs, "text", topN = 2).head()
    assert(r2.getLong(0) == 2L)
    // single-distinct-term corpus: zero x-variance, the closed form is
    // 0/0 — the fit reports NULL, never NaN
    val r1 = TextStats.zipfFit(
      Seq((1L, "a a a")).toDF("doc_id", "text"), "text").head()
    assert(r1.getLong(0) == 1L && r1.isNullAt(1) && r1.isNullAt(2))
    intercept[IllegalArgumentException] {
      TextStats.zipfFit(docs, "text", topN = 1)
    }
  }

  test("bm25Retrieve: quantized per-term scores, exact ranking, k cut") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "a b"), (20L, "z z"), (30L, "missing"))
      .toDF("query_id", "query_text")
    // replicate the engine's double arithmetic exactly (same op order)
    val avgdl = 8.0 / 3
    def ts(tf: Long, df: Long, dl: Long): Long =
      math.round(math.log(1.0 + (3.0 - df.toDouble + 0.5) /
          (df.toDouble + 0.5)) *
        tf.toDouble * 2.2 /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl)) *
        1000000.0)
    val got = TextStats.bm25Retrieve(docs, "doc_id", "text",
        qs, "query_id", "query_text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val d1 = ts(2, 2, 3) + ts(1, 1, 3) // "a"x2 (df 2) + "b" (df 1)
    val d2 = ts(1, 2, 2)
    assert(got == Map(
      (10L, 1L) -> (d1, 1L), (10L, 2L) -> (d2, 2L),
      (20L, 3L) -> (ts(1, 1, 3), 1L))) // dup query terms dedup; no
    // row at all for the all-miss query 30
    // k cuts: with k = 1 only the top doc per query survives
    val k1 = TextStats.bm25Retrieve(docs, "doc_id", "text",
        qs, "query_id", "query_text", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k1 == Set((10L, 1L), (20L, 3L)))
    intercept[IllegalArgumentException] {
      TextStats.bm25Retrieve(docs, "doc_id", "text",
        qs, "query_id", "query_text", k = 0)
    }
  }

  test("bm25Retrieve: heap prune ≡ plain window, ties and k boundary") {
    // dup-heavy corpus: many docs sharing identical text (equal scores)
    // so the rank<=k cut decides on the doc_id tie-break — exactly
    // where a heap whose ordering diverged from the window's would
    // silently drop the wrong doc. Both the long-id and string-id
    // twins ride the pruned path (r17 verdict #5 widened the prune to
    // every integral + string id type), so each is checked against
    // its own expected cut recomputed from the full k=100 result under
    // that type's window ordering (string ids are single-digit-unsafe:
    // "10" < "2" lexicographically — the expectation sorts the same
    // way).
    val texts = (1L to 12L).map(i =>
      i -> (if (i % 3 == 0) "alpha beta gamma" else "alpha delta"))
    val docs = texts.toDF("doc_id", "text")
    val docsStr = texts.map { case (i, t) => (i.toString, t) }
      .toDF("doc_id", "text")
    val qs = Seq((1L, "alpha"), (2L, "beta gamma"), (3L, "delta alpha"))
      .toDF("query_id", "query_text")
    val fullLong = TextStats.bm25Retrieve(docs, "doc_id", "text",
        qs, "query_id", "query_text", k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fullStr = TextStats.bm25Retrieve(docsStr, "doc_id", "text",
        qs, "query_id", "query_text", k = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // same scores per query regardless of id type
    assert(fullLong.groupBy(_._1).view
        .mapValues(_.toSeq.map(_._3).sorted).toMap ==
      fullStr.groupBy(_._1).view
        .mapValues(_.toSeq.map(_._3).sorted).toMap)
    for (k <- Seq(1, 3, 5)) {
      // long-path tie-break: within a query, equal scores rank by
      // doc_id asc — recompute the expected cut from the full result
      val viaHeap = TextStats.bm25Retrieve(docs, "doc_id", "text",
          qs, "query_id", "query_text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val expect = fullLong.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.toSeq.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
          .map { case ((_, d, s), i) => (q, d, s, i + 1L) }
      }.toSet
      assert(viaHeap == expect, s"k=$k")
      // string-path tie-break: equal scores rank by doc_id asc in
      // UTF8String binary order — lexicographic for these ASCII ids
      val viaHeapStr = TextStats.bm25Retrieve(docsStr, "doc_id", "text",
          qs, "query_id", "query_text", k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      val expectStr = fullStr.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.toSeq.sortBy(r => (r._3, r._2))(
            Ordering.Tuple2(Ordering.Long.reverse, Ordering.String))
          .take(k).zipWithIndex
          .map { case ((_, d, s), i) => (q, d, s, i + 1L) }
      }.toSet
      assert(viaHeapStr == expectStr, s"k=$k (string ids)")
    }
    // path pinning: string ids ride the heap prune (MapPartitions in
    // the plan); an unsupported id type (decimal) keeps the plain
    // window — identical semantics, no silent mis-route either way
    def planOf(d: org.apache.spark.sql.DataFrame): String =
      TextStats.bm25Retrieve(d, "doc_id", "text",
        qs, "query_id", "query_text", k = 3)
        .queryExecution.optimizedPlan.toString
    assert(planOf(docsStr).contains("MapPartitions"))
    val docsDec = docs.select(
      col("doc_id").cast("decimal(20,0)").as("doc_id"), col("text"))
    assert(!planOf(docsDec).contains("MapPartitions"))
    val viaWindowDec = TextStats.bm25Retrieve(docsDec, "doc_id", "text",
        qs, "query_id", "query_text", k = 3)
      .collect().map(r => (r.getLong(0), r.getDecimal(1).longValue(),
        r.getLong(2), r.getLong(3))).toSet
    val viaHeap3 = TextStats.bm25Retrieve(docs, "doc_id", "text",
        qs, "query_id", "query_text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaWindowDec == viaHeap3)
  }

  test("bm25Retrieve: heap budget flush keeps results identical") {
    // r17 ADVICE: the heap map is unspillable per-partition state —
    // past the budget it must FLUSH supersets downstream, never OOM.
    // A budget of 2 live entries forces a flush nearly every row on a
    // 12-doc corpus; the final window re-cuts, so results must be
    // bit-identical to the unbudgeted path at every k.
    val texts = (1L to 12L).map(i =>
      i -> (if (i % 3 == 0) "alpha beta gamma" else "alpha delta"))
    val docs = texts.toDF("doc_id", "text")
    val qs = Seq((1L, "alpha"), (2L, "beta gamma"), (3L, "delta alpha"))
      .toDF("query_id", "query_text")
    def run(k: Int) = TextStats.bm25Retrieve(docs, "doc_id", "text",
        qs, "query_id", "query_text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val unbudgeted = Seq(1, 3, 5, 100).map(k => k -> run(k)).toMap
    spark.conf.set(TextStats.Bm25HeapBudgetConf, "2")
    try Seq(1, 3, 5, 100).foreach { k =>
      assert(run(k) == unbudgeted(k), s"k=$k")
    } finally spark.conf.unset(TextStats.Bm25HeapBudgetConf)
  }

  test("bm25Retrieve: maxTermDf cap == deleting dense terms from queries") {
    // "alpha" is corpus-dense (df 4); "beta"/"delta" are rare (df 1).
    // With the cap below 4, capped retrieval must be bit-identical to
    // running the SAME call with "alpha" deleted from the query text —
    // corpus stats (n, avgdl) and surviving terms' df are unaffected,
    // and a query whose every term is capped vanishes entirely.
    val docs = Seq((1L, "alpha beta x"), (2L, "alpha delta"),
      (3L, "alpha y z"), (4L, "alpha")).toDF("doc_id", "text")
    val qs = Seq((1L, "alpha beta"), (2L, "alpha"), (3L, "delta alpha"))
      .toDF("query_id", "query_text")
    val qsStripped = Seq((1L, "beta"), (2L, ""), (3L, "delta"))
      .toDF("query_id", "query_text")
    def collect(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val stripped = collect(TextStats.bm25Retrieve(docs, "doc_id", "text",
      qsStripped, "query_id", "query_text", k = 10))
    spark.conf.set(TextStats.Bm25MaxTermDfConf, "3")
    try {
      val capped = collect(TextStats.bm25Retrieve(docs, "doc_id", "text",
        qs, "query_id", "query_text", k = 10))
      assert(capped == stripped)
      // query 2 ("alpha" only) vanished; queries 1 and 3 kept their
      // rare term's scoring
      assert(capped.map(_._1) == Set(1L, 3L))
    } finally spark.conf.unset(TextStats.Bm25MaxTermDfConf)
    // default path (cap off) still scores the dense term
    val uncapped = collect(TextStats.bm25Retrieve(docs, "doc_id", "text",
      qs, "query_id", "query_text", k = 10))
    assert(uncapped.map(_._1) == Set(1L, 2L, 3L))
    assert(uncapped != stripped)
  }

  test("bm25Retrieve: oversized query table refuses cleanly") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val qs = Seq((10L, "a b"), (20L, "c d")).toDF("query_id", "query_text")
    spark.conf.set(TextStats.Bm25QueryTableMaxBytesConf, "64")
    try {
      val e = intercept[IllegalArgumentException] {
        TextStats.bm25Retrieve(docs, "doc_id", "text",
          qs, "query_id", "query_text", k = 5)
      }
      // the clean error names the size, the gate and the remedy —
      // never a driver OOM mid-collect (r16 verdict #3)
      assert(e.getMessage.contains("query-term table"), e.getMessage)
      assert(e.getMessage.contains("split the query batch"), e.getMessage)
    } finally spark.conf.unset(TextStats.Bm25QueryTableMaxBytesConf)
  }

  test("templateNgrams: per-source df ranking, short docs, tie order") {
    val docs = Seq(
      (1L, "c1 c2 c3 foo", "s1"), (2L, "c1 c2 c3 bar", "s1"),
      (3L, "hi", "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextStats.templateNgrams(docs, "doc_id", "text", "source",
        n = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("s1", "c1 c2 c3", 2L, 1L),
      ("s1", "c2 c3 bar", 1L, 2L), // df-1 ties break by gram asc
      ("s2", "hi", 1L, 1L)))       // short doc: full-stream gram
    intercept[IllegalArgumentException] {
      TextStats.templateNgrams(docs, "doc_id", "text", "source", n = 0)
    }
  }

  test("prefixClusters: shared first-k-token fingerprints, singletons cut") {
    val docs = Seq(
      (5L, "a b c"), (2L, "a b d"), // share the 2-token prefix "a b"
      (3L, "x y"),                  // alone
      (4L, "a")                     // short doc: fingerprint of "a" alone
    ).toDF("doc_id", "text")
    val got = TextStats.prefixClusters(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 2L))) // one cluster: docs {2,5}, min id 2
    // k larger than every doc: full-text fingerprints, only exact
    // token-stream dups cluster
    val dup = Seq((1L, "p q r"), (2L, "p q r"), (3L, "p q")).toDF("doc_id", "text")
    val g2 = TextStats.prefixClusters(dup, "doc_id", "text", k = 99)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(g2.toSeq == Seq((2L, 1L)))
    intercept[IllegalArgumentException] {
      TextStats.prefixClusters(docs, "doc_id", "text", k = 0)
    }
  }

  test("exactDupStars: class-min star edges, CC-equivalent to all-pairs") {
    val docs = Seq(
      (7L, "alpha beta gamma"), (3L, "alpha beta gamma"),
      (9L, "alpha beta gamma"),                    // family min = 3
      (20L, "delta epsilon"), (21L, "delta epsilon"), // family min = 20
      (30L, "a singleton text"),
      (40L, null.asInstanceOf[String]), (41L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val stars = Dedup.exactDupStars(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every non-min member paired with its class min; NULLs and
    // singletons emit nothing (the rescue pass sees an empty remainder)
    assert(stars == Set((3L, 7L), (3L, 9L), (20L, 21L)))
    // star edges span the same components as the C(m,2) pair form
    val pairGroups = Dedup.connectedComponents(
      Dedup.exactDupPairs(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val starGroups = Dedup.connectedComponents(
      Dedup.exactDupStars(docs, "doc_id", "text").toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starGroups == pairGroups)
  }

  test("broadcastCollectGate: sub-MB maxResultSize clamps, 0-bytes lifts") {
    val confGate = 256L << 20
    // r16 ADVICE: '512k' truncated to 0 MB under byteStringAsMb and was
    // read as unlimited — the exact config most likely to abort the
    // collect got no protection
    assert(Dedup.broadcastCollectGate(confGate, "512k") ==
      512L * 1024 / 5 * 4)
    assert(Dedup.broadcastCollectGate(confGate, "0") == confGate)
    // r17 ADVICE: Spark treats ANY setting parsing to 0 bytes as
    // unlimited — '0m'/'0g' must lift the clamp too, not gate at 0
    assert(Dedup.broadcastCollectGate(confGate, "0m") == confGate)
    assert(Dedup.broadcastCollectGate(confGate, "0g") == confGate)
    assert(Dedup.broadcastCollectGate(confGate, " 0k ") == confGate)
    assert(Dedup.broadcastCollectGate(confGate, "1g") ==
      math.min(confGate, (1L << 30) / 5 * 4))
    // a roomy driver keeps the configured gate
    assert(Dedup.broadcastCollectGate(confGate, "4g") == confGate)
  }

  test("containmentWavePlan: over-cap resident wave demotes, not clamps") {
    val scratch = 1L << 30
    // resident wave fits in a handful of batches: stay resident
    assert(Dedup.containmentWavePlan(invFits = true,
      estResident = 3.5 * scratch, estShuffled = 9.0 * scratch,
      scratch) == ((true, 4)))
    // resident wave alone wants > ResidentBatchCap batches while the
    // index still fits its gate: DEMOTE to the shuffled tier and size
    // k from the shuffled estimate (with its +shingle-stream term) —
    // clamping k at the cap would carry estResident/32 per batch,
    // reinstating the ENOSPC the batching exists to prevent (r16)
    val (res, k) = Dedup.containmentWavePlan(invFits = true,
      estResident = 40.0 * scratch, estShuffled = 90.0 * scratch,
      scratch)
    assert(!res && k == 90)
    // index over its gate: shuffled regardless of wave count
    assert(Dedup.containmentWavePlan(invFits = false,
      estResident = 1.0, estShuffled = 2.5 * scratch,
      scratch) == ((false, 3)))
    // shuffled tier keeps its own 256 backstop
    assert(Dedup.containmentWavePlan(invFits = false,
      estResident = 1.0, estShuffled = 1e6 * scratch,
      scratch) == ((false, 256)))
  }

  test("curationReport: zero-shingle byte-equal docs — capped ≡ uncapped") {
    import graft.operators.Curation
    val prose = "the quick brown fox jumps over the lazy dog and it " +
      "was seen by the river bank at dawn with a friend of the miller"
    // the zero-shingle corner (r16 ADVICE): only EMPTY/whitespace text
    // has shingle set ∅ (short docs collapse to a whole-doc shingle).
    // Byte-equal empty docs are near-dups in BOTH pipelines — jaccard
    // defines the empty-union case as 1.0 and empty docs share the
    // all-sentinel MinHash signature, so the uncapped LSH stage links
    // them itself; under an armed cap (their shared-signature bucket
    // is exactly what a cap skips) the exact-dup star edges preserve
    // the same outcome. This parity is the invariant — NOT "empty docs
    // stay KEEP". langId("") = "und", qualityScore("") ≈ 0.333, so the
    // "und" allow-list entry walks the empty docs through the gate.
    val docs = Seq(
      (1L, ""), (2L, ""), (3L, ""),
      (10L, prose), (11L, prose)
    ).toDF("doc_id", "text")
    for (cap <- Seq(Int.MaxValue, 2)) {
      val rep = Curation.curationReport(docs, "doc_id", "text",
          langs = Seq("en", "und"), minQuality = 0.2,
          nearThreshold = 0.9, containThreshold = 0.9,
          lshMaxBucketSize = cap)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) "KEEP" else r.getString(1))).toMap
      assert(rep(1L) == "KEEP" && rep(2L) == "near_dup" &&
        rep(3L) == "near_dup", s"cap=$cap got $rep")
      assert(rep(10L) == "KEEP" && rep(11L) == "near_dup",
        s"cap=$cap got $rep")
    }
  }
}
