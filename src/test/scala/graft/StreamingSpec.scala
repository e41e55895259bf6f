package graft

import graft.streaming.StreamingOps

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streaming dedup drops repeated ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    input.addData((1L, ts(0), 1.0), (1L, ts(1), 2.0), (2L, ts(2), 3.0),
      (2L, ts(2), 3.0), (3L, ts(3), 4.0))
    val q = StreamingOps.dedupStream(events, "event_id", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("windowed counts aggregate by sliding window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0),
      (ts(11), "click", 4.0), (ts(3), "view", 8.0))
    val q = StreamingOps.windowedCounts(events, "ts", "event_type",
        windowLen = "10 minutes", slide = "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("win_out")
      .selectExpr("event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == Set(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 8.0)))
  }

  test("countMilestones: custom state emits once, across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val events = input.toDF().toDF("user_id")
    val q = StreamingOps.countMilestones(events, "user_id", milestone = 3L)
      .writeStream.format("memory").queryName("milestone_out")
      .outputMode("append").start()
    // batch 1: user 1 at count 2 (below), user 2 at 3 (crosses)
    input.addData(1L, 1L, 2L, 2L, 2L)
    q.processAllAvailable()
    // batch 2: user 1 crosses (state carried over); user 2 stays silent
    input.addData(1L, 2L, 2L)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("milestone_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == Seq((1L, 3L), (2L, 3L))) // exactly once each
    // same definition runs on a batch frame
    val batch = Seq(1L, 1L, 1L, 2L).toDF("user_id")
    val b = StreamingOps.countMilestones(batch, "user_id", 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(b.toSeq == Seq((1L, 3L)))
  }

  test("inactiveUsers: event-time timeout emits once and evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val q = StreamingOps.inactiveUsers(events, "ts", "user_id",
        gapMinutes = 10, watermark = "5 minutes")
      .writeStream.format("memory").queryName("inactive_out")
      .outputMode("append").start()
    // batch 1: user 1 twice, user 2 once; nothing can time out yet
    input.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(6)))
    q.processAllAvailable()
    // batch 2 advances the watermark to 10:55 (11:00 − 5 min), past
    // user 1's 10:15 timeout; batch 3's processing then fires it.
    // Users 2 and 3 stay unemitted: their timeouts trail the final
    // watermark by construction (last event + gap > max − watermark).
    input.addData((2L, Timestamp.valueOf("2026-01-01 11:00:00")))
    q.processAllAvailable()
    input.addData((3L, Timestamp.valueOf("2026-01-01 11:01:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("inactive_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, ts(5), 2L)))
  }

  test("upsertAggStore merges per-file microbatches into the batch aggregate") {
    val watch = java.nio.file.Files.createTempDirectory("graft_upsert_in")
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_upsert_store").toString
    val a = Seq((1L, ts(0), 2.0), (2L, ts(1), 3.0))
      .toDF("user_id", "ts", "value")
    val b = Seq((1L, ts(5), 4.0), (3L, ts(6), 5.0))
      .toDF("user_id", "ts", "value")
    a.coalesce(1).write.mode("append").parquet(watch.toString)
    b.coalesce(1).write.mode("append").parquet(watch.toString)
    val sdf = spark.readStream.schema(a.schema)
      .option("maxFilesPerTrigger", "1").parquet(watch.toString)
    val store = StreamingOps.upsertAggStore(
      sdf, "user_id", "ts", "value", storeDir)
    val got = store.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, ts(5), 6.0), (2L, 1L, ts(1), 3.0),
      (3L, 1L, ts(6), 5.0)))
    // one-file-per-trigger over two files ⇒ the merge path really ran
    // across batches: the idempotence stamp must have advanced past 0
    val marker = new java.io.File(storeDir, "last_batch")
    assert(marker.exists())
    assert(new String(java.nio.file.Files.readAllBytes(marker.toPath))
      .toLong >= 1L)
  }

  test("upsertAggStore leaves untouched buckets byte-identical across a batch") {
    // two users hashed to DIFFERENT buckets by the store's own function
    val ub = spark.range(1, 64)
      .select(col("id"), pmod(xxhash64(col("id")), lit(8)).cast("int").as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val (x, bx) = ub.head
    val (y, by) = ub.find(_._2 != bx).get
    val watch = java.nio.file.Files.createTempDirectory("graft_upsert_in3")
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_upsert_store3").toString
    val ck = java.nio.file.Files
      .createTempDirectory("graft_upsert_ck3").toString
    def run(): Array[(Long, Long, Double)] = {
      val sdf = spark.readStream
        .schema(Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "value").schema)
        .parquet(watch.toString)
      StreamingOps.upsertAggStore(sdf, "user_id", "ts", "value", storeDir,
          numBuckets = 8, checkpointDir = ck)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .sortBy(_._1)
    }
    Seq((x, ts(0), 2.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(watch.toString)
    run()
    val store = new java.io.File(storeDir, "store")
    def ptr(b: Int): String = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(store, s"ptr-$b").toPath), "UTF-8")
    def snapDir(d: java.io.File): Map[String, Seq[Byte]] =
      d.listFiles.filter(_.isFile).map(f =>
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    val ptrBefore = ptr(bx)
    val bxData = new java.io.File(store, ptrBefore.split("\t")(0))
    val dataBefore = snapDir(bxData)
    // second run resumes from the shared checkpoint: only the new file
    // is processed (batch 1), whose key touches ONLY bucket `by`.
    Seq((y, ts(5), 3.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(watch.toString)
    val got = run()
    assert(ptr(bx) == ptrBefore, "untouched bucket's pointer was rewritten")
    assert(snapDir(bxData) == dataBefore,
      "untouched bucket's data dir was rewritten")
    // y's bucket published by batch 1, x's by 0 — per-pointer stamps
    assert(ptr(by).split("\t")(1).toLong == 1L)
    assert(ptrBefore.split("\t")(1).toLong == 0L)
    assert(got.toSeq.sortBy(_._1) ==
      Seq((x, 1L, 2.0), (y, 1L, 3.0)).sortBy(_._1))
  }

  test("upsertAggStore partial replay skips published buckets, commits the rest") {
    // crash simulation for the pointer protocol: batch 0 touched two
    // buckets but "crashed" after publishing only ONE pointer (and
    // before the global marker). The replay must NOT re-merge the
    // published bucket (pointer stamp == batchId) and MUST commit the
    // unpublished one — ending exactly at single-application values.
    val ub = spark.range(1, 64)
      .select(col("id"), pmod(xxhash64(col("id")), lit(8)).cast("int").as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val (x, bx) = ub.head
    val (y, by) = ub.find(_._2 != bx).get
    val watch = java.nio.file.Files.createTempDirectory("graft_upsert_in4")
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_upsert_store4").toString
    def run(): Map[Long, (Long, Double)] = {
      // fresh checkpoint per call: batch ids restart at 0 = the
      // replay-after-crash shape
      val sdf = spark.readStream
        .schema(Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "value").schema)
        .parquet(watch.toString)
      StreamingOps.upsertAggStore(sdf, "user_id", "ts", "value", storeDir,
          numBuckets = 8)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
        .toMap
    }
    Seq((x, ts(0), 2.0), (y, ts(1), 3.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(watch.toString)
    run() // both pointers published at stamp 0, marker 0
    val store = new java.io.File(storeDir, "store")
    // crash state: marker never written, bucket by's pointer never
    // published (its data dir stays on disk, unreachable — readers
    // resolve pointers only)
    assert(new java.io.File(storeDir, "last_batch").delete())
    assert(new java.io.File(store, s"ptr-$by").delete())
    val ptrX = java.nio.file.Files.readAllBytes(
      new java.io.File(store, s"ptr-$bx").toPath).toSeq
    val got = run() // replay of batch 0
    assert(got == Map(x -> (1L, 2.0), y -> (1L, 3.0)),
      s"partial replay lost or double-merged: $got")
    // the published bucket's pointer survived the replay byte-identical
    assert(java.nio.file.Files.readAllBytes(
      new java.io.File(store, s"ptr-$bx").toPath).toSeq == ptrX,
      "published bucket was re-merged on replay")
  }

  test("pointer store fences a stale writer's publish") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ptr_fence").toFile
    val ps = new graft.streaming.PointerStore(dir)
    assert(ps.currentEpoch() == 0L)
    val e1 = ps.acquireEpoch()
    assert(e1 == 1L)
    ps.publishPtr(0, "data-0-0/graft_pb=0", 0L, e1)
    assert(ps.readPtr(0).contains(("data-0-0/graft_pb=0", 0L, e1)))
    // a newer writer takes over the store and republishes the bucket
    val e2 = ps.acquireEpoch()
    assert(e2 == 2L)
    ps.publishPtr(0, "data-1-0/graft_pb=0", 1L, e2)
    // the zombie (epoch 1) wakes up and tries to roll the bucket back
    val ex = intercept[graft.streaming.PointerStore.StaleWriterException] {
      ps.publishPtr(0, "data-0-1/graft_pb=0", 0L, e1)
    }
    assert(ex.getMessage.contains("fenced"))
    // the newer writer's pointer survived untouched
    assert(ps.readPtr(0).contains(("data-1-0/graft_pb=0", 1L, e2)))
    // same-epoch republish (crash-replay of the CURRENT writer) is fine
    ps.publishPtr(0, "data-1-1/graft_pb=0", 1L, e2)
    assert(ps.readPtr(0).contains(("data-1-1/graft_pb=0", 1L, e2)))
    // legacy 2-field pointer reads as epoch 0: any acquired epoch wins
    java.nio.file.Files.write(new java.io.File(dir, "ptr-3").toPath,
      "data-9-0/graft_pb=3\t9".getBytes("UTF-8"))
    assert(ps.readPtr(3).contains(("data-9-0/graft_pb=3", 9L, 0L)))
    ps.publishPtr(3, "data-10-0/graft_pb=3", 10L, e2)
    assert(ps.readPtr(3).contains(("data-10-0/graft_pb=3", 10L, e2)))
  }

  test("epoch marker compaction: stale markers GC'd, epoch + fence survive") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ptr_compact").toFile
    val ps = new graft.streaming.PointerStore(dir)
    // many historical takeovers: each acquire claims marker n and GCs
    // the ones below it, so the directory never accumulates markers
    val epochs = (1 to 25).map(_ => ps.acquireEpoch())
    assert(epochs == (1L to 25L), s"non-sequential epochs: $epochs")
    val markers = dir.listFiles().map(_.getName)
      .filter(_.startsWith("epoch-")).toSeq
    assert(markers == Seq("epoch-25"),
      s"stale markers survived compaction: $markers")
    // the compacted directory still reports the durable epoch...
    assert(ps.currentEpoch() == 25L)
    // ...a fresh opener (post-compaction takeover) claims the next one
    val ps2 = new graft.streaming.PointerStore(dir)
    val e26 = ps2.acquireEpoch()
    assert(e26 == 26L, s"compaction rolled the epoch back: claimed $e26")
    // ...and the fence still rejects a pre-compaction zombie
    ps2.publishPtr(0, "data-26-0/graft_pb=0", 0L, e26)
    val ex = intercept[graft.streaming.PointerStore.StaleWriterException] {
      ps.publishPtr(0, "data-7-0/graft_pb=0", 0L, 7L)
    }
    assert(ex.getMessage.contains("fenced"))
    assert(ps2.readPtr(0).contains(("data-26-0/graft_pb=0", 0L, e26)))
  }

  test("upsertAggStore replay is idempotent: restamped batches are skipped") {
    val watch = java.nio.file.Files.createTempDirectory("graft_upsert_in2")
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_upsert_store2").toString
    val a = Seq((1L, ts(0), 2.0), (2L, ts(1), 3.0))
      .toDF("user_id", "ts", "value")
    a.coalesce(1).write.mode("append").parquet(watch.toString)
    def run(): Array[(Long, Long, Double)] = {
      val sdf = spark.readStream.schema(a.schema).parquet(watch.toString)
      StreamingOps.upsertAggStore(sdf, "user_id", "ts", "value", storeDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .sortBy(_._1)
    }
    val first = run()
    // a fresh checkpoint restarts batch ids at 0 — the failure-replay
    // shape. The marker stamp must skip them, leaving the store
    // EXACTLY as after the first run, not doubled.
    val replay = run()
    assert(first.toSeq == Seq((1L, 1L, 2.0), (2L, 1L, 3.0)))
    assert(replay.toSeq == first.toSeq)
  }

  test("stream-static enrichment joins each event to its dim row, broadcast") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    input.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(2), 3.0),
      (9L, ts(3), 4.0)) // user 9 has no dim row → dropped (inner)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val q = StreamingOps.enrichStream(events, dim, "user_id", "cust_id")
      .select("user_id", "tier", "value")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "gold", 1.0), (2L, "basic", 2.0), (1L, "gold", 3.0)))
  }

  test("stream-static interval join plans through IntervalJoinExec") {
    // beyond the (batch-only) reference: a micro-batch stream probed
    // against a static broadcast interval index
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(GraftSession.PreferIntervalJoin, "true")
    val static = Seq(("c1", 100, 200), ("c1", 300, 400), ("c2", 100, 200))
      .toDF("contig", "pos_start", "pos_end")
      .select($"contig".as("ac"), $"pos_start".as("a_start"),
        $"pos_end".as("a_end"))
    val input = MemoryStream[(String, Int, Int)]
    input.addData(("c1", 150, 160), ("c1", 250, 260), ("c2", 180, 310))
    val probe = input.toDF().toDF("bc", "b_start", "b_end")
    val joined = static.join(probe, $"ac" === $"bc" &&
      $"a_start" <= $"b_end" && $"a_end" >= $"b_start")
    val q = joined.writeStream.format("memory").queryName("sij_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sij_out").collect().map(_.toSeq).toSet
    assert(got == Set(
      Seq("c1", 100, 200, "c1", 150, 160),
      Seq("c2", 100, 200, "c2", 180, 310)))
  }

  test("streaming decontamination: static train gram index filters the stream") {
    // an ingest pipeline shape: incoming docs (micro-batches) are
    // anti-joined against the STATIC train corpus's distinct gram
    // hashes — contaminated docs (any shared 3-gram) never land
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val trainGrams = train.select(
      explode(graft.operators.Dedup.shingleHashes($"text", 3)).as("g"))
      .distinct()
    val input = MemoryStream[(Long, String)]
    input.addData(
      (10L, "words around the quick brown fox inside a bigger doc"),
      (11L, "completely novel content with no training overlap at all"))
    val docs = input.toDF().toDF("doc_id", "text")
    val clean = docs.withColumn("g",
        explode(graft.operators.Dedup.shingleHashes($"text", 3)))
      .join(trainGrams, Seq("g"), "left_anti")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n")) // grams surviving the anti-join
    val q = clean.writeStream.format("memory").queryName("decon_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("decon_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 10 (10 words -> 8 grams) shares 2 with train ("the quick
    // brown", "quick brown fox") -> 6 survive; doc 11 (9 words ->
    // 7 grams) keeps all 7
    assert(got == Map(10L -> 6L, 11L -> 7L))
  }

  test("stream-static interval join on RAW timestamp bounds (temporal + int64)") {
    // the temporal recognizer must fire inside the incremental planner
    // too: static window table probed by a stream, bounds are raw
    // TimestampType → UnixMicros normalization → Int64 index
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(GraftSession.PreferIntervalJoin, "true")
    val static = Seq(("c1", ts(0), ts(10)), ("c1", ts(20), ts(30)))
      .toDF("key", "w_start", "w_end")
      .select($"key".as("ak"), $"w_start".as("a_s"), $"w_end".as("a_e"))
    val input = MemoryStream[(String, Timestamp, Timestamp)]
    input.addData(("c1", ts(5), ts(6)), ("c1", ts(12), ts(15)),
      ("c1", ts(15), ts(25)))
    val probe = input.toDF().toDF("bk", "b_s", "b_e")
    val joined = static.join(probe, $"ak" === $"bk" &&
      $"a_s" <= $"b_e" && $"a_e" >= $"b_s")
    val q = joined.writeStream.format("memory").queryName("tsij_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tsij_out")
      .selectExpr("a_s", "b_s").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1))).toSet
    assert(got == Set((ts(0), ts(5)), (ts(20), ts(15))))
  }

  test("stream-stream range join pairs in-tolerance events, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val li = MemoryStream[(String, Timestamp, Long)]
    val ri = MemoryStream[(String, Timestamp, Long)]
    val l = li.toDF().toDF("lk", "lts", "lid")
    val r = ri.toDF().toDF("rk", "rts", "rid")
    // k1: 10:00 vs 10:05 (within 10 min) and 10:30 (outside); k2 key miss
    li.addData(("k1", ts(0), 1L), ("k1", ts(30), 2L), ("k2", ts(0), 3L))
    ri.addData(("k1", ts(5), 10L), ("k3", ts(5), 11L))
    val joined = StreamingOps.streamStreamRangeJoin(
      l, r, "lk", "rk", "lts", "rts")
    val q = joined.writeStream.format("memory").queryName("ssr_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssr_out")
      .selectExpr("lid", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("sessionize groups events within the gap into one session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    // user 7: events at 10:01, 10:03 (one session), 10:30 (a second one)
    input.addData((ts(1), 7L, 1.0), (ts(3), 7L, 1.0), (ts(30), 7L, 1.0))
    val q = StreamingOps.sessionize(events, "ts", "user_id", gap = "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_out").selectExpr("n_events")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L))
  }
}
