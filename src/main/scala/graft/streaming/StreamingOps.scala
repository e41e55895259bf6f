package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structured-Streaming operators for the events stream shape
 * `(event_id, ts, user_id, event_type, value, props)`.
 *
 * The reference engine is batch-only (both join children must be bounded,
 * reference: sequila-core joins/utils.rs:35-63); these are the streaming
 * counterparts a large-scale ingest pipeline needs, built on watermarks +
 * built-in stateful operators so state is bounded and sharded by key —
 * the 100-TB-friendly shape (state lives partitioned in the state store,
 * no driver-side accumulation).
 */
object StreamingOps {

  /** Exact-dedup on a stream: watermarked drop-duplicates on the id —
    * state for an id is dropped once the watermark passes its first
    * sighting. `dropDuplicatesWithinWatermark`, NOT plain
    * `dropDuplicates`: with an id-only key the latter never evicts state
    * (the watermark only purges dedup state when the event-time column
    * is part of the key), which grows without bound at ingest rates.
    * Batch DataFrames take the plain path (the WithinWatermark variant
    * is streaming-only). */
  def dedupStream(events: DataFrame, idCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame = {
    val wm = events.withWatermark(tsCol, watermark)
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark(Seq(idCol))
    else wm.dropDuplicates(Seq(idCol))
  }

  /** Sliding-window per-type counts + value sums. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String = "1 hour", slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Session windows per user (gap-based), emitting session span + event
    * count — built-in session_window keeps state per (user, open session)
    * only. */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
      gap: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Custom keyed state via `flatMapGroupsWithState` — the escape hatch
    * for stateful logic the built-in operators can't express. This one
    * emits `(key, milestone)` exactly once, the moment a key's lifetime
    * event count first reaches `milestone` (ingest-volume alerting,
    * heavy-user detection). Counts are arrival-order-independent, so
    * the bounded replay emits exactly the batch answer regardless of
    * trigger batching — which is what puts a CUSTOM-state operator
    * under the driver's batch oracle at all.
    *
    * State = one Long per key, sharded in the state store (the 100-TB
    * posture: no driver accumulation, per-key state constant-size). A
    * production deployment bounds state lifetime with a timeout; the
    * default here is NoTimeout because the milestone contract is
    * lifetime counts. The same code runs on a batch frame (each group
    * arrives whole, state starts empty) — one definition, both modes. */
  def countMilestones(events: DataFrame, keyCol: String,
      milestone: Long): DataFrame = {
    require(milestone >= 1, s"milestone must be >= 1 (got $milestone)")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col(keyCol).cast("long")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          if (before < milestone && after >= milestone)
            Iterator.single((key, milestone))
          else Iterator.empty
      }
      .toDF(keyCol, "milestone")
  }

  /** Inactivity detection via EVENT-TIME TIMEOUT state — the API that
    * BOUNDS custom keyed state: each user's state (last-seen timestamp +
    * lifetime count) arms a timeout at `last_seen + gapMinutes`; when
    * the watermark passes it, the operator emits one
    * `(user_id, last_seen, n_events)` record and REMOVES the state
    * (churn alerting / session-abandon detection, and the reason a
    * 100-TB-ingest state store doesn't grow monotonically: keys that go
    * quiet are evicted, not retained forever — the piece
    * [[countMilestones]]' NoTimeout deliberately leaves out).
    *
    * Aggregates are max/count (arrival-order-independent), so the
    * bounded replay is deterministic: a user is emitted iff their
    * timeout precedes the final watermark (global max event time minus
    * `watermark`), which is exactly the batch HAVING the oracle runs.
    * Timeout timestamps are millisecond-floored (the watermark's own
    * granularity); `last_seen` itself keeps full microsecond precision.
    */
  def inactiveUsers(events: DataFrame, tsCol: String, userCol: String,
      gapMinutes: Int = 60, watermark: String = "30 minutes"): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes must be >= 1 (got $gapMinutes)")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMs = gapMinutes * 60000L
    // the watermarked event-time COLUMN must survive into the stateful
    // operator's input (projecting it away severs the watermark link
    // EventTimeTimeout requires), so ts rides along unused
    val keyed = events.withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("t_us"), col(tsCol).as("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            val (last, n) = state.get
            state.remove()
            Iterator.single((key, last, n))
          } else {
            var (last, n) = state.getOption.getOrElse((Long.MinValue, 0L))
            rows.foreach { case (_, t, _) => if (t > last) last = t; n += 1 }
            state.update((last, n))
            state.setTimeoutTimestamp(Math.floorDiv(last, 1000L) + gapMs)
            Iterator.empty
          }
      }
      .toDF(userCol, "last_us", "n_events")
      .select(col(userCol), timestamp_micros(col("last_us")).as("last_seen"),
        col("n_events"))
  }

  /** Streaming UPSERT sink via `foreachBatch` — the production merge
    * pattern for sinks without native streaming support: each
    * microbatch's per-key aggregates are combined into a persisted
    * keyed store. The store is HASH-BUCKETED
    * (b = pmod(xxhash64(key), numBuckets)): a microbatch reads and
    * merges ONLY the buckets its keys hash into, so the per-batch
    * merge cost is O(|batch keys| + |touched buckets|), not
    * O(|store|) — at 100-TB ingest with ~10⁹ store keys a full-store
    * rewrite per trigger is the scale-killer this layout removes
    * (production sizing: numBuckets ≈ store size / target-file-size,
    * e.g. 1024+). The aggregates (count / max / sum) are associative
    * and commutative, so the final store equals the batch aggregation
    * of the whole stream regardless of trigger batching.
    *
    * Commit protocol: MANIFEST-POINTER, not rename-swap. Data
    * directories (`store/data-<batchId>-<attempt>/graft_pb=<b>/`) are
    * IMMUTABLE once written — all of a batch's touched buckets land in
    * ONE Spark write job via `partitionBy`. Each bucket is then
    * published by atomically rewriting a small per-bucket pointer file
    * (`store/ptr-<b>` → "<relative data path>\t<batchId>"). Readers
    * resolve pointers, never directory listings, so a half-committed
    * batch is invisible and rename atomicity of DATA files is a
    * non-event: on an object store the pointer rewrite is a single
    * small-object PUT (modeled locally by write-tmp + ATOMIC_MOVE),
    * which is the only primitive the protocol needs to be atomic.
    *
    * Exactly-once under retries: a microbatch can be REPLAYED after a
    * failure mid-commit, so idempotence is stamped at BOTH grains. A
    * global `last_batch` marker fast-skips fully-applied batches; and
    * because pointer publishes within one batch are not mutually
    * atomic, each pointer carries its own batch stamp: a replayed
    * batch re-merges only the buckets whose pointer stamp is behind
    * it, never double-merging one it had already published. There is
    * NO heal step — a crash at any point leaves every pointer valid
    * (old or new, each individually consistent), and the replay is
    * driven by the streaming checkpoint, not by directory forensics.
    * Data dirs no pointer references are garbage-collected after each
    * commit.
    *
    * Writer contract: SINGLE WRITER at a time. Attempt suffixes guard
    * crashes-and-replays of the one writer, not concurrent writers —
    * two drivers merging the same bucket concurrently could each build
    * a merge missing the other's rows, which no publish-time check can
    * repair. What IS defended is the ZOMBIE writer: each store open
    * acquires a monotonically-increasing epoch ([[PointerStore]]), and
    * every pointer publish carries it — a publish whose epoch is older
    * than the bucket's current pointer epoch throws instead of rolling
    * the bucket back to a stale merge, so a paused-and-resumed old
    * driver dies loudly rather than silently undoing a newer writer's
    * batches.
    *
    * Scale shape: the store carries one NARROW row per key (the 100-TB
    * ingest aggregate, not the events); each merge shuffles only the
    * batch's per-key rows plus the touched buckets' rows, and issues a
    * FIXED number of Spark jobs per batch (one read of all touched
    * buckets, one partitioned write) rather than one job per bucket.
    * The touched-bucket list is a bounded ≤ numBuckets-element
    * collect. Runs the bounded stream to completion (AvailableNow) and
    * returns the final store. `checkpointDir` persists the source
    * offsets so a later call resumes AFTER previously-processed input
    * (pass the same dir to re-run against a grown source); default is
    * a fresh temp checkpoint per call (replay-from-zero,
    * stamp-skipped). */
  def upsertAggStore(events: DataFrame, userCol: String, tsCol: String,
      valCol: String, storeDir: String, numBuckets: Int = 8,
      checkpointDir: String = null): DataFrame = {
    val spark = events.sparkSession
    val store = new java.io.File(storeDir, "store")
    val marker = new java.io.File(storeDir, "last_batch")
    store.mkdirs()
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete()
    }
    val ptrs = new PointerStore(store)
    val epoch = ptrs.acquireEpoch()
    def readPtr(b: Int): Option[(String, Long)] =
      ptrs.readPtr(b).map(p => (p._1, p._2))
    def publishPtr(b: Int, rel: String, bid: Long): Unit =
      ptrs.publishPtr(b, rel, bid, epoch)
    def livePaths: Seq[String] =
      (0 until numBuckets).flatMap(readPtr).map(_._1)
        .map(rel => new java.io.File(store, rel).getPath)
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy(col(userCol))
        .agg(count(lit(1)).as("n_events"), max(col(tsCol)).as("last_ts"),
          sum(col(valCol)).as("sum_value"))
    val reAgg = Seq(sum("n_events").as("n_events"),
      max("last_ts").as("last_ts"), sum("sum_value").as("sum_value"))
    val ck = if (checkpointDir != null) checkpointDir
      else java.nio.file.Files.createTempDirectory("graft_upsert_ck").toString
    val q = events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val applied = if (marker.exists())
          new String(java.nio.file.Files.readAllBytes(marker.toPath)).toLong
        else -1L
        if (batchId > applied) {
          // graft_bucket is a REGULAR column in the data files (the
          // partition dir uses a copy, graft_pb), so bucket dirs read
          // back standalone still carry their bucket id
          val bAgg = aggOf(batch).withColumn("graft_bucket",
            pmod(xxhash64(col(userCol)), lit(numBuckets)).cast("int"))
            .persist()
          val touched = bAgg.select("graft_bucket").distinct()
            .collect().map(_.getInt(0)).sorted // bounded: ≤ numBuckets
          // partial-replay skip per bucket: already-published pointers
          // of THIS batch are final, merge only the ones behind it
          val toMerge = touched.filter(b =>
            readPtr(b).forall(_._2 < batchId))
          if (toMerge.nonEmpty) {
            val curPaths = toMerge.flatMap(b => readPtr(b).map(_._1))
              .map(rel => new java.io.File(store, rel).getPath)
            val batchRows = bAgg
              .where(col("graft_bucket").isin(toMerge.map(Integer.valueOf): _*))
            // one shuffle, keyed on the BUCKET: hash(bucket) satisfies
            // the (user, bucket) clustering the aggregate needs (bucket
            // is a subset of the grouping key), so the merge agg adds no
            // exchange of its own — and each bucket is confined to one
            // task, so the partitioned write emits exactly ONE file per
            // bucket instead of |tasks| x |buckets| fragments
            val merged = (if (curPaths.nonEmpty)
                spark.read.parquet(curPaths.toIndexedSeq: _*)
                  .unionByName(batchRows)
              else batchRows)
              .repartition(col("graft_bucket"))
              .groupBy(col(userCol), col("graft_bucket"))
              .agg(reAgg.head, reAgg.tail: _*)
            // immutable data dir, unique per (batch, attempt): a
            // crashed attempt's dir may already hold PUBLISHED buckets
            // — never overwrite it, allocate the next attempt suffix
            val attempt = Iterator.from(0).find(k =>
              !new java.io.File(store, s"data-$batchId-$k").exists()).get
            val dataName = s"data-$batchId-$attempt"
            merged.withColumn("graft_pb", col("graft_bucket"))
              .write.partitionBy("graft_pb")
              .parquet(new java.io.File(store, dataName).getPath)
            toMerge.foreach(b =>
              publishPtr(b, s"$dataName/graft_pb=$b", batchId))
            // GC: data dirs referenced by no pointer are unreachable
            // (readers resolve pointers only) — drop them
            val live = (0 until numBuckets).flatMap(readPtr)
              .map(_._1.split("/")(0)).toSet
            val datas = store.listFiles(
              (_: java.io.File, n: String) => n.startsWith("data-"))
            if (datas != null)
              datas.filterNot(d => live(d.getName)).foreach(rm)
          }
          bAgg.unpersist()
          java.nio.file.Files.write(marker.toPath,
            batchId.toString.getBytes("UTF-8"))
        }
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally if (checkpointDir == null) rm(new java.io.File(ck))
    // readers go through the pointers, never a directory listing:
    // uncommitted data dirs are invisible by construction
    spark.read.parquet(livePaths: _*).drop("graft_bucket")
  }

  /** Stream-STATIC enrichment join — the standard ingest step that tags
    * each live event with its dimension row (user → account, doc →
    * source metadata). The static side is broadcast (re-resolved per
    * microbatch, so a dim-table refresh is picked up without restarting
    * the query); the stream side stays map-side — no shuffle, no state
    * store, nothing to watermark. At 100 TB/day ingest this is the
    * operator that must NOT shuffle the stream, and this shape never
    * does; an oversized dimension belongs in a keyed state join
    * ([[streamStreamRangeJoin]]) or a pre-bucketed static table
    * instead of a broadcast. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey))

  /** Watermarked stream-STREAM range join: pair rows of two live streams
    * with equal keys whose event times lie within ±`tolerance` — the
    * streaming analogue of the batch interval join (the reference is
    * batch-only on both sides). The time-range condition bounds each
    * side's join state, so Spark expires buffered rows as the watermark
    * advances — no unbounded state at 100-TB ingest rates. */
  def streamStreamRangeJoin(left: DataFrame, right: DataFrame,
      keyL: String, keyR: String, tsL: String, tsR: String,
      tolerance: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(tsL, watermark)
    val r = right.withWatermark(tsR, watermark)
    l.join(r, l(keyL) === r(keyR) &&
      l(tsL) >= r(tsR) - expr(s"INTERVAL $tolerance") &&
      l(tsL) <= r(tsR) + expr(s"INTERVAL $tolerance"))
  }
}

/** The manifest-pointer files of [[StreamingOps.upsertAggStore]]'s
  * store, with writer fencing. Pointer payload:
  * `"<relative data path>\t<batchId>\t<writer epoch>"` (legacy 2-field
  * pointers read as epoch 0). Epochs are acquired per store open by
  * ATOMICALLY creating a numbered `epoch-<n>` marker file
  * (`Files.createFile`, retrying upward on
  * FileAlreadyExistsException) — two drivers opening the store
  * near-simultaneously can never share an epoch, so exactly one of
  * them is fenced. A publish carrying an epoch OLDER than the
  * bucket's current pointer throws
  * ([[PointerStore.StaleWriterException]]): the zombie-driver fence.
  * The publish check-then-move pair is not atomic against a
  * concurrent racing publish (the store is single-writer by
  * contract; see the upsertAggStore scaladoc) — with unique epochs
  * the loser of any near-simultaneous takeover is deterministically
  * the lower epoch, which the fence rejects on its next publish. */
private[graft] final class PointerStore(store: java.io.File) {
  import java.nio.file.{Files, StandardCopyOption}

  private val epochFile = new java.io.File(store, "epoch")

  private def atomicWrite(target: java.io.File, payload: String): Unit = {
    val tmp = new java.io.File(store, s".${target.getName}.tmp")
    Files.write(tmp.toPath, payload.getBytes("UTF-8"))
    Files.move(tmp.toPath, target.toPath,
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Epoch currently recorded for the store (0 = never opened):
    * the highest claimed `epoch-<n>` marker, falling back to the
    * legacy single `epoch` file written by pre-marker stores. */
  def currentEpoch(): Long = {
    val markers = store.listFiles()
    val fromMarkers =
      if (markers == null) 0L
      else markers.iterator.map(_.getName)
        .filter(_.startsWith("epoch-"))
        .flatMap(n => scala.util.Try(n.stripPrefix("epoch-").toLong).toOption)
        .foldLeft(0L)(math.max)
    val fromLegacy =
      if (!epochFile.exists()) 0L
      else new String(Files.readAllBytes(epochFile.toPath), "UTF-8")
        .trim.toLong
    math.max(fromMarkers, fromLegacy)
  }

  /** Claim the next writer epoch: atomically create the `epoch-<n>`
    * marker, retrying upward while another opener holds n — concurrent
    * opens are guaranteed DISTINCT epochs (createFile is atomic on
    * POSIX and object-store-backed NFS alike), so equal-epoch
    * double-ownership (both writers unfenced) cannot arise. Markers
    * below the claimed epoch are garbage-collected best-effort; the
    * claimed marker itself is the durable record. */
  def acquireEpoch(): Long = {
    var e = currentEpoch() + 1L
    var claimed = false
    while (!claimed) {
      try {
        Files.createFile(new java.io.File(store, s"epoch-$e").toPath)
        claimed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => e += 1L
      }
    }
    // legacy single-file record for downgrade readers; informational
    // only (the marker is authoritative), so best-effort
    try atomicWrite(epochFile, e.toString)
    catch { case _: java.io.IOException => () }
    val stale = store.listFiles()
    if (stale != null) stale.iterator
      .filter { f =>
        val n = f.getName
        n.startsWith("epoch-") &&
          scala.util.Try(n.stripPrefix("epoch-").toLong)
            .toOption.exists(_ < e)
      }
      .foreach(f => f.delete()) // best-effort GC
    e
  }

  /** `(relative data path, batchId, writer epoch)` of bucket `b`'s
    * published pointer, if any. */
  def readPtr(b: Int): Option[(String, Long, Long)] = {
    val f = new java.io.File(store, s"ptr-$b")
    if (!f.exists()) None
    else new String(Files.readAllBytes(f.toPath), "UTF-8")
      .split("\t") match {
        case Array(rel, bid) => Some((rel, bid.toLong, 0L))
        case Array(rel, bid, ep) => Some((rel, bid.toLong, ep.toLong))
        case other => throw new IllegalStateException(
          s"corrupt pointer ptr-$b: ${other.mkString("\\t")}")
      }
  }

  /** Atomically publish bucket `b` → (`rel`, `bid`) under `epoch`,
    * refusing to roll back a pointer a NEWER writer published. */
  def publishPtr(b: Int, rel: String, bid: Long, epoch: Long): Unit = {
    readPtr(b).foreach { case (_, curBid, curEpoch) =>
      if (curEpoch > epoch)
        throw new PointerStore.StaleWriterException(
          s"stale writer (epoch $epoch) fenced: bucket $b is owned by " +
            s"a newer writer (epoch $curEpoch, batch $curBid) — this " +
            "driver must stop")
    }
    atomicWrite(new java.io.File(store, s"ptr-$b"), s"$rel\t$bid\t$epoch")
  }
}

private[graft] object PointerStore {
  final class StaleWriterException(msg: String)
    extends IllegalStateException(msg)
}
