package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build a local ~Nx scale slice of the driver testdata (default 10x of
  * sf0.1 -> "sf1") for two-point scale curves: `events` and `documents`
  * are replicated `copies` times with id offsets (document text gets a
  * per-copy suffix so cross-copy rows are NOT exact duplicates — the dup
  * structure stays exactly `copies` x the source's), every other table is
  * byte-copied through. Deterministic, derived only from the driver
  * parquet. Output goes under the repo (default `target/sf1`); nothing
  * outside the repo is touched.
  *
  * Usage: runMain graft.tools.GenScale [srcDir] [dstDir] [copies]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    require(copies >= 1, s"copies must be >= 1 (got $copies)")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events: raw read with nanosAsLong (ts stays a nanos Long; the
    // written slice's plain-INT64 ts round-trips through the same
    // Tables.load branch as the driver's NANOS parquet). Offset ids by
    // k * rowcount — flagship arithmetic (mod/width on event_id) then
    // sees a genuinely larger id domain.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    val nEv = ev.count()
    ev.select(col("*"),
        explode(sequence(lit(0L), lit(copies - 1L))).as("k"))
      .select((col("event_id") + col("k") * nEv).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    // documents: per-copy id stride measured off the source (like
    // events), per-copy text suffix keeps cross-copy texts distinct.
    // ALL generated ids must stay under the +1M/+2M ranges dupCorpus
    // injects — a collision there would silently corrupt the "dup
    // structure stays exactly copies x the source" invariant, so fail
    // loud at generation time instead.
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docStride = docs.agg(max("doc_id")).head().getLong(0) + 1L
    require(docStride * copies <= 1000000L,
      s"doc_id range would reach ${docStride * copies}, colliding with " +
        "the +1M dup-injection id range (dupCorpus); use fewer copies " +
        "or a smaller source")
    val docCols = Seq(
      (col("doc_id") + col("k") * docStride).as("doc_id"),
      when(col("k") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" v"), col("k"))).as("text")) ++
      docs.columns.filterNot(c => c == "doc_id" || c == "text").map(col)
    docs.select(col("*"),
        explode(sequence(lit(0L), lit(copies - 1L))).as("k"))
      .select(docCols: _*)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    // embeddings: per-copy vec_id stride (like documents); the vector
    // content is copied unchanged — PQ/ANN scale entries measure how
    // cost grows with the VECTOR COUNT, and identical copies keep every
    // quantized result per id bit-equal to the source's. Copy ids stay
    // below q48/q96's +2M near-copy injection range (same fail-loud
    // posture as the doc stride).
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embStride = emb.agg(max("vec_id")).head().getLong(0) + 1L
    require(embStride * copies <= 2000000L,
      s"vec_id range would reach ${embStride * copies}, colliding with " +
        "the +2M near-copy injection range; use fewer copies")
    emb.select(col("*"),
        explode(sequence(lit(0L), lit(copies - 1L))).as("k"))
      .select((col("vec_id") + col("k") * embStride).as("vec_id") +:
        emb.columns.filterNot(_ == "vec_id").map(col): _*)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // orders + lineitem: per-copy ORDERKEY stride on both tables, so
    // every copy keeps referential integrity (each copied lineitem
    // points at its copied order) and o_custkey stays within the
    // passthrough customer table — the layout-family scale entries
    // (bucketed join, runtime filter) then see genuinely 10x fact
    // sides against a fixed dimension, the real warehouse shape.
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val ordStride = ord.agg(max("o_orderkey")).head().getLong(0) + 1L
    ord.select(col("*"),
        explode(sequence(lit(0L), lit(copies - 1L))).as("k"))
      .select((col("o_orderkey") + col("k") * ordStride).as("o_orderkey") +:
        ord.columns.filterNot(_ == "o_orderkey").map(col): _*)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    li.select(col("*"),
        explode(sequence(lit(0L), lit(copies - 1L))).as("k"))
      .select((col("l_orderkey") + col("k") * ordStride).as("l_orderkey") +:
        li.columns.filterNot(_ == "l_orderkey").map(col): _*)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    // passthrough tables: byte-copy (each is a single parquet file)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    graft.Tables.names
      .filterNot(n => n == "events" || n == "documents" ||
        n == "embeddings" || n == "orders" || n == "lineitem")
      .foreach { n =>
        Files.copy(Paths.get(s"$src/$n.parquet"),
          Paths.get(s"$dst/$n.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    println(s"GENSCALE wrote $dst (events ${nEv * copies} rows, " +
      s"documents ${docs.count() * copies} rows, $copies copies of $src)")
    spark.stop()
  }
}
