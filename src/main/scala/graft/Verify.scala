package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg (local iteration only; the driver passes 2):
    // comma-separated query names to dump instead of the full surface
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val base = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CODEGEN_ONLY=1: run the whole surface with codegen
    // fallback DISABLED — any expression/operator that silently fell
    // back to interpreted mode fails loudly instead. The per-round
    // recorded sweep (CODEGEN_SWEEP_r*.json) runs Verify this way.
    val spark = (if (sys.env.get("SPARK_GRAFT_CODEGEN_ONLY").contains("1"))
        base.config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      else base).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.install(spark)
    new java.io.File(outDir).mkdirs()
    var failed = Vector.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        dumpOne(spark, name, fn, sfDir, outDir)
          .foreach(msg => failed :+= (name -> msg))
      }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${Verify.q(k)}: ${Verify.q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failed.nonEmpty) {
      Files.writeString(Paths.get(s"$outDir/verify_failures.json"),
        failed.map { case (k, v) => s"${Verify.q(k)}: ${Verify.q(v)}" }
          .mkString("{", ",", "}"))
      System.err.println(
        s"[verify] ${failed.size}/${SparkEntry.queries.size} queries FAILED: " +
          failed.map(_._1).mkString(", "))
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Dump one query's result parquet; on ANY throw, FAIL LOUD instead of
    * silently shrinking the surface (round 10: four queries threw at
    * construction and simply vanished from the ledger, which then read
    * as fully green). The failure writes a one-row `graft_verify_error`
    * frame in the query's slot — the oracle compare sees a schema+hash
    * mismatch and the ledger shows an explicit red row, never an
    * absence — and the returned message drives main's non-zero exit.
    * Returns None on success. */
  private[graft] def dumpOne(spark: SparkSession, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String, outDir: String): Option[String] =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      None
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      System.err.println(s"[verify] $name FAILED: $msg")
      import spark.implicits._
      Seq(msg).toDF("graft_verify_error").coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      Some(msg)
    }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL or an error message would
    * otherwise make a strict json.load fail and zero a round's artifact.
    * Shared with [[Bench]]. */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
