package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan dump for the conf-gated containment candidate cap (diagnostic
  * only — the declared q122/q123 never arm the knob). Prints
  * explain("formatted") for containmentDupPairs at cap N so the plan
  * shape claims (cap 1 = declarative partial argmin aggregate, no rank
  * window; cap >= 2 = heap-prune MapPartitions below the rank window)
  * are checkable against a committed artifact.
  *
  * Usage: runMain graft.tools.ContainmentCapPlan [dir] [capN...]
  */
object ContainmentCapPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val caps = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
               else Seq(0, 1, 32)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.install(spark)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    caps.foreach { n =>
      if (n > 0) spark.conf.set(
        graft.operators.Dedup.ContainmentMaxCandidatesConf, n.toString)
      else spark.conf.unset(
        graft.operators.Dedup.ContainmentMaxCandidatesConf)
      println(s"==== containmentDupPairs cap=$n ====")
      graft.operators.Dedup.containmentDupPairs(docs, "doc_id", "text", 0.9)
        .explain("formatted")
    }
    spark.stop()
  }
}
