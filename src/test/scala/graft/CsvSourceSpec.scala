package graft

import org.apache.spark.sql.types._

import java.nio.file.Files

/** CSV-source parity: the reference's primary fixtures are CSV external
  * tables (integration_test.rs:24-38) — the interval join must work
  * identically over a CSV scan. */
class CsvSourceSpec extends SparkTestBase {

  import spark.implicits._

  test("ORC round-trip preserves rows; scan prunes columns and pushes filters") {
    val dir = Files.createTempDirectory("graft_orc").toFile.getPath
    val df = (1L to 100L).map(i => (i, s"s${i % 4}", 10L * i))
      .toDF("id", "grp", "w")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == 100L)
    val q = back.where($"w" > 500L).select("grp", "w")
    val scan = q.queryExecution.executedPlan.toString
    // column pruning: the ORC reader must not read `id`
    assert(scan.contains("ReadSchema: struct<grp:string,w:bigint>"), scan)
    assert(scan.contains("PushedFilters: [IsNotNull(w), GreaterThan(w,500)"), scan)
    assert(q.count() == 50L)
  }

  test("reads.csv × targets.csv through the interval join (16 rows)") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val readsCsv =
      """contig,pos_start,pos_end
        |chr1,150,250
        |chr1,190,300
        |chr1,300,501
        |chr1,500,700
        |chr1,22000,22300
        |chr1,15000,15000
        |chr2,150,250
        |chr2,190,300
        |chr2,300,500
        |chr2,500,700
        |chr2,22000,22300
        |chr2,15000,15000""".stripMargin
    val targetsCsv =
      """contig,pos_start,pos_end
        |chr1,100,190
        |chr1,200,290
        |chr1,400,600
        |chr1,10000,20000
        |chr1,22100,22100
        |chr2,100,190
        |chr2,200,290
        |chr2,400,600
        |chr2,10000,20000
        |chr2,22100,22100""".stripMargin
    Files.writeString(new java.io.File(dir, "reads.csv").toPath, readsCsv)
    Files.writeString(new java.io.File(dir, "targets.csv").toPath, targetsCsv)
    val schema = StructType(Seq(
      StructField("contig", StringType), StructField("pos_start", IntegerType),
      StructField("pos_end", IntegerType)))
    def readCsv(name: String) = spark.read.option("header", "true")
      .schema(schema).csv(new java.io.File(dir, name).getAbsolutePath)
    val a = readCsv("targets.csv").select($"contig".as("ac"),
      $"pos_start".as("as_"), $"pos_end".as("ae"))
    val b = readCsv("reads.csv").select($"contig".as("bc"),
      $"pos_start".as("bs"), $"pos_end".as("be"))
    val df = a.join(b, $"ac" === $"bc" && $"as_" <= $"be" && $"ae" >= $"bs")
    assert(df.queryExecution.executedPlan.toString.contains("IntervalJoinExec"))
    assert(df.count() == 16) // golden count, integration_test.rs:42-65
  }
}
