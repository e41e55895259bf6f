package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive SQL REPL / file runner over the extension-installed
  * session — the library's counterpart of the reference CLI
  * (`sequila-cli/src/main.rs:33-109`): execute statements from
  * `--file <f>...` then exit, or read from stdin; results print as a
  * table capped at 100 rows by default (the reference's
  * `MaxRows::Limited(100)`), adjustable with `--max-rows N`
  * (`0` = unlimited). `--data <sfDir>` pre-registers the fixture
  * parquet tables as temp views so interval-join SQL runs immediately.
  *
  * Statements are split on `;` outside single/double quotes;
  * `quit`/`exit`/`\q` leaves the REPL. Errors print and the loop
  * continues (file mode exits non-zero on the first failure, matching
  * the reference's fail-fast `exec_from_files`).
  *
  * Usage:
  * {{{
  * sbt "runMain graft.Repl --data /root/testdata/sf0.001"
  * sbt "runMain graft.Repl --file queries.sql --data /root/testdata/sf0.001"
  * }}}
  */
object Repl {
  private case class Cli(files: Vector[String] = Vector.empty,
      data: Option[String] = None, maxRows: Int = 100)

  private def parse(args: List[String], acc: Cli): Cli = args match {
    case Nil => acc
    case "--file" :: rest =>
      val (fs, tail) = rest.span(a => !a.startsWith("--"))
      fs.foreach { f =>
        require(new java.io.File(f).isFile, s"Invalid file '$f'")
      }
      parse(tail, acc.copy(files = acc.files ++ fs))
    case "--data" :: dir :: rest => parse(rest, acc.copy(data = Some(dir)))
    case "--max-rows" :: n :: rest =>
      parse(rest, acc.copy(maxRows = n.toInt))
    case other :: _ =>
      throw new IllegalArgumentException(
        s"unknown argument '$other' (expected --file/--data/--max-rows)")
  }

  /** Split a script into `;`-terminated statements, respecting single
    * and double quotes (a `;` inside a literal does not terminate).
    * Trailing un-terminated text counts as a final statement. */
  private[graft] def splitStatements(text: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (quote != 0) {
        cur += ch
        if (ch == quote) quote = 0
      } else ch match {
        case '\'' | '"' => quote = ch; cur += ch
        case ';' => out += cur.toString; cur.clear()
        case _ => cur += ch
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(s =>
      s.nonEmpty && !s.linesIterator.forall(l =>
        l.trim.isEmpty || l.trim.startsWith("--")))
  }

  /** Run one statement and render its result like `Dataset.show`:
    * a table capped at `maxRows` (`0` = unlimited), with a row-count
    * trailer. Returns the rendered text. */
  private[graft] def execute(spark: SparkSession, sql: String,
      maxRows: Int = 100): String = {
    val df: DataFrame = spark.sql(sql)
    val n = if (maxRows <= 0) Int.MaxValue else maxRows
    org.apache.spark.sql.GraftSqlShim.showString(df, n, truncate = 32)
  }

  def main(args: Array[String]): Unit = {
    val cli = parse(args.toList, Cli())
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-repl")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.install(spark)
    cli.data.foreach(dir => Tables.registerAll(spark, dir))
    println("graft SQL — interval joins + the LLM-pipeline surface. " +
      "Statements end with ';'. quit/exit/\\q to leave.")
    if (cli.files.nonEmpty) {
      cli.files.foreach { f =>
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), "UTF-8")
        splitStatements(text).foreach { st =>
          println(s"graft> $st;")
          try println(execute(spark, st, cli.maxRows))
          catch { case e: Exception =>
            System.err.println(s"ERROR: ${e.getMessage}")
            spark.stop()
            sys.exit(1) // fail fast in file mode, like the reference
          }
        }
      }
    } else {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in))
      val buf = new StringBuilder
      var done = false
      while (!done) {
        print(if (buf.isEmpty) "graft> " else "    -> ")
        Console.flush()
        val line = in.readLine()
        if (line == null) done = true
        else {
          val t = line.trim
          if (buf.isEmpty &&
              (t.equalsIgnoreCase("quit") || t.equalsIgnoreCase("exit") ||
               t == "\\q")) done = true
          else {
            buf.append(line).append('\n')
            val text = buf.toString
            // execute once the buffered text carries a terminator
            if (splitStatements(text).nonEmpty && text.trim.endsWith(";")) {
              splitStatements(text).foreach { st =>
                try println(execute(spark, st, cli.maxRows))
                catch { case e: Exception =>
                  System.err.println(s"ERROR: ${e.getMessage}")
                }
              }
              buf.clear()
            }
          }
        }
      }
    }
    spark.stop()
  }
}
