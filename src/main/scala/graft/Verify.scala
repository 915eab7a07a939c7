package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL or an issue string would
    * otherwise make the driver's json.load fail and silently zero the
    * round's correctness. Shared by [[Main]]'s JSON-line emitters.
    */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // overwrite-mode only clears the dir on SUCCESS: when outDir is
        // reused across runs, a stale prior-run parquet here would be
        // graded as THIS run's result. Absent dir → the driver records a
        // per-query err, which is the honest signal.
        val stale = Paths.get(outDir, name)
        if (Files.exists(stale)) {
          Files.walk(stale).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
          System.err.println(s"[verify] $name: cleared stale prior output")
        }
      }
    }
    if (failed > 0)
      // exit 0 on purpose: the driver grades per-query (missing dir →
      // that query's err), and a non-zero exit could void the queries
      // that DID succeed — the summary line makes the failure visible.
      System.err.println(s"[verify] $failed quer${if (failed == 1) "y" else "ies"} failed; their output dirs are absent")
    val q = jsonQuote _
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
