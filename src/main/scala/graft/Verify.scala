package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // --oracles-only: dump oracle_sql.json without starting Spark, so
    // tools can DESCRIBE-sweep all oracles (e.g. the HUGEINT guard) fast
    val oraclesOnly = args.length > 2 && args(2) == "--oracles-only"
    // --only=q1,q2: restrict the dump to named queries (local iteration)
    val only: Option[Set[String]] = args.collectFirst {
      case a if a.startsWith("--only=") =>
        a.stripPrefix("--only=").split(",").toSet
    }
    new java.io.File(outDir).mkdirs()
    if (!oraclesOnly) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      SparkEntry.queries
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
      spark.stop()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // hard exit: HTTP-round-trip fixtures (q178/q179) keep a JDK
    // HttpServer running for the session, and its dispatcher thread is
    // non-daemon — without an explicit exit the forked JVM parks in
    // DestroyJavaVM forever and the driver's timeout eats the round
    sys.exit(0)
  }
}
