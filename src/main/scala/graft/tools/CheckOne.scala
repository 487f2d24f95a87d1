package graft.tools

import java.nio.file.{Files, Paths}
import graft.GraftSession

/** Dev helper: run ONE SparkEntry query, write its parquet output and its
  * oracle SQL (plain text) for tools/check_one.py to compare — a fast
  * inner loop against the full check_correctness sweep. */
object CheckOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/check_one"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.oracleSql.get(name) match {
      case Some(sql) => Files.write(Paths.get(s"$outDir/$name.sql"), sql.getBytes("UTF-8"))
      case None => println(s"[check-one] no oracle for $name (rows-only query)")
    }
    spark.stop()
    sys.exit(0) // fixture HTTP servers hold non-daemon threads (see Verify)
  }
}
