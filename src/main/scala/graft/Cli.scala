package graft

import org.apache.spark.sql.functions._
import graft.model.TsTables
import graft.promql.PromPlanner

/** Command-line query entry point — the analogue of the reference's
  * `filo-cli --promql '…'` surface (SURVEY.md §3.2): parse → plan →
  * execute one PromQL string against the events-as-samples table and
  * print the result series.
  *
  * Usage:
  *   runMain graft.Cli <promql> [sfDir] [startSec] [endSec] [stepSec]
  * Defaults: sfDir=/root/testdata/sf0.001, range = the events span, step 6h.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Cli <promql> [sfDir] [startSec] [endSec] [stepSec]")
      sys.exit(2)
    }
    val query = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val start = if (args.length > 2) args(2).toLong * 1000 else TsTables.EventsStartMs
    val end = if (args.length > 3) args(3).toLong * 1000 else TsTables.EventsEndMs
    val step = if (args.length > 4) args(4).toLong * 1000 else 6 * TsTables.Hour

    val spark = GraftSession.local(Integer.parseInt(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")))
    val samples = TsTables.eventsAsSamples(spark, sfDir)
    val ctx = PromPlanner.Ctx(spark, samples, start, end, step)
    val t0 = System.nanoTime()
    val df = PromPlanner.queryRange(ctx, query)
      .select(col("__key").as("series"), col("step_ts"), col("value"))
      .orderBy("series", "step_ts")
    val rows = df.collect()
    val elapsed = (System.nanoTime() - t0) / 1e9
    rows.take(200).foreach { r =>
      println(f"${r.getString(0)}%-60s ${r.getLong(1)}%14d ${r.getDouble(2)}%18.6f")
    }
    if (rows.length > 200) println(s"... (${rows.length - 200} more rows)")
    println(f"-- ${rows.length} rows in $elapsed%.2f s")
    spark.stop()
  }
}
