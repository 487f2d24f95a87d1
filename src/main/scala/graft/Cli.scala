package graft

import org.apache.spark.sql.functions._
import graft.model.TsTables
import graft.promql.PromPlanner

/** Command-line query entry point — the analogue of the reference's
  * `filo-cli` surface (SURVEY.md §3.2): `--promql` parse → plan →
  * execute one PromQL string against the events-as-samples table and
  * print the result series; the metadata subcommands mirror filo-cli's
  * `labels` / `labelvalues` / `timeseriesMetadata` modes over the same
  * MetadataOps the HTTP API serves.
  *
  * Usage:
  *   runMain graft.Cli <promql> [sfDir] [startSec] [endSec] [stepSec]
  *   runMain graft.Cli --labels [sfDir]
  *   runMain graft.Cli --labelvalues <label> [sfDir]
  *   runMain graft.Cli --series <matchExpr> [sfDir]
  * Defaults: sfDir=/root/testdata/sf0.001, range = the events span, step 6h.
  */
object Cli {
  private val DefaultSfDir = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        """usage: graft.Cli <promql> [sfDir] [startSec] [endSec] [stepSec]
          |       graft.Cli --labels [sfDir]
          |       graft.Cli --labelvalues <label> [sfDir]
          |       graft.Cli --series <matchExpr> [sfDir]
          |       graft.Cli --cardinality [sfDir]
          |       graft.Cli --delete-series <adminDir> <selector> [startSec endSec]
          |       graft.Cli --clean-tombstones <sinkDir> <adminDir>
          |       graft.Cli --snapshot <snapRoot> <name=dir> [name=dir ...]
          |       graft.Cli --snapshots <snapRoot>
          |       graft.Cli --restore <snapRoot> <id> <name=dir> [name=dir ...]
          |       graft.Cli --snapshot-retain <snapRoot> <keep>
          |       graft.Cli --test <file.test>""".stripMargin)
      sys.exit(2)
    }
    if (args(0).startsWith("--")) { metadataMain(args); return }
    val query = args(0)
    val sfDir = if (args.length > 1) args(1) else DefaultSfDir
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

  /** `--labels` / `--labelvalues <l>` / `--series <match>` (filo-cli's
    * metadata modes), served by the same operators as the HTTP API. */
  private def metadataMain(args: Array[String]): Unit = {
    import graft.operators.MetadataOps
    def sfDirAt(i: Int) = if (args.length > i) args(i) else DefaultSfDir
    val spark = GraftSession.local(Integer.parseInt(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")))
    try args(0) match {
      case "--labels" =>
        MetadataOps.labelNamesList(TsTables.eventsAsSamples(spark, sfDirAt(1)))
          .foreach(println)
      case "--labelvalues" =>
        require(args.length > 1, "--labelvalues needs a label name")
        MetadataOps.labelValues(TsTables.eventsAsSamples(spark, sfDirAt(2)), args(1))
          .collect().map(_.getString(0)).sorted.foreach(println)
      case "--series" =>
        require(args.length > 1, "--series needs a match[] selector expression")
        val samples = TsTables.eventsAsSamples(spark, sfDirAt(2))
        // limit INSIDE the plan: distributed top-k, never a full collect
        MetadataOps.series(samples, Long.MinValue, Long.MaxValue, Seq(args(1)))
          .orderBy(col("metric")).limit(200).collect()
          .foreach(r => println(s"${r.getString(0)}${r.getMap[String, String](1).toSeq.sorted
            .map { case (k, v) => s"""$k="$v"""" }.mkString("{", ",", "}")}"))
      case "--cardinality" =>
        // filo-cli tsCardinality admin mode: per-metric series counts
        // (exact here; the HTTP surface serves the HLL variant)
        MetadataOps.tsCardinalityBreakdown(
            TsTables.eventsAsSamples(spark, sfDirAt(1)), Seq("metric"),
            activeAfterMs = TsTables.EventsEndMs - TsTables.Day, exact = true)
          .orderBy(col("total").desc, col("metric"))
          .collect()
          .foreach(r => println(f"${r.getString(0)}%-30s total=${r.getLong(1)}%8d active=${r.getLong(2)}%8d"))
      case "--test" =>
        // promtool-test-rules analogue for queries: run an upstream-format
        // promqltest `.test` file (load/eval/clear) against THIS engine
        require(args.length > 1, "--test needs a .test file path")
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args(1))), "UTF-8")
        val out = graft.promql.TestCorpus.run(
          spark, graft.promql.TestCorpus.parse(text))
        out.failures.take(50).foreach(f => println(s"FAIL $f"))
        println(s"${out.evalsRun} evals, ${out.failures.size} failures")
        if (out.failures.nonEmpty) { spark.stop(); sys.exit(1) }
      case "--delete-series" =>
        // admin-API analogue without a running server: record a deletion
        // tombstone straight into the registry the API and MaintenanceJob
        // consume (filo-cli-style offline admin)
        require(args.length > 2, "--delete-series needs <adminDir> <selector>")
        val from = if (args.length > 3) args(3).toLong * 1000 else Long.MinValue
        val to = if (args.length > 4) args(4).toLong * 1000 else Long.MaxValue
        val name = graft.operators.Tombstones.write(
          spark, args(1), Seq(args(2)), from, to)
        println(s"tombstone $name recorded in ${args(1)}")
      case "--clean-tombstones" =>
        require(args.length > 2, "--clean-tombstones needs <sinkDir> <adminDir>")
        // layout-dispatching: batch_id= remote-write sinks AND metric=/
        // date= TsLayout stores both purge offline
        val n = graft.operators.Tombstones.purgeAny(spark, args(1), args(2))
        println(s"purged: rewrote $n partition(s) of ${args(1)}")
      case "--snapshot" =>
        // offline twin of /api/v1/admin/tsdb/snapshot: publish a
        // point-in-time, hardlink-cheap copy of the named stores
        require(args.length > 2,
          "--snapshot needs <snapRoot> <name=dir> [name=dir ...]")
        val stores = args.drop(2).toSeq.map { a =>
          require(a.contains("="),
            s"--snapshot stores must be name=dir (got '$a')")
          val Array(n, d) = a.split("=", 2)
          n -> d
        }
        val id = graft.operators.Snapshots.create(spark, args(1), stores)
        println(s"snapshot $id published under ${args(1)}")
      case "--snapshots" =>
        require(args.length > 1, "--snapshots needs <snapRoot>")
        graft.operators.Snapshots.list(spark, args(1)).foreach(println)
      case "--restore" =>
        // snapshot lifecycle's read-back half: verify the _SUCCESS
        // manifest, then hardlink-or-copy the named stores back out
        // (refuses to overwrite an existing destination)
        require(args.length > 3,
          "--restore needs <snapRoot> <id> <name=dir> [name=dir ...]")
        val stores = args.drop(3).toSeq.map { a =>
          require(a.contains("="),
            s"--restore stores must be name=dir (got '$a')")
          val Array(n, d) = a.split("=", 2)
          n -> d
        }
        val (linked, copied) = graft.operators.Snapshots.restore(
          spark, args(1), args(2), stores)
        println(s"restored ${args(2)}: linked=$linked copied=$copied")
      case "--snapshot-retain" =>
        require(args.length > 2, "--snapshot-retain needs <snapRoot> <keep>")
        val dropped = graft.operators.Snapshots.retain(
          spark, args(1), args(2).toInt)
        println(s"retained newest ${args(2)}; deleted: " +
          (if (dropped.isEmpty) "(none)" else dropped.mkString(", ")))
      case other =>
        System.err.println(s"unknown subcommand: $other"); sys.exit(2)
    } finally spark.stop()
  }
}
