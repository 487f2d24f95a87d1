package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Tombstones

/** Deletion-tombstone scale rehearsal: read-side query cost vs STANDING
  * TOMBSTONE COUNT, and the physical purge's partition selectivity.
  *
  * delete_series must stay cheap for every query that does NOT touch the
  * deleted data: each tombstone compiles to one negated pushable
  * predicate on (metric, tags, ts), so the per-query overhead is plan
  * construction (driver-side, linear in record count but microseconds
  * each), not scan work — parquet row-group stats keep the data cost
  * flat. This rehearsal measures an instant PromQL aggregate over an
  * N-series samples store with 0 / 10 / 100 standing tombstones (each
  * hiding one distinct cold series), then times Tombstones.purge and
  * reports how many batch partitions it actually rewrote (the
  * untouched-partition skip is the 100-TB property: a purge pays for
  * the data it deletes, not the store size).
  */
object TombstoneRehearsal {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val series = if (args.nonEmpty) args(0).toInt else 2000
    val samplesPer = 360
    val batches = 16
    val dir = java.nio.file.Files.createTempDirectory("graft-tomb").toString
    val sink = s"$dir/sink"

    // seed: `series` metrics x `samplesPer` points split over `batches`
    // batch partitions (each batch = one time slice, like a real sink)
    val perBatch = samplesPer / batches
    (0 until batches).foreach { b =>
      spark.range(series.toLong * perBatch)
        .select(
          concat(lit("m"), (col("id") % series).cast("string")).as("metric"),
          map(lit("job"), lit("bench")).as("tags"),
          (lit(b.toLong * perBatch * 10000L) +
            (col("id") / series) * 10000L).as("ts"),
          rand(b).as("value"))
        .write.mode("overwrite").parquet(s"$sink/batch_id=$b")
    }
    val atMs = (batches * perBatch - 1) * 10000L
    val q = "sum(sum_over_time(m7{job=\"bench\"}[1h]))"

    def timeQuery(recs: Seq[Tombstones.DeleteRecord]): Double = {
      val df = Tombstones.applyTo(spark.read.parquet(sink), recs)
      val ctx = graft.promql.PromPlanner.Ctx(spark, df, atMs, atMs, 1000L)
      // warm once, then min-of-3
      graft.promql.PromPlanner.queryRange(ctx, q).count()
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.promql.PromPlanner.queryRange(ctx, q).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    println(f"${"tombstones"}%11s ${"query(s)"}%9s")
    val admin = s"$dir/admin"
    var written = 0
    for (target <- Seq(0, 10, 100)) {
      while (written < target) {
        // each tombstone hides one distinct high-numbered (cold) series
        // over a bounded slice — the realistic shape: deletes rarely
        // touch the series a live query reads
        Tombstones.write(spark, admin,
          Seq(s"m${series - 1 - written}"), 0L, 123456L)
        written += 1
      }
      val recs = Tombstones.list(spark, admin)
      println(f"$target%11d ${timeQuery(recs)}%9.3f")
    }

    // purge: the 100 tombstones hit data in batch 0 only (ts <= 123456
    // lands in the first time slice) -> exactly one partition rewritten
    val t0 = System.nanoTime()
    val rewrote = Tombstones.purge(spark, sink, admin)
    val purgeS = (System.nanoTime() - t0) / 1e9
    println(f"purge: rewrote $rewrote of $batches partitions in $purgeS%.2f s " +
      s"(tombstones consumed: ${Tombstones.list(spark, admin).isEmpty})")
    spark.stop()
    sys.exit(0)
  }
}
