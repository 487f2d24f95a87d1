package graft.tools

import org.apache.spark.sql.functions._
import graft.promql.PromPlanner

/** Scale rehearsal for the staleness-marker instant cutoff
  * ([[graft.promql.PromPlanner]] periodicWithStaleCutoff): measures the
  * instant-query cost over a fixed store as the number of MARKED series
  * grows (0 = the marker-free single-pass plan, then 1 / 10 / k marked).
  *
  * The 100-TB property under test: the cutoff's last-live-timestamp
  * kernel pass is bounded by a broadcast semi-join on the marker series
  * keys, so its input is O(marked series' samples) — one dead target must
  * cost a key-set broadcast, not a second full scan per instant query.
  * Expected shape: a single step from the marker-free plan to the
  * marker-bearing plan (the tiny cutTs pass + two grid-sized joins),
  * then FLAT as the marked count grows 100x.
  *
  * Usage: `sbt "runMain graft.tools.StaleCutoffRehearsal [series]"`.
  */
object StaleCutoffRehearsal {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val series = if (args.nonEmpty) args(0).toInt else 5000
    val samplesPer = 360
    val t0 = 1704067200000L
    val stepMs = 10000L

    val live = spark.range(series.toLong * samplesPer)
      .select(
        concat(lit("m"), (col("id") % series).cast("string")).as("metric"),
        map(lit("job"), lit("bench")).as("tags"),
        (lit(t0) + (col("id") / series) * stepMs).as("ts"),
        (col("id") % 97).cast("double").as("value"))
      .cache()
    live.count()
    val end = t0 + samplesPer * stepMs

    def instant(df: org.apache.spark.sql.DataFrame): Double = {
      val ctx = PromPlanner.Ctx(spark, df, end, end, stepMs,
        lookbackMs = 120000L)
      val q = PromPlanner.queryRange(ctx, """{job="bench"}""")
      q.count() // warm plan
      (1 to 3).map { _ =>
        val s0 = System.nanoTime()
        q.count()
        (System.nanoTime() - s0) / 1e9
      }.min
    }

    println(f"marker-free single-pass: ${instant(live)}%.3f s " +
      s"($series series x $samplesPer samples)")
    Seq(1, 10, 100).foreach { marked =>
      val markers = spark.range(marked.toLong)
        .select(
          concat(lit("m"), col("id").cast("string")).as("metric"),
          map(lit("job"), lit("bench")).as("tags"),
          // NEWER than every live sample (last live = end - stepMs):
          // the dead target's marker lands after its final scrape
          lit(end - 5000L).as("ts"),
          lit(Double.NaN).as("value"),
          lit(true).as("__stale"))
      val withMarkers = live.withColumn("__stale", lit(false))
        .unionByName(markers).cache()
      withMarkers.count()
      val t = instant(withMarkers)
      // the marked series must be ABSENT (their marker is newer than
      // their last live sample) and everything else present
      val ctx = PromPlanner.Ctx(spark, withMarkers, end, end, stepMs,
        lookbackMs = 120000L)
      val n = PromPlanner.queryRange(ctx, """{job="bench"}""").count()
      println(f"$marked%4d marked series: $t%.3f s ($n series answer; " +
        s"expected ${series - marked})")
      withMarkers.unpersist()
    }
    live.unpersist()
    spark.stop()
  }
}
