package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.promql.PromPlanner

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * Two blocks:
  *  - the full SparkEntry suite over SPARK_GRAFT_SF_DIR — MIN of 3 timed
  *    passes per query (the r4 driver artifact recorded 2-3.5x phantom
  *    regressions on one-shot cold timings under neighbor contention; the
  *    first pass doubles as warmup and the min absorbs it)
  *  - the reference's QueryInMemoryBenchmark scenarios (BASELINE.md): 100
  *    series x 720 samples @ 10s, 4 PromQL range queries over 55 min @
  *    step 150s, plus the 8000-series hi-cardinality variant — 1 warmup +
  *    5 timed iterations, MINIMUM reported (least-interference estimate on
  *    a shared box), names prefixed `base_`/`hic_`.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one tiny action first so session/codegen warmup isn't billed to the
    // alphabetically-first timed block
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // Scenarios FIRST, on a fresh JIT: running the full suite beforehand
    // pollutes HotSpot profiles at the shared codegen-runtime call sites
    // (hundreds of generated classes -> megamorphic dispatch), which was
    // measured to inflate kernel CPU time ~1.8x instance-wide. The
    // scenarios are the cross-round comparable, so they get clean state;
    // the single-pass suite timings absorb the pollution instead.
    val baseline = benchScenarios(spark, nSeries = 100, prefix = "base_") ++
      benchScenarios(spark, nSeries = 8000, prefix = "hic_")
    spark.catalog.clearCache()
    System.gc()

    var failed = List.empty[String]
    // suite + the real-corpus sketch operators (correctness-gated on
    // fixtures, but their scale shape is timed here every round)
    val suite = (SparkEntry.queries ++ graft.queries.PipelineQueries.benchDefs)
      .toSeq.sortBy(_._1).map { case (name, fn) =>
      // min-of-3: one-shot cold timings produced phantom cross-round
      // regressions under neighbor contention (r4 postmortem); pass 1 is
      // the implicit warmup and the min is the least-interference estimate
      var best = Double.MaxValue
      var ok = true
      var i = 0
      while (ok && i < 3) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name; ok = false }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      // a failed run must never masquerade as a fast one
      name -> (if (ok) best else -1.0)
    }

    // The same 100-series block again at the END (warm JIT, post-suite):
    // base_ vs basepost_ separates JIT/profile-ordering effects from real
    // kernel regressions — round-2 flagged base_ "regressing" ~1.5x when
    // the block moved before the suite; if basepost_ sits at the old floor
    // while base_ is higher, the gap is ordering, not a regression.
    val basePost = benchScenarios(spark, nSeries = 100, prefix = "basepost_")

    val all = suite ++ baseline ++ basePost
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = all.collect { case (_, v) if v >= 0 => v }.sum
    val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** The 4 reference benchmark queries over synthetic gauge series
    * (QueryInMemoryBenchmark.scala:29-135 shape). */
  def benchScenarios(spark: SparkSession, nSeries: Int, prefix: String): Seq[(String, Double)] = {
    val t0 = 1704067200000L
    val nSamples = 720
    val stepMs = 10000L
    val series = spark.range(nSeries)
    val samples = series.crossJoin(spark.range(nSamples).withColumnRenamed("id", "k"))
      .select(
        lit("heap_usage0").as("metric"),
        map(lit("instance"), col("id").cast("string"),
            lit("_ws_"), lit("demo"), lit("_ns_"), lit("App-2")).as("tags"),
        (lit(t0) + col("k") * stepMs).as("ts"),
        (sin(col("id") * 0.7 + col("k") * 0.05) * 100 + 500).as("value"),
        (col("id") * 100000 + col("k")).as("__tie"))
      .cache()
    samples.count() // materialize outside timing

    val end = t0 + nSamples * stepMs
    val start = end - 55 * 60000L
    val step = 150000L
    val ctx = PromPlanner.Ctx(spark, samples, start, end, step)

    val queries = Seq(
      "raw_selector" -> """heap_usage0{_ws_="demo",_ns_="App-2"}""",
      "sum_rate" -> """sum(rate(heap_usage0{_ws_="demo",_ns_="App-2"}[5m]))""",
      "quantile" -> """quantile(0.75, heap_usage0{_ws_="demo",_ns_="App-2"})""",
      "sum_over_time" -> """sum_over_time(heap_usage0{_ws_="demo",_ns_="App-2"}[5m])""")

    val out = queries.map { case (name, q) =>
      PromPlanner.queryRange(ctx, q).count() // warmup (plan + codegen)
      val times = (1 to 5).map { _ =>
        val s0 = System.nanoTime()
        PromPlanner.queryRange(ctx, q).count()
        (System.nanoTime() - s0) / 1e9
      }
      // min of 5: the least-interference estimate — this box shows 2x
      // swings from neighbor CPU contention, which median-of-3 let through
      (prefix + name) -> times.min
    }
    samples.unpersist()
    out
  }
}
