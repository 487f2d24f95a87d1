package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{PeriodicSamples, RangeFns}
import graft.promql.PromPlanner

/** Dev probe (r17): decompose the scenario-block query cost — scan+label
  * expression vs key serialization vs shuffle+kernel — on the 8000-series
  * hic fixture, to direct the §1.1 empirical loop before touching the
  * planner's key scheme.
  *
  * Run order matters: the first version of this probe built and cached its
  * own fixture BEFORE the bench block and read hic_* at 1.86-1.98 s —
  * i.e. the 1.8x polluted-JIT state Bench.scala documents — so the bench
  * block now runs first on a fresh JIT, and the cumulative stage ladder is
  * interpreted by RATIOS within this (polluted) session, never as absolute
  * seconds. */
object ScenProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 0. ground truth FIRST on a clean JIT: the Bench scenario block itself
    graft.Bench.benchScenarios(spark, nSeries = 8000, prefix = "probe_")
      .foreach { case (k, v) => println(f"PROBE bench $k $v%.3f") }

    val t0 = 1704067200000L
    val nSeries = 8000
    val nSamples = 720
    val samples = spark.range(nSeries)
      .crossJoin(spark.range(nSamples).withColumnRenamed("id", "k"))
      .select(
        lit("heap_usage0").as("metric"),
        map(lit("instance"), col("id").cast("string"),
            lit("_ws_"), lit("demo"), lit("_ns_"), lit("App-2")).as("tags"),
        (lit(t0) + col("k") * 10000L).as("ts"),
        (sin(col("id") * 0.7 + col("k") * 0.05) * 100 + 500).as("value"),
        (col("id") * 100000 + col("k")).as("__tie"))
      .cache()
    samples.count()
    val end = t0 + nSamples * 10000L
    val start = end - 55 * 60000L
    val ctx = PromPlanner.Ctx(spark, samples, start, end, 150000L)

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }.sorted
      println(f"PROBE $label median=${ts(1)}%.3f min=${ts.head}%.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // 1. the full queries (what hic_* times), noop-sunk so nothing prunes
    time("full sum_rate      ") {
      noop(PromPlanner.queryRange(ctx,
        """sum(rate(heap_usage0{_ws_="demo",_ns_="App-2"}[5m]))"""))
    }
    time("full raw_selector  ") {
      noop(PromPlanner.queryRange(ctx,
        """heap_usage0{_ws_="demo",_ns_="App-2"}"""))
    }

    // 2. CUMULATIVE stage ladder over the same cached fixture (noop sink,
    //    guide §1.4): each stage adds one expression/operator so the deltas
    //    attribute cost.
    val filt = samples.filter(col("metric") === "heap_usage0" &&
      col("tags")("_ws_") === "demo" && col("tags")("_ns_") === "App-2")
    time("L0 filter only     ") { noop(filt.select(col("ts"), col("value"), col("__tie"))) }

    val labels = map_concat(map(lit("__name__"), col("metric")), col("tags"))
    time("L1 +entries sort   ") {
      noop(filt.select(array_sort(map_entries(labels)).as("__ke"),
        col("ts"), col("value"), col("__tie")))
    }
    time("L2 +to_json        ") {
      noop(filt.select(to_json(array_sort(map_entries(labels))).as("__key"),
        col("ts"), col("value"), col("__tie")))
    }

    val keyed = filt.select(to_json(array_sort(map_entries(labels))).as("__key"),
      col("ts"), col("value"), col("__tie"))
    val akeyed = filt.select(array_sort(map_entries(labels)).as("__key"),
      col("ts"), col("value"), col("__tie"))

    // 3. shuffle+collect_list only (the kernel's agg input), then kernel
    time("L3 agg stringkey   ") {
      noop(keyed.groupBy(col("__key"))
        .agg(collect_list(col("ts")).as("t"), collect_list(col("value")).as("v")))
    }
    time("L3 agg arraykey    ") {
      noop(akeyed.groupBy(col("__key"))
        .agg(collect_list(col("ts")).as("t"), collect_list(col("value")).as("v")))
    }
    time("L4 kernel stringkey") {
      noop(PeriodicSamples.viaAggregate(keyed, Seq("__key"), "ts", "value",
        start, end, 150000L, 300000L, RangeFns.byName("rate"),
        tieCol = Some("__tie")))
    }
    time("L4 kernel arraykey ") {
      noop(PeriodicSamples.viaAggregate(akeyed, Seq("__key"), "ts", "value",
        start, end, 150000L, 300000L, RangeFns.byName("rate"),
        tieCol = Some("__tie"))
        .withColumn("__key", to_json(col("__key"))))
    }

    // 4. candidate per-row key forms: entries of the concat'd map (option
    //    A: drops per-row to_json only) vs DIRECT entry-array concat with
    //    no intermediate map_concat map (option B)
    val entA = array_sort(map_entries(labels))
    val entB = array_sort(concat(
      array(struct(lit("__name__").as("key"), col("metric").as("value"))),
      map_entries(col("tags"))))
    time("L1a entries-of-map ") {
      noop(filt.select(entA.as("__ke"), col("ts"), col("value"), col("__tie")))
    }
    time("L1b entries-direct ") {
      noop(filt.select(entB.as("__ke"), col("ts"), col("value"), col("__tie")))
    }
    val bkeyed = filt.select(entB.as("__key"), col("ts"), col("value"), col("__tie"))
    time("L4 kernel directkey") {
      noop(PeriodicSamples.viaAggregate(bkeyed, Seq("__key"), "ts", "value",
        start, end, 150000L, 300000L, RangeFns.byName("rate"),
        tieCol = Some("__tie"))
        .withColumn("__key", to_json(col("__key"))))
    }
    spark.stop()
    sys.exit(0)
  }
}
