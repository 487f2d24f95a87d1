package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{PeriodicSamples, RangeFns}
import graft.promql.PromPlanner

/** Dev probe (r17): decompose the scenario-block query cost — scan+label
  * expression vs key serialization vs shuffle+kernel — on the 8000-series
  * hic fixture, to direct the §1.1 empirical loop before touching the
  * planner's key scheme. */
object ScenProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
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

    // 0. ground truth: the Bench scenario block itself
    graft.Bench.benchScenarios(spark, nSeries = 8000, prefix = "probe_")
      .foreach { case (k, v) => println(f"PROBE bench $k $v%.3f") }

    // 1. the full query (what hic_sum_rate times)
    time("full sum_rate      ") {
      PromPlanner.queryRange(ctx,
        """sum(rate(heap_usage0{_ws_="demo",_ns_="App-2"}[5m]))""").count()
    }
    time("rate only          ") {
      PromPlanner.queryRange(ctx,
        """rate(heap_usage0{_ws_="demo",_ns_="App-2"}[5m])""").count()
    }
    time("full raw_selector  ") {
      PromPlanner.queryRange(ctx,
        """heap_usage0{_ws_="demo",_ns_="App-2"}""").count()
    }

    // 2. selector expression cost alone: filter + labels map + JSON key,
    //    no shuffle (noop sink per guide §1.4)
    val labels = map_concat(map(lit("__name__"), col("metric")), col("tags"))
    val keyed = samples
      .filter(col("metric") === "heap_usage0" &&
        col("tags")("_ws_") === "demo" && col("tags")("_ns_") === "App-2")
      .select(to_json(array_sort(map_entries(labels))).as("__key"),
        col("ts"), col("value"), col("__tie"))
    time("selector+jsonkey   ") { noop(keyed) }

    val hkeyed = samples
      .filter(col("metric") === "heap_usage0" &&
        col("tags")("_ws_") === "demo" && col("tags")("_ns_") === "App-2")
      .select(xxhash64(to_json(array_sort(map_entries(labels)))).as("__key"),
        col("ts"), col("value"), col("__tie"))
    time("selector+hashkey   ") { noop(hkeyed) }

    // 3. kernel over the string key vs a hashed long key
    time("kernel stringkey   ") {
      PeriodicSamples.viaAggregate(keyed, Seq("__key"), "ts", "value",
        start, end, 150000L, 300000L, RangeFns.byName("rate"),
        tieCol = Some("__tie")).count()
    }
    time("kernel longkey     ") {
      PeriodicSamples.viaAggregate(hkeyed, Seq("__key"), "ts", "value",
        start, end, 150000L, 300000L, RangeFns.byName("rate"),
        tieCol = Some("__tie")).count()
    }
    spark.stop()
    sys.exit(0)
  }
}
