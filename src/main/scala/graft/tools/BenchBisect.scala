package graft.tools

import graft.{Bench, GraftSession, SparkEntry}

/** Dev helper: time the hi-cardinality scenarios after running a chosen
  * subset of suite queries, to find what degrades session state. */
object BenchBisect {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("none")
    println("JVMFLAGS maxMem=" + Runtime.getRuntime.maxMemory / (1 << 20) + "m args=" +
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.toString
        .split(",").filter(s => s.contains("Xmx") || s.contains("CodeCache")).mkString(","))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries ++ graft.queries.PipelineQueries.benchDefs
    val subset: Seq[String] = mode match {
      case "none" => Nil
      case "ml" => Seq("q76_ivf_knn", "corpus_ivf_knn")
      case "noml" => all.keys.filterNot(k => k.contains("ivf")).toSeq.sorted
      case "all" | "allbase" => all.keys.toSeq.sorted
    }
    subset.foreach { name =>
      try all(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"$name failed: ${e.getMessage}") }
    }
    spark.catalog.clearCache()
    System.gc()
    val rdds = spark.sparkContext.getPersistentRDDs
    println(s"PERSISTED ${rdds.size} " +
      rdds.values.map(r => s"${r.id}:${r.name}:${r.getStorageLevel.description}").mkString(" | "))
    println("DEFAULT_PAR " + spark.sparkContext.defaultParallelism +
      " SHUFFLE_PARTS " + spark.conf.get("spark.sql.shuffle.partitions"))
    if (mode == "allbase")
      println("BASE " + Bench.benchScenarios(spark, nSeries = 100, prefix = "base_")
        .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    val run = new java.util.concurrent.atomic.AtomicLong
    val cpu = new java.util.concurrent.atomic.AtomicLong
    val gc = new java.util.concurrent.atomic.AtomicLong
    val deser = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          run.addAndGet(m.executorRunTime)
          cpu.addAndGet(m.executorCpuTime / 1000000)
          gc.addAndGet(m.jvmGCTime)
          deser.addAndGet(m.executorDeserializeTime)
        }
      }
    })
    val out = Bench.benchScenarios(spark, nSeries = 8000, prefix = "hic_")
    println(s"METRICS runMs=${run.get} cpuMs=${cpu.get} gcMs=${gc.get} deserMs=${deser.get}")
    println("RESULT " + out.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    spark.stop()
  }
}
