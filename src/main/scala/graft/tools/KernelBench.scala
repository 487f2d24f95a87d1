package graft.tools
import graft._
import graft.operators.{PeriodicSamples, RangeFns}
import org.apache.spark.sql.functions._
object KernelBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = 1704067200000L
    val samples = spark.range(8000).crossJoin(spark.range(720).withColumnRenamed("id", "k"))
      .select(concat(lit("series_"), col("id")).as("skey"),
        (lit(t0) + col("k") * 10000L).as("ts"),
        (sin(col("id") * 0.7 + col("k") * 0.05) * 100 + 500).as("value"),
        col("k").as("tie"))
      .cache()
    samples.count()
    val end = t0 + 720 * 10000L
    val start = end - 55 * 60000L
    def time(label: String)(f: => Long): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ => val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }.sorted
      println(s"$label median=${ts(1)}")
    }
    time("groupByKey ") {
      PeriodicSamples(samples, Seq("skey"), "ts", "value", start, end, 150000L, 300000L,
        RangeFns.SumOverTime, tieCol = Some("tie")).count()
    }
    time("viaAggregate") {
      PeriodicSamples.viaAggregate(samples, Seq("skey"), "ts", "value", start, end, 150000L, 300000L,
        RangeFns.SumOverTime, tieCol = Some("tie")).count()
    }
    spark.stop()
  }
}
