package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Components
import graft.queries.PipelineFixtures

/** Dev probe (r17): per-round cost of the connected-components fixed
  * point — fixed overhead (Catalyst/AQE/stages) vs real shuffle work —
  * on the tiny q99 fixture and a 200k-edge synthetic chain-heavy graph. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }.sorted
      println(f"CCPROBE $label median=${ts(1)}%.3f min=${ts.head}%.3f")
    }

    val tiny = PipelineFixtures.edges(spark).cache()
    tiny.count()
    val (_, r1, c1) = Components.connectedComponentsWithStats(tiny)
    println(s"CCPROBE tiny rounds=$r1 converged=$c1")
    time("cc tiny            ") {
      Components.connectedComponents(tiny).write.format("noop").mode("overwrite").save()
    }

    // 200k edges: 20k chains of length 10 plus random cross-links —
    // several rounds to converge, data still small enough that fixed
    // overhead shows
    val big = spark.range(200000).select(
      (col("id") % 100000L).as("id1"),
      when(col("id") < 100000L, (col("id") % 100000L) + 1L)
        .otherwise(pmod(hash(col("id")).cast("long"), lit(100000L))).as("id2"))
      .cache()
    big.count()
    val (_, r2, c2) = Components.connectedComponentsWithStats(big)
    println(s"CCPROBE big rounds=$r2 converged=$c2")
    time("cc big             ") {
      Components.connectedComponents(big).write.format("noop").mode("overwrite").save()
    }

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("cc tiny noAQE      ") {
      Components.connectedComponents(tiny).write.format("noop").mode("overwrite").save()
    }
    time("cc big  noAQE      ") {
      Components.connectedComponents(big).write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
    sys.exit(0)
  }
}
