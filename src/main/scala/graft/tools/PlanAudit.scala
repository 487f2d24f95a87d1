package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.model.TsTables
import graft.promql.PromPlanner

/** Dev helper: print formatted physical plans for the round's new
  * operator paths so shuffle/pushdown shape can be audited by eye. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = "/root/testdata/sf0.001"
    val S = TsTables.EventsStartMs; val E = TsTables.EventsEndMs
    val D1 = TsTables.Day

    def audit(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      println(s"\n================ $name")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }

    val bctx = PromPlanner.Ctx(spark, TsTables.eventsAsBucketSamples(spark, dir), S, E, D1)
    audit("bucket histogram_quantile")(PromPlanner.queryRange(bctx,
      "histogram_quantile(0.9, sum by (le) (sum_over_time(purchase[1d])))"))

    val samples = TsTables.events(spark, dir).select(
      col("event_type").as("metric"),
      map(lit("type"), col("event_type")).as("tags"),
      col("ts_ms").as("ts"), col("value"), col("event_id").as("__tie"))
      .withColumn("series_type",
        when(col("metric") === "view", "delta").otherwise("counter"))
    val mctx = PromPlanner.Ctx(spark, samples, S, E, 6 * TsTables.Hour)
    audit("mixed-schema rate dispatch")(PromPlanner.queryRange(mctx,
      """rate({__name__=~"purchase|view"}[6h])"""))

    val uctx = PromPlanner.Ctx(spark, TsTables.eventsAsSamples(spark, dir), S, E, D1)
    audit("vec / scalar(expr)")(PromPlanner.queryRange(uctx,
      "sum_over_time(purchase[1d]) / scalar(sum(sum_over_time(view[1d])))"))

    audit("limit(3, ...)")(PromPlanner.queryRange(uctx,
      "limit(3, sum_over_time(purchase[1d]))"))
    spark.stop()
  }
}
