package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.model.TsTables
import graft.promql.PromPlanner
import graft.queries._

/** Freezes physical-plan quality so regressions in pushdown/broadcast/
  * shuffle shape fail loudly — the properties that matter at 100 TB, not
  * just at test scale. */
class PlanQualitySpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("selective filters reach the parquet scan") {
    val p = plan(RelationalQueries.defs("q02_filter_pushdown_revenue")(spark, dir))
    p should include("PushedFilters: [IsNotNull(l_shipdate)")
    // column pruning: only needed columns in ReadSchema
    p should include("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate")
  }

  test("small dimension tables broadcast") {
    val p = plan(RelationalQueries.defs("q04_multi_join_region")(spark, dir))
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("PromQL kernel plans one exchange into MapPartitions, with time filter pushed") {
    val samples = TsTables.eventsAsTypeSamples(spark, dir)
    val ctx = PromPlanner.Ctx(spark, samples,
      TsTables.EventsStartMs, TsTables.EventsEndMs, 6 * TsTables.Hour)
    val df = PromPlanner.queryRange(ctx, "rate(purchase[6h])")
    df.count() // finalize AQE so the executed plan is the real one
    val p = plan(df)
    // metric filter pushed to scan
    p should include("EqualTo(event_type,purchase)")
    // map-side combine before the shuffle, and exactly one shuffle total
    p should include("partial_collect_list")
    "Exchange hashpartitioning".r.findAllIn(p).length shouldEqual 1
  }

  test("aggregations are partially aggregated before the shuffle") {
    val p = plan(RelationalQueries.defs("q01_pricing_summary")(spark, dir))
    // partial_ functions upstream of the exchange = map-side combine
    p should include("partial_sum")
  }

  private def promCtx = PromPlanner.Ctx(spark, TsTables.eventsAsSamples(spark, dir),
    TsTables.EventsStartMs, TsTables.EventsEndMs, TsTables.Day)

  test("limit(k) plans a distributed top-k, not a single-task global window") {
    val df = PromPlanner.queryRange(promCtx, "limit(3, sum_over_time(purchase[1d]))")
    df.count() // finalize AQE
    val p = plan(df)
    p should include("TakeOrderedAndProject")
    (p should not).include("Window")
  }

  test("simple regex matchers reach the parquet scan as In / StartsWith") {
    val df = PromPlanner.queryRange(promCtx,
      """sum(sum_over_time({__name__=~"purchase|view"}[1d]))""")
    df.count()
    val p = plan(df)
    // alternation-of-literals compiled to IN and pushed to the scan —
    // a raw RLIKE would not push down at all
    p should include("In(event_type, [purchase,view])")
  }

  test("vector binary join carries no forced broadcast hint (AQE decides)") {
    val df = PromPlanner.queryRange(promCtx,
      "sum_over_time(purchase[1d]) / sum_over_time(view[1d])")
    // the analyzed plan would show ResolvedHint if the planner forced a
    // broadcast of either join side; at scale both sides can be huge
    (df.queryExecution.analyzed.toString should not).include("ResolvedHint")
  }

  test("scalar operand of a binary op joins on step_ts only (tiny broadcast)") {
    val df = PromPlanner.queryRange(promCtx,
      "sum_over_time(purchase[1d]) / scalar(sum(sum_over_time(view[1d])))")
    df.count()
    // the scalar side IS hinted (one row per step), and no label-key join
    df.queryExecution.analyzed.toString should include("ResolvedHint")
  }
}
