package graft.http

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import graft.promql.PromPlanner

/** Per-query cost accounting for the Prometheus API — the engine's
  * analogue of the reference's QueryStats / QueryWarnings / PerQueryLimits
  * (`ref:core/src/main/scala/filodb.core/query/QueryContext.scala:27-67,
  * 380-470`): every stats-requesting query response carries
  * `queryStats` ({timeSeriesScanned, dataBytesScanned, samplesScanned,
  * resultBytes, cpuNanos}) and a `warnings` object naming each warn-tier
  * limit the query exceeded.
  *
  * Where the reference threads atomic counters through its ExecPlan tree,
  * this engine reads what Spark already measured: after the result
  * materializes, the executed physical plan's SQL metrics are harvested —
  * leaf-scan `numOutputRows` is the samples scanned (post-pushdown rows
  * actually read) and `filesSize` the bytes of files read after partition
  * pruning (descending through AQE stages, exchange reuse and the
  * collect-guard's InMemoryRelation to reach the real scans).
  * `timeSeriesScanned` comes from the planner seam every raw selector
  * passes through ([[graft.promql.PromPlanner]] registers each selector
  * frame on the hook): one narrow distinct-count job per selector, run
  * only when stats were requested — the same opt-in cost model as
  * Prometheus' own `stats=all`. `cpuNanos` is the measured wall-clock of
  * the evaluation (local-mode upper bound on cpu; the reference's figure
  * is likewise an approximation summed across plan nodes). */
object QueryStatsCollector {

  /** Warn-tier per-query limits (reference defaultWarnLimits,
    * `ref:QueryContext.scala:42-52`): exceeding one adds a warning to the
    * response; it never fails the query (the enforced tier —
    * maxResultSeries / maxSamples — errors instead, and already exists on
    * every endpoint). */
  case class WarnLimits(resultSamples: Long = 50000,
                        samplesScanned: Long = 10000000,
                        dataBytesScanned: Long = 150000000,
                        timeSeriesScanned: Long = 500000)

  case class Stats(timeSeriesScanned: Long, dataBytesScanned: Long,
                   samplesScanned: Long, resultSeries: Long, resultSamples: Long,
                   cpuNanos: Long) {

    /** Reference QueryStatistics JSON shape (group = ns path; this engine
      * has one namespace per API instance, so the group is empty). */
    def statsJson(resultBytes: Long): String =
      s""""queryStats":[{"group":[],"timeSeriesScanned":$timeSeriesScanned,""" +
        s""""dataBytesScanned":$dataBytesScanned,"samplesScanned":$samplesScanned,""" +
        s""""resultBytes":$resultBytes,"cpuNanos":$cpuNanos}]"""

    /** Reference QueryWarningsResponse shape: only the exceeded members
      * appear (a clean query carries an empty object). */
    def warningsJson(limits: WarnLimits): String = {
      val w = Seq(
        (resultSamples > limits.resultSamples) ->
          s""""execPlanSamples":$resultSamples""",
        (samplesScanned > limits.samplesScanned) ->
          s""""rawScannedSamples":$samplesScanned""",
        (dataBytesScanned > limits.dataBytesScanned) ->
          s""""rawScannedBytes":$dataBytesScanned""",
        (timeSeriesScanned > limits.timeSeriesScanned) ->
          s""""timeSeriesScanned":$timeSeriesScanned""")
        .collect { case (true, j) => j }
      s""""warnings":{${w.mkString(",")}}"""
    }
  }

  /** Sum (samplesScanned, dataBytesScanned) over the REAL leaf scans of an
    * executed plan: descends AQE's final plan, materialized query stages,
    * reused exchanges and InMemoryRelation cached plans (the collect-guard
    * persists, so the true scan sits beneath an InMemoryTableScan). */
  def harvestScans(plan: SparkPlan): (Long, Long) = {
    var rows = 0L
    var bytes = 0L
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = if (seen.add(p)) p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case m: InMemoryTableScanExec => walk(m.relation.cachedPlan)
      case leaf if leaf.children.isEmpty =>
        leaf.metrics.get("numOutputRows").foreach(rows += _.value)
        leaf.metrics.get("filesSize").foreach(bytes += _.value)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    (rows, bytes)
  }

  /** Assemble the stats for one answered query: plan-metric harvest +
    * selector-hook series count + result cardinality + eval wall nanos. */
  def assemble(df: DataFrame, hook: PromPlanner.SelectorStats, resultSeries: Long,
               resultSamples: Long, t0Nanos: Long): Stats = {
    val (scanned, bytes) = harvestScans(df.queryExecution.executedPlan)
    Stats(hook.timeSeriesScanned(), bytes, scanned, resultSeries,
      resultSamples, System.nanoTime() - t0Nanos)
  }
}
