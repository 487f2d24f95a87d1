package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.TsTables
import graft.operators._

/** PromQL-semantics operator coverage over the `events` stream table
  * (FIXTURES.md §B maps it to the canonical samples model:
  * metric = event_type, label user = user_id, ts epoch-millis, value).
  *
  * Every query runs through the engine's PeriodicSamples kernel (SURVEY.md
  * §2.3) and has a DuckDB oracle built from the SAME window convention
  * ((t-w, t], left-exclusive) and the SAME double-precision formulas, so
  * hash comparison is stable after round(…, 6).
  *
  * Two series granularities:
  *  - per-type (5 dense series)  → rate/irate/deriv/quantile/etc.
  *  - per-(type,user) (sparse)   → *_over_time, last, absent, set ops.
  */
object PromQueries {

  private val S = TsTables.EventsStartMs
  private val E = TsTables.EventsEndMs
  private val H6 = 6 * TsTables.Hour
  private val D1 = TsTables.Day
  private val D3 = 3 * TsTables.Day

  // ---------- Spark-side helpers ----------

  private def ev(s: SparkSession, dir: String): DataFrame = TsTables.events(s, dir)

  private def periodic(df: DataFrame, cols: Seq[String], stepMs: Long, windowMs: Long,
                       fn: RangeFn): DataFrame =
    PeriodicSamples(df, cols, "ts_ms", "value", S, E, stepMs, windowMs, fn,
      tieCol = Some("event_id"))

  private def r6(df: DataFrame): DataFrame =
    df.withColumn("value", round(col("value"), 6))

  private def ordered(df: DataFrame, cols: String*): DataFrame = df.orderBy(cols.map(col): _*)

  // ---------- DuckDB oracle fragments ----------

  /** events normalized to epoch millis. */
  private val EV =
    "SELECT event_type, user_id, event_id, epoch_ns(ts)//1000000 AS ts_ms, value FROM events"

  private def steps(stepMs: Long) =
    s"SELECT unnest(generate_series($S, $E, $stepMs)) AS step_ts"

  /** windowed samples: one row per (step, series, sample in (t-w, t]). */
  private def winSql(seriesCols: Seq[String], stepMs: Long, windowMs: Long): String = {
    val sc = seriesCols.mkString(", ")
    s"""WITH ev AS ($EV),
        stps AS (${steps(stepMs)}),
        win AS (SELECT s.step_ts, $sc, e.ts_ms, e.event_id, e.value
                FROM stps s JOIN ev e
                ON e.ts_ms > s.step_ts - $windowMs AND e.ts_ms <= s.step_ts)"""
  }

  /** simple windowed aggregate oracle. */
  private def overTimeSql(seriesCols: Seq[String], stepMs: Long, windowMs: Long,
                          aggExpr: String): String = {
    val sc = seriesCols.mkString(", ")
    s"""${winSql(seriesCols, stepMs, windowMs)}
        SELECT step_ts, $sc, $aggExpr AS value
        FROM win GROUP BY step_ts, $sc
        ORDER BY step_ts, $sc"""
  }

  /** Prometheus extrapolated rate/increase/delta oracle — the exact formula
    * of RangeFns.extrapolated, with counter correction applied from the
    * scan start when isCounter. */
  private[queries] def extrapolatedSql(seriesCols: Seq[String], stepMs: Long, windowMs: Long,
                                       isCounter: Boolean, isRate: Boolean,
                                       outerAgg: Option[String] = None,
                                       where: Option[String] = None,
                                       selectCols: Option[String] = None): String = {
    val sc = seriesCols.mkString(", ")
    val evSql = s"SELECT * FROM ($EV)${where.map(w => s" WHERE $w").getOrElse("")}"
    val corrected =
      if (isCounter)
        s"""ev1 AS (SELECT *, lag(value) OVER (PARTITION BY $sc ORDER BY ts_ms, event_id) AS pv FROM ev0),
            ev AS (SELECT $sc, ts_ms, event_id,
                     value + sum(CASE WHEN value < pv THEN pv ELSE 0 END)
                             OVER (PARTITION BY $sc ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS cval
                   FROM ev1)"""
      else
        s"ev AS (SELECT $sc, ts_ms, event_id, value AS cval FROM ev0)"
    val zeroClamp =
      if (isCounter)
        s"""CASE WHEN (v2 - v1) > 0 AND v1 >= 0
                  AND (t2 - t1)/1000.0 * (v1 / (v2 - v1)) < (t1 - (step_ts - $windowMs))/1000.0
             THEN (t2 - t1)/1000.0 * (v1 / (v2 - v1))
             ELSE (t1 - (step_ts - $windowMs))/1000.0 END"""
      else s"(t1 - (step_ts - $windowMs))/1000.0"
    val perSec = if (isRate) s" / $windowMs * 1000" else ""
    val base =
      s"""WITH ev0 AS ($evSql),
          $corrected,
          stps AS (${steps(stepMs)}),
          win AS (SELECT s.step_ts, $sc, e.ts_ms, e.event_id, e.cval
                  FROM stps s JOIN ev e
                  ON e.ts_ms > s.step_ts - $windowMs AND e.ts_ms <= s.step_ts),
          win2 AS (SELECT *,
                   row_number() OVER (PARTITION BY step_ts, $sc ORDER BY ts_ms, event_id) AS rna,
                   row_number() OVER (PARTITION BY step_ts, $sc ORDER BY ts_ms DESC, event_id DESC) AS rnd
                   FROM win),
          agg AS (SELECT step_ts, $sc, count(*) AS n,
                    max(CASE WHEN rna=1 THEN cval END) AS v1, max(CASE WHEN rna=1 THEN ts_ms END) AS t1,
                    max(CASE WHEN rnd=1 THEN cval END) AS v2, max(CASE WHEN rnd=1 THEN ts_ms END) AS t2
                  FROM win2 GROUP BY step_ts, $sc
                  HAVING count(*) >= 2 AND max(CASE WHEN rnd=1 THEN ts_ms END) > max(CASE WHEN rna=1 THEN ts_ms END)),
          rates AS (SELECT step_ts, $sc,
                    (v2 - v1) * ((  (t2 - t1)/1000.0
                      + (CASE WHEN ($zeroClamp) < ((t2 - t1)/1000.0/(n - 1))*1.1
                              THEN ($zeroClamp) ELSE ((t2 - t1)/1000.0/(n - 1))/2 END)
                      + (CASE WHEN ((step_ts - t2)/1000.0) < ((t2 - t1)/1000.0/(n - 1))*1.1
                              THEN ((step_ts - t2)/1000.0) ELSE ((t2 - t1)/1000.0/(n - 1))/2 END)
                    ) / ((t2 - t1)/1000.0))$perSec AS value
                    FROM agg)"""
    outerAgg match {
      case None =>
        selectCols match {
          case Some(sel) => s"$base SELECT $sel FROM rates ORDER BY step_ts"
          case None =>
            s"$base SELECT step_ts, $sc, round(value,6) AS value FROM rates ORDER BY step_ts, $sc"
        }
      case Some(agg) =>
        s"$base SELECT step_ts, round($agg(value),6) AS value FROM rates GROUP BY step_ts ORDER BY step_ts"
    }
  }

  // ---------- queries ----------

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q20_sum_over_time_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type", "user_id"), D1, D1, RangeFns.SumOverTime)),
        "step_ts", "event_type", "user_id")),

    "q21_count_over_time_6h" -> ((s, dir) =>
      ordered(periodic(ev(s, dir), Seq("event_type"), H6, H6, RangeFns.CountOverTime),
        "step_ts", "event_type")),

    "q22_avg_over_time_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type", "user_id"), D1, D1, RangeFns.AvgOverTime)),
        "step_ts", "event_type", "user_id")),

    "q23_minmax_over_time_6h" -> ((s, dir) => {
      val mn = periodic(ev(s, dir), Seq("event_type"), H6, H6, RangeFns.MinOverTime)
        .withColumnRenamed("value", "vmin")
      val mx = periodic(ev(s, dir), Seq("event_type"), H6, H6, RangeFns.MaxOverTime)
        .withColumnRenamed("value", "vmax")
      ordered(mn.join(mx, Seq("event_type", "step_ts"))
        .select(col("step_ts"), col("event_type"),
          round(col("vmin"), 6).as("vmin"), round(col("vmax"), 6).as("vmax")),
        "step_ts", "event_type")
    }),

    "q24_last_over_time_6h" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type", "user_id"), H6, H6, RangeFns.LastOverTime)),
        "step_ts", "event_type", "user_id")),

    "q25_changes_6h" -> ((s, dir) =>
      ordered(periodic(ev(s, dir), Seq("event_type"), H6, H6, RangeFns.Changes),
        "step_ts", "event_type")),

    "q26_resets_6h" -> ((s, dir) =>
      ordered(periodic(ev(s, dir), Seq("event_type"), H6, H6, RangeFns.Resets),
        "step_ts", "event_type")),

    "q27_sum_rate_6h" -> ((s, dir) =>
      ordered(
        SeriesAggs.aggregate(
          periodic(ev(s, dir), Seq("event_type"), H6, H6, RangeFns.Rate),
          "sum", Nil)
          .withColumn("value", round(col("value"), 6)),
        "step_ts")),

    "q28_increase_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.Increase)),
        "step_ts", "event_type")),

    "q29_delta_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.Delta)),
        "step_ts", "event_type")),

    "q30_irate_6h" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), H6, H6, RangeFns.Irate)),
        "step_ts", "event_type")),

    "q31_idelta_6h" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), H6, H6, RangeFns.Idelta)),
        "step_ts", "event_type")),

    "q32_deriv_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.Deriv)),
        "step_ts", "event_type")),

    "q33_quantile_over_time_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.QuantileOverTime(0.9))),
        "step_ts", "event_type")),

    "q34_stdvar_over_time_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.StdvarOverTime)),
        "step_ts", "event_type")),

    "q35_zscore_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.ZScore)),
        "step_ts", "event_type")),

    "q36_mad_over_time_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.MadOverTime)),
        "step_ts", "event_type")),

    "q37_absent_over_time_1d" -> ((s, dir) => {
      val e = ev(s, dir)
      val present = periodic(e, Seq("event_type", "user_id"), D1, D1, RangeFns.PresentOverTime)
      val series = e.select(col("event_type"), col("user_id")).distinct()
      val grid = s.range(S, E + 1, D1).select(col("id").as("step_ts"))
      ordered(
        series.crossJoin(grid)
          .join(present, Seq("event_type", "user_id", "step_ts"), "left_anti")
          .withColumn("value", lit(1.0)),
        "step_ts", "event_type", "user_id")
    }),

    "q38_holt_winters_1d" -> ((s, dir) => // oracle: recursive CTE
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.HoltWinters(0.5, 0.3))),
        "step_ts", "event_type")),

    "q39_predict_linear_1d" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.PredictLinear(3600))),
        "step_ts", "event_type")),

    // ----- binary ops between two periodic vectors (per-user daily sums) -----

    "q40_ratio_purchase_view_1d" -> ((s, dir) => {
      val e = ev(s, dir)
      val p = periodic(e.filter(col("event_type") === "purchase"), Seq("user_id"), D1, D1, RangeFns.SumOverTime)
      val v = periodic(e.filter(col("event_type") === "view"), Seq("user_id"), D1, D1, RangeFns.SumOverTime)
      ordered(r6(BinaryOps.join(p, v, "/", Seq("user_id"))), "step_ts", "user_id")
    }),

    "q41_and_1d" -> ((s, dir) => {
      val e = ev(s, dir)
      val p = periodic(e.filter(col("event_type") === "purchase"), Seq("user_id"), D1, D1, RangeFns.SumOverTime)
      val v = periodic(e.filter(col("event_type") === "view"), Seq("user_id"), D1, D1, RangeFns.SumOverTime)
      ordered(r6(BinaryOps.and(p, v, Seq("user_id"))), "step_ts", "user_id")
    }),

    "q42_unless_1d" -> ((s, dir) => {
      val e = ev(s, dir)
      val p = periodic(e.filter(col("event_type") === "purchase"), Seq("user_id"), D1, D1, RangeFns.SumOverTime)
      val v = periodic(e.filter(col("event_type") === "view"), Seq("user_id"), D1, D1, RangeFns.SumOverTime)
      ordered(r6(BinaryOps.unless(p, v, Seq("user_id"))), "step_ts", "user_id")
    }),

    "q43_or_1d" -> ((s, dir) => {
      val e = ev(s, dir)
      val p = periodic(e.filter(col("event_type") === "purchase"), Seq("user_id"), D1, D1, RangeFns.SumOverTime)
      val v = periodic(e.filter(col("event_type") === "signup"), Seq("user_id"), D1, D1, RangeFns.SumOverTime)
      ordered(r6(BinaryOps.or(p, v, Seq("user_id"))), "step_ts", "user_id")
    }),

    "q44_topk_users_1d" -> ((s, dir) => {
      val sums = periodic(ev(s, dir), Seq("event_type", "user_id"), D1, D1, RangeFns.SumOverTime)
      ordered(r6(SeriesAggs.topk(sums, 3, Seq("event_type"), Seq("user_id"))),
        "step_ts", "event_type", "user_id")
    }),

    "q45_agg_family_1d" -> ((s, dir) => {
      // sum/min/max/count/avg/stddev across user-series per type+step
      val sums = periodic(ev(s, dir), Seq("event_type", "user_id"), D1, D1, RangeFns.SumOverTime)
      ordered(
        sums.groupBy(col("step_ts"), col("event_type")).agg(
          round(sum(col("value")), 6).as("vsum"),
          round(min(col("value")), 6).as("vmin"),
          round(max(col("value")), 6).as("vmax"),
          count(col("value")).as("vcount"),
          round(avg(col("value")), 6).as("vavg"),
          round(coalesce(var_pop(col("value")), lit(0.0)), 6).as("vstdvar")),
        "step_ts", "event_type")
    }),

    "q46_instant_math_1d" -> ((s, dir) => {
      val sums = periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.SumOverTime)
      ordered(
        sums.withColumn("value",
          round(InstantFns("clamp_max", InstantFns("sqrt", col("value")), Seq(40.0)) +
                InstantFns("ln", col("value") + lit(1)) * lit(2.0) - lit(100.0), 6)),
        "step_ts", "event_type")
    }),

    "q47_subquery_max_rate_3d" -> ((s, dir) => {
      // max_over_time(rate(value[1d])[3d:1d]) per type: outer window over
      // the inner periodic result, using step_ts as the inner sample ts.
      val inner = periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.Rate)
        .withColumnRenamed("step_ts", "ts_ms")
        .withColumn("event_id", lit(0L))
      ordered(r6(periodic(inner, Seq("event_type"), D1, D3, RangeFns.MaxOverTime)),
        "step_ts", "event_type")
    }),

    "q173_instant_trig_1d" -> ((s, dir) => {
      // trig instant family (upstream promql 3; no reference counterpart):
      // deg/atan/sin/cos/rad composed over windowed sums — codegen'd Spark
      // builtins, mirrored exactly by DuckDB's C-library trig
      val sums = periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.SumOverTime)
      ordered(
        sums.withColumn("value",
          round(InstantFns("deg", InstantFns("atan", col("value"))) +
                InstantFns("sin", InstantFns("rad", col("value"))) *
                InstantFns("cos", InstantFns("rad", col("value"))), 6)),
        "step_ts", "event_type")
    }),

    "q183_ts_of_extrema_1d" -> ((s, dir) => {
      // upstream promql 3.5 experimental ts_of_max/min_over_time: the
      // seconds-timestamp OF the window extreme (ties → earliest sample,
      // matching upstream's strictly-greater champion replacement)
      val tmx = periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.TsOfMaxOverTime)
        .withColumnRenamed("value", "ts_max")
      val tmn = periodic(ev(s, dir), Seq("event_type"), D1, D1, RangeFns.TsOfMinOverTime)
        .withColumnRenamed("value", "ts_min")
      ordered(tmx.join(tmn, Seq("event_type", "step_ts"))
        .select(col("step_ts"), col("event_type"),
          round(col("ts_max"), 6).as("ts_max"), round(col("ts_min"), 6).as("ts_min")),
        "step_ts", "event_type")
    }),

    "q184_ts_of_last_6h" -> ((s, dir) =>
      ordered(r6(periodic(ev(s, dir), Seq("event_type", "user_id"), H6, H6,
        RangeFns.TsOfLastOverTime)),
        "step_ts", "event_type", "user_id"))
  )

  // ---------- oracles ----------

  def oracles: Map[String, String] = Map(

    "q20_sum_over_time_1d" ->
      overTimeSql(Seq("event_type", "user_id"), D1, D1, "round(sum(value),6)"),

    "q21_count_over_time_6h" ->
      overTimeSql(Seq("event_type"), H6, H6, "CAST(count(value) AS DOUBLE)"),

    "q22_avg_over_time_1d" ->
      overTimeSql(Seq("event_type", "user_id"), D1, D1, "round(sum(value)/count(value),6)"),

    "q23_minmax_over_time_6h" ->
      s"""${winSql(Seq("event_type"), H6, H6)}
          SELECT step_ts, event_type, round(min(value),6) AS vmin, round(max(value),6) AS vmax
          FROM win GROUP BY 1,2 ORDER BY 1,2""",

    "q24_last_over_time_6h" ->
      s"""${winSql(Seq("event_type", "user_id"), H6, H6)}
          SELECT step_ts, event_type, user_id, round(value,6) AS value
          FROM (SELECT *, row_number() OVER (PARTITION BY step_ts, event_type, user_id
                                             ORDER BY ts_ms DESC, event_id DESC) AS rn FROM win)
          WHERE rn = 1 ORDER BY step_ts, event_type, user_id""",

    "q25_changes_6h" ->
      s"""WITH ev0 AS ($EV),
          ev AS (SELECT event_type, ts_ms, event_id, value,
                        lag(value) OVER w AS pv, lag(ts_ms) OVER w AS pts
                 FROM ev0 WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id)),
          stps AS (${steps(H6)})
          SELECT s.step_ts, e.event_type,
                 CAST(sum(CASE WHEN e.pts IS NOT NULL AND e.pts > s.step_ts - $H6
                                AND e.value <> e.pv THEN 1 ELSE 0 END) AS DOUBLE) AS value
          FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $H6 AND e.ts_ms <= s.step_ts
          GROUP BY 1,2 ORDER BY 1,2""",

    "q26_resets_6h" ->
      s"""WITH ev0 AS ($EV),
          ev AS (SELECT event_type, ts_ms, event_id, value,
                        lag(value) OVER w AS pv, lag(ts_ms) OVER w AS pts
                 FROM ev0 WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id)),
          stps AS (${steps(H6)})
          SELECT s.step_ts, e.event_type,
                 CAST(sum(CASE WHEN e.pts IS NOT NULL AND e.pts > s.step_ts - $H6
                                AND e.value < e.pv THEN 1 ELSE 0 END) AS DOUBLE) AS value
          FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $H6 AND e.ts_ms <= s.step_ts
          GROUP BY 1,2 ORDER BY 1,2""",

    "q27_sum_rate_6h" ->
      extrapolatedSql(Seq("event_type"), H6, H6, isCounter = true, isRate = true,
        outerAgg = Some("sum")),

    "q28_increase_1d" ->
      extrapolatedSql(Seq("event_type"), D1, D1, isCounter = true, isRate = false),

    "q29_delta_1d" ->
      extrapolatedSql(Seq("event_type"), D1, D1, isCounter = false, isRate = false),

    "q30_irate_6h" ->
      s"""${winSql(Seq("event_type"), H6, H6)},
          win2 AS (SELECT *, row_number() OVER (PARTITION BY step_ts, event_type
                                                ORDER BY ts_ms DESC, event_id DESC) AS rnd FROM win),
          agg AS (SELECT step_ts, event_type,
                    max(CASE WHEN rnd=1 THEN value END) AS v1, max(CASE WHEN rnd=1 THEN ts_ms END) AS t1,
                    max(CASE WHEN rnd=2 THEN value END) AS v2, max(CASE WHEN rnd=2 THEN ts_ms END) AS t2
                  FROM win2 GROUP BY 1,2 HAVING count(*) >= 2)
          SELECT step_ts, event_type,
                 round((CASE WHEN v1 < v2 THEN v1 ELSE v1 - v2 END) / ((t1 - t2)/1000.0), 6) AS value
          FROM agg WHERE t1 > t2 ORDER BY 1,2""",

    "q31_idelta_6h" ->
      s"""${winSql(Seq("event_type"), H6, H6)},
          win2 AS (SELECT *, row_number() OVER (PARTITION BY step_ts, event_type
                                                ORDER BY ts_ms DESC, event_id DESC) AS rnd FROM win)
          SELECT step_ts, event_type,
                 round(max(CASE WHEN rnd=1 THEN value END) - max(CASE WHEN rnd=2 THEN value END), 6) AS value
          FROM win2 GROUP BY 1,2 HAVING count(*) >= 2 ORDER BY 1,2""",

    "q32_deriv_1d" ->
      s"""${winSql(Seq("event_type"), D1, D1)}
          SELECT step_ts, event_type,
                 round((sum(((ts_ms - step_ts)/1000.0) * value) - sum((ts_ms - step_ts)/1000.0) * sum(value) / count(*))
                     / (sum(((ts_ms - step_ts)/1000.0) * ((ts_ms - step_ts)/1000.0)) - sum((ts_ms - step_ts)/1000.0) * sum((ts_ms - step_ts)/1000.0) / count(*)), 6) AS value
          FROM win GROUP BY 1,2 HAVING count(*) >= 2 ORDER BY 1,2""",

    "q33_quantile_over_time_1d" ->
      overTimeSql(Seq("event_type"), D1, D1, "round(quantile_cont(value, 0.9),6)"),

    "q34_stdvar_over_time_1d" ->
      overTimeSql(Seq("event_type"), D1, D1,
        "round(sum(value*value)/count(*) - (sum(value)/count(*))*(sum(value)/count(*)),6)"),

    "q35_zscore_1d" ->
      s"""${winSql(Seq("event_type"), D1, D1)},
          lastv AS (SELECT step_ts, event_type, value AS lv
                    FROM (SELECT *, row_number() OVER (PARTITION BY step_ts, event_type
                                                       ORDER BY ts_ms DESC, event_id DESC) AS rn FROM win)
                    WHERE rn = 1),
          stats AS (SELECT step_ts, event_type, sum(value)/count(*) AS mean,
                           sqrt(sum(value*value)/count(*) - (sum(value)/count(*))*(sum(value)/count(*))) AS sd
                    FROM win GROUP BY 1,2)
          SELECT s.step_ts, s.event_type, round((l.lv - s.mean) / s.sd, 6) AS value
          FROM stats s JOIN lastv l USING (step_ts, event_type)
          WHERE s.sd > 0 ORDER BY 1,2""",

    "q36_mad_over_time_1d" ->
      s"""${winSql(Seq("event_type"), D1, D1)},
          med AS (SELECT step_ts, event_type, quantile_cont(value, 0.5) AS m
                  FROM win GROUP BY 1,2)
          SELECT w.step_ts, w.event_type, round(quantile_cont(abs(w.value - med.m), 0.5),6) AS value
          FROM win w JOIN med USING (step_ts, event_type)
          GROUP BY w.step_ts, w.event_type, med.m ORDER BY 1,2""",

    "q37_absent_over_time_1d" ->
      s"""WITH ev AS ($EV),
          srs AS (SELECT DISTINCT event_type, user_id FROM ev),
          stps AS (${steps(D1)}),
          grid AS (SELECT s.step_ts, r.event_type, r.user_id FROM stps s CROSS JOIN srs r),
          present AS (SELECT DISTINCT s.step_ts, e.event_type, e.user_id
                      FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts)
          SELECT g.step_ts, g.event_type, g.user_id, 1.0 AS value
          FROM grid g ANTI JOIN present p
            ON g.step_ts = p.step_ts AND g.event_type = p.event_type AND g.user_id = p.user_id
          ORDER BY 1,2,3""",

    "q47_subquery_max_rate_3d" -> {
      val innerRates = extrapolatedSql(Seq("event_type"), D1, D1,
        isCounter = true, isRate = true,
        selectCols = Some("step_ts, event_type, value"))
      s"""WITH inner_rates AS ($innerRates),
          stps2 AS (${steps(D1)})
          SELECT s.step_ts, i.event_type, round(max(i.value),6) AS value
          FROM stps2 s JOIN inner_rates i
            ON i.step_ts > s.step_ts - ${3 * D1} AND i.step_ts <= s.step_ts
          GROUP BY 1,2 ORDER BY 1,2"""
    },

    "q38_holt_winters_1d" ->
      s"""WITH RECURSIVE ev AS ($EV),
          stps AS (${steps(D1)}),
          win AS (SELECT s.step_ts, e.event_type, e.ts_ms, e.event_id, e.value
                  FROM stps s JOIN ev e
                  ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts),
          win2 AS (SELECT *,
                     row_number() OVER (PARTITION BY step_ts, event_type
                                        ORDER BY ts_ms, event_id) AS rn,
                     count(*) OVER (PARTITION BY step_ts, event_type) AS n
                   FROM win),
          hw AS (
            SELECT a.step_ts, a.event_type, 1 AS rn, a.n,
                   a.value AS s, b.value - a.value AS b
            FROM win2 a JOIN win2 b
              ON a.step_ts = b.step_ts AND a.event_type = b.event_type
             AND a.rn = 1 AND b.rn = 2
            WHERE a.n >= 2
            UNION ALL
            SELECT w.step_ts, w.event_type, w.rn, h.n,
                   0.5*w.value + 0.5*(h.s + h.b) AS s,
                   0.3*((0.5*w.value + 0.5*(h.s + h.b)) - h.s) + 0.7*h.b AS b
            FROM hw h JOIN win2 w
              ON w.step_ts = h.step_ts AND w.event_type = h.event_type
             AND w.rn = h.rn + 1)
          SELECT step_ts, event_type, round(s, 6) AS value
          FROM hw WHERE rn = n ORDER BY 1, 2""",

    "q39_predict_linear_1d" ->
      s"""${winSql(Seq("event_type"), D1, D1)},
          agg AS (SELECT step_ts, event_type, count(*) AS n,
                    sum((ts_ms - step_ts)/1000.0) AS sx, sum(value) AS sy,
                    sum(((ts_ms - step_ts)/1000.0) * value) AS sxy,
                    sum(((ts_ms - step_ts)/1000.0) * ((ts_ms - step_ts)/1000.0)) AS sx2
                  FROM win GROUP BY 1,2 HAVING count(*) >= 2)
          SELECT step_ts, event_type,
                 round(((sxy - sx*sy/n) / (sx2 - sx*sx/n)) * 3600.0
                       + (sy/n - ((sxy - sx*sy/n) / (sx2 - sx*sx/n)) * sx/n), 6) AS value
          FROM agg ORDER BY 1,2""",

    "q40_ratio_purchase_view_1d" ->
      s"""WITH ev AS ($EV),
          stps AS (${steps(D1)}),
          p AS (SELECT s.step_ts, e.user_id, sum(e.value) AS pv
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'purchase' GROUP BY 1,2),
          v AS (SELECT s.step_ts, e.user_id, sum(e.value) AS vv
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'view' GROUP BY 1,2)
          SELECT p.step_ts, p.user_id, round(p.pv / v.vv, 6) AS value
          FROM p JOIN v USING (step_ts, user_id) ORDER BY 1,2""",

    "q41_and_1d" ->
      s"""WITH ev AS ($EV),
          stps AS (${steps(D1)}),
          p AS (SELECT s.step_ts, e.user_id, sum(e.value) AS value
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'purchase' GROUP BY 1,2),
          v AS (SELECT DISTINCT s.step_ts, e.user_id
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'view')
          SELECT p.step_ts, p.user_id, round(p.value,6) AS value
          FROM p SEMI JOIN v ON p.step_ts = v.step_ts AND p.user_id = v.user_id
          ORDER BY 1,2""",

    "q42_unless_1d" ->
      s"""WITH ev AS ($EV),
          stps AS (${steps(D1)}),
          p AS (SELECT s.step_ts, e.user_id, sum(e.value) AS value
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'purchase' GROUP BY 1,2),
          v AS (SELECT DISTINCT s.step_ts, e.user_id
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'view')
          SELECT p.step_ts, p.user_id, round(p.value,6) AS value
          FROM p ANTI JOIN v ON p.step_ts = v.step_ts AND p.user_id = v.user_id
          ORDER BY 1,2""",

    "q43_or_1d" ->
      s"""WITH ev AS ($EV),
          stps AS (${steps(D1)}),
          p AS (SELECT s.step_ts, e.user_id, sum(e.value) AS value
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'purchase' GROUP BY 1,2),
          v AS (SELECT s.step_ts, e.user_id, sum(e.value) AS value
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'signup' GROUP BY 1,2)
          SELECT step_ts, user_id, round(value,6) AS value FROM (
            SELECT * FROM p
            UNION ALL
            SELECT v.* FROM v ANTI JOIN p ON v.step_ts = p.step_ts AND v.user_id = p.user_id)
          ORDER BY 1,2""",

    "q44_topk_users_1d" ->
      s"""WITH ev AS ($EV),
          stps AS (${steps(D1)}),
          sums AS (SELECT s.step_ts, e.event_type, e.user_id, sum(e.value) AS value
                   FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                   GROUP BY 1,2,3)
          SELECT step_ts, event_type, user_id, round(value,6) AS value
          FROM (SELECT *, row_number() OVER (PARTITION BY event_type, step_ts
                                             ORDER BY value DESC, user_id ASC) AS rk FROM sums)
          WHERE rk <= 3 ORDER BY step_ts, event_type, user_id""",

    "q45_agg_family_1d" ->
      s"""WITH ev AS ($EV),
          stps AS (${steps(D1)}),
          sums AS (SELECT s.step_ts, e.event_type, e.user_id, sum(e.value) AS value
                   FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                   GROUP BY 1,2,3)
          SELECT step_ts, event_type,
                 round(sum(value),6) AS vsum, round(min(value),6) AS vmin,
                 round(max(value),6) AS vmax, count(value) AS vcount,
                 round(avg(value),6) AS vavg,
                 round(coalesce(var_pop(value),0.0),6) AS vstdvar
          FROM sums GROUP BY 1,2 ORDER BY 1,2""",

    "q46_instant_math_1d" ->
      s"""WITH ev AS ($EV),
          stps AS (${steps(D1)}),
          sums AS (SELECT s.step_ts, e.event_type, sum(e.value) AS value
                   FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                   GROUP BY 1,2)
          SELECT step_ts, event_type,
                 round(least(sqrt(value), 40.0) + ln(value + 1) * 2.0 - 100.0, 6) AS value
          FROM sums ORDER BY 1,2""",

    "q173_instant_trig_1d" ->
      s"""WITH ev AS ($EV),
          stps AS (${steps(D1)}),
          sums AS (SELECT s.step_ts, e.event_type, sum(e.value) AS value
                   FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                   GROUP BY 1,2)
          SELECT step_ts, event_type,
                 round(degrees(atan(value)) + sin(radians(value)) * cos(radians(value)), 6) AS value
          FROM sums ORDER BY 1,2""",

    "q183_ts_of_extrema_1d" ->
      s"""${winSql(Seq("event_type"), D1, D1)},
          ext AS (SELECT step_ts, event_type, max(value) AS mxv, min(value) AS mnv
                  FROM win GROUP BY 1,2)
          SELECT w.step_ts, w.event_type,
                 round(min(CASE WHEN w.value = e.mxv THEN w.ts_ms END)/1000.0, 6) AS ts_max,
                 round(min(CASE WHEN w.value = e.mnv THEN w.ts_ms END)/1000.0, 6) AS ts_min
          FROM win w JOIN ext e USING (step_ts, event_type)
          GROUP BY 1,2 ORDER BY 1,2""",

    "q184_ts_of_last_6h" ->
      overTimeSql(Seq("event_type", "user_id"), H6, H6, "round(max(ts_ms)/1000.0,6)")
  )
}
