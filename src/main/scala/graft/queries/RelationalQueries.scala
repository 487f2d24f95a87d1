package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.TsTables

/** Relational/core operator coverage over the driver's TPC-H-ish tables:
  * scan + filter pushdown, hash aggregation, broadcast + shuffle joins,
  * window top-k, distinct metadata shapes, exact quantiles. Every query
  * has a DuckDB oracle with identical column names and rounding.
  *
  * Scale notes: all aggregations here are partial-aggregated map-side by
  * Catalyst; the nation/region/supplier joins broadcast the small side;
  * the topk window partitions by brand (bounded groups, no skew).
  */
object RelationalQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, dir) => {
      TsTables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 3).as("sum_qty"),
          round(sum(col("l_extendedprice")), 3).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 3).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_filter_pushdown_revenue" -> ((s, dir) => {
      TsTables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 3).as("revenue"))
    }),

    "q03_join_mktsegment" -> ((s, dir) => {
      val o = TsTables.orders(s, dir)
      val c = TsTables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 3).as("total_price"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    "q04_multi_join_region" -> ((s, dir) => {
      val su = TsTables.supplier(s, dir)
      val n = TsTables.nation(s, dir)
      val r = TsTables.region(s, dir)
      su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("s_acctbal")), 3).as("total_bal"),
             count(lit(1)).as("n_suppliers"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q05_topk_parts_per_brand" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      TsTables.part(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("p_brand"), col("p_partkey"),
                round(col("p_retailprice"), 3).as("p_retailprice"), col("rk"))
        .orderBy(col("p_brand"), col("rk"))
    }),

    "q06_series_metadata" -> ((s, dir) => {
      TsTables.events(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .orderBy(col("event_type"), col("user_id"))
    }),

    "q07_label_values" -> ((s, dir) => {
      TsTables.events(s, dir)
        .select(col("event_type")).distinct().orderBy(col("event_type"))
    }),

    "q08_ts_cardinality" -> ((s, dir) => {
      TsTables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("card"))
        .orderBy(col("event_type"))
    }),

    "q09_count_values" -> ((s, dir) => {
      TsTables.events(s, dir)
        .groupBy(col("event_type"), round(col("value"), 0).cast("long").as("value_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("value_bucket"))
    }),

    "q11_calendar_fns" -> ((s, dir) => {
      val secs = col("ts_ms") / 1000
      TsTables.events(s, dir).select(col("event_id"),
        graft.operators.InstantFns("month", secs).as("m"),
        graft.operators.InstantFns("hour", secs).as("h"),
        graft.operators.InstantFns("day_of_week", secs).as("dow"),
        graft.operators.InstantFns("days_in_month", secs).as("dim"))
        .orderBy(col("event_id"))
    }),

    "q10_quantile_by_type" -> ((s, dir) => {
      TsTables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.75)), 6).as("p75"),
             round(percentile(col("value"), lit(0.5)), 6).as("p50"))
        .orderBy(col("event_type"))
    }),

    // /api/v1/series with match[] selector filters (reference PartKeysExec
    // label filtering) — two selectors OR together per the Prometheus API
    "q80_series_match" -> ((s, dir) =>
      graft.operators.MetadataOps.series(
        TsTables.eventsAsSamples(s, dir),
        TsTables.EventsStartMs, TsTables.EventsEndMs,
        Seq("""purchase{user=~"1.*"}""", """view{user="7"}"""))
        .select(col("metric"), col("tags")("user").as("user"))
        .orderBy("metric", "user")),

    // hierarchical ts-cardinality with active-vs-total counts (reference
    // TsCardinalities); exact counts here so the oracle can verify the
    // grouping/active semantics — the scale path is the HLL variant
    "q81_ts_cardinality_breakdown" -> ((s, dir) =>
      graft.operators.MetadataOps.tsCardinalityBreakdown(
        TsTables.eventsAsSamples(s, dir), Seq("metric"),
        TsTables.EventsEndMs - 7 * TsTables.Day, exact = true)
        .orderBy("metric")),

    // top-k cardinality hotspots (reference GetTopkCardinality): the k
    // label-path groups owning the most series; exact counts for the
    // oracle, HLL on the scale path like q81
    "q119_topk_cardinality" -> ((s, dir) =>
      graft.operators.MetadataOps.topkCardinality(
        TsTables.eventsAsSamples(s, dir), Seq("metric", "user"), prefix = Nil,
        depth = 1, k = 3, TsTables.EventsEndMs - 7 * TsTables.Day, exact = true)),

    // gap-based sessionization (6 h inactivity): one shuffle on user_id,
    // session boundaries + rollup both inside that partitioning
    "q125_session_stats" -> ((s, dir) =>
      graft.operators.Sessionize.sessionStats(
        TsTables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_ms"), col("value")),
        gapMs = 6L * 3600 * 1000)
        .orderBy(col("user_id"), col("session_idx"))),

    // cardinality quota admission (reference CardinalityTracker trie):
    // per-prefix children quotas over the metric→series shard key, with a
    // per-metric override; deterministic child-key admission order
    "q154_series_quota" -> ((s, dir) => {
      val samples = TsTables.eventsAsSamples(s, dir)
      val cfg = graft.operators.Quota.QuotaConfig(Seq("metric", "user"),
        Seq(4L, 100L), Seq(Seq("click") -> 120L))
      graft.operators.Quota.admit(samples.limit(0), samples, cfg)
        .select(col("__k0").as("metric"), col("__k1").as("user"),
          col("admitted"), col("reject_depth"), col("quota"))
        .orderBy(col("metric"), col("user"))
    }),

    // the operational quota surface (reference QuotaSource / cardinality
    // endpoints): per parent prefix at every depth, children count,
    // applicable quota (override-aware) and remaining headroom
    "q165_quota_state" -> ((s, dir) => {
      val samples = TsTables.eventsAsSamples(s, dir)
      val cfg = graft.operators.Quota.QuotaConfig(Seq("metric", "user"),
        Seq(4L, 100L), Seq(Seq("click") -> 120L))
      graft.operators.Quota.quotaState(samples, cfg)
        .orderBy(col("depth"), col("prefix"))
    }),

    // ordered conversion funnel view -> click -> purchase: earliest step-1
    // time, then earliest later step-2, then earliest later step-3
    "q126_funnel" -> ((s, dir) =>
      graft.operators.Sessionize.funnel(
        TsTables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms")),
        Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))),

    // weekly cohort retention triangle over the events stream
    "q129_cohort_retention" -> ((s, dir) =>
      graft.operators.Sessionize.cohortRetention(
        TsTables.events(s, dir).select(col("user_id"), col("ts_ms")),
        periodMs = 7 * TsTables.Day, originMs = TsTables.EventsStartMs)
        .orderBy(col("cohort"), col("period"))),

    // the dashboard funnel rollup: users per stage + stage-over-stage
    // conversion
    "q130_funnel_report" -> ((s, dir) =>
      graft.operators.Sessionize.funnelReport(
        TsTables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms")),
        Seq("view", "click", "purchase"))
        .orderBy(col("stage"))),

    // where the funnel stalls: per-transition time-to-convert
    // median/p75/max (0.5/0.75 interpolate bit-exactly on ms gaps)
    "q141_funnel_timings" -> ((s, dir) =>
      graft.operators.Sessionize.funnelTimings(
        TsTables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms")),
        Seq("view", "click", "purchase"))
        .orderBy(col("stage"))),

    // series metadata answered from the PART-KEY INDEX (one row per
    // series) instead of a sample-scale scan — with a match[] selector
    // pushed against the index
    "q140_series_indexed" -> ((s, dir) => {
      val idx = graft.operators.MetadataOps.buildSeriesIndex(
        TsTables.eventsAsSamples(s, dir))
      graft.operators.MetadataOps.seriesFromIndex(
          idx, Long.MinValue / 2, Long.MaxValue / 2, Seq("""purchase{user=~"1.*"}"""))
        .select(col("metric").as("event_type"), col("tags")("user").as("user_id"))
        .orderBy(col("event_type"), col("user_id"))
    }),

    // path discovery: most common 3-step event-type sequences inside
    // 6 h sessions (the operator funnels are designed FROM)
    "q136_top_paths" -> ((s, dir) =>
      graft.operators.Sessionize.topPaths(
        TsTables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ms")),
        gapMs = 6L * 3600 * 1000, n = 3, k = 20)
        .orderBy(col("n_occurrences").desc, col("path")))
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),3) AS sum_qty,
         round(sum(l_extendedprice),3) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),3) AS sum_disc_price,
         round(avg(l_quantity),6) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",

    "q02_filter_pushdown_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),3) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q03_join_mktsegment" ->
      """SELECT c_mktsegment, round(sum(o_totalprice),3) AS total_price, count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",

    "q04_multi_join_region" ->
      """SELECT r_name, n_name, round(sum(s_acctbal),3) AS total_bal, count(*) AS n_suppliers
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1,2 ORDER BY 1,2""",

    "q05_topk_parts_per_brand" ->
      """SELECT p_brand, p_partkey, round(p_retailprice,3) AS p_retailprice, rk
         FROM (SELECT p_brand, p_partkey, p_retailprice,
                      row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
               FROM part)
         WHERE rk <= 3 ORDER BY p_brand, rk""",

    "q06_series_metadata" ->
      "SELECT DISTINCT event_type, user_id FROM events ORDER BY 1,2",

    "q07_label_values" ->
      "SELECT DISTINCT event_type FROM events ORDER BY 1",

    "q08_ts_cardinality" ->
      """SELECT event_type, count(DISTINCT user_id) AS card
         FROM events GROUP BY 1 ORDER BY 1""",

    "q09_count_values" ->
      """SELECT event_type, CAST(round(value,0) AS BIGINT) AS value_bucket, count(*) AS n
         FROM events GROUP BY 1,2 ORDER BY 1,2""",

    "q11_calendar_fns" ->
      """SELECT event_id,
                CAST(month(make_timestamp(epoch_ns(ts)//1000)) AS DOUBLE) AS m,
                CAST(hour(make_timestamp(epoch_ns(ts)//1000)) AS DOUBLE) AS h,
                CAST(dayofweek(make_timestamp(epoch_ns(ts)//1000)) AS DOUBLE) AS dow,
                CAST(date_part('day', last_day(make_timestamp(epoch_ns(ts)//1000))) AS DOUBLE) AS dim
         FROM events ORDER BY event_id""",

    "q10_quantile_by_type" ->
      """SELECT event_type,
         round(quantile_cont(value, 0.75),6) AS p75,
         round(quantile_cont(value, 0.5),6) AS p50
         FROM events GROUP BY 1 ORDER BY 1""",

    "q80_series_match" ->
      """SELECT DISTINCT event_type AS metric, CAST(user_id AS VARCHAR) AS "user"
         FROM events
         WHERE (event_type = 'purchase' AND regexp_full_match(CAST(user_id AS VARCHAR), '1.*'))
            OR (event_type = 'view' AND CAST(user_id AS VARCHAR) = '7')
         ORDER BY 1, 2""",

    "q81_ts_cardinality_breakdown" ->
      s"""SELECT event_type AS metric,
                 count(DISTINCT user_id) AS total,
                 count(DISTINCT CASE WHEN epoch_ns(ts)//1000000 >
                   ${TsTables.EventsEndMs - 7 * TsTables.Day} THEN user_id END) AS active
          FROM events GROUP BY 1 ORDER BY 1""",

    "q119_topk_cardinality" ->
      s"""SELECT event_type AS metric,
                 count(DISTINCT user_id) AS total,
                 count(DISTINCT CASE WHEN epoch_ns(ts)//1000000 >
                   ${TsTables.EventsEndMs - 7 * TsTables.Day} THEN user_id END) AS active
          FROM events GROUP BY 1
          ORDER BY total DESC, metric ASC LIMIT 3""",

    "q125_session_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000000 AS ts_ms, value
                    FROM events),
              lagd AS (SELECT *, lag(ts_ms) OVER
                         (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
                       FROM e),
              flg AS (SELECT *, CASE WHEN prev IS NULL OR ts_ms - prev > 21600000
                                     THEN 1 ELSE 0 END AS nw
                      FROM lagd),
              sess AS (SELECT *, CAST(sum(nw) OVER
                         (PARTITION BY user_id ORDER BY ts_ms, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
                       FROM flg)
         SELECT user_id, session_idx, count(*) AS n_events,
                min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
                max(ts_ms) - min(ts_ms) AS duration_ms,
                CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
                  AS sum_value_micro
         FROM sess GROUP BY 1, 2 ORDER BY 1, 2""",

    // trie admission mirror: depth-1 ranks metrics (root quota 4), depth-2
    // ranks each admitted metric's users (quota 100, click overridden to
    // 120); ranks order by the STRING child key exactly like the operator
    "q154_series_quota" ->
      """WITH s AS (SELECT DISTINCT event_type AS metric,
                           CAST(user_id AS VARCHAR) AS usr FROM events),
              mets AS (SELECT metric, row_number() OVER (ORDER BY metric) AS mrn
                       FROM (SELECT DISTINCT metric FROM s)),
              j AS (SELECT s.metric, usr, mrn,
                           row_number() OVER (PARTITION BY s.metric ORDER BY usr) AS rn,
                           CASE WHEN s.metric = 'click' THEN 120 ELSE 100 END AS mq
                    FROM s JOIN mets ON mets.metric = s.metric)
         SELECT metric, usr AS "user",
                CASE WHEN mrn > 4 THEN FALSE WHEN rn > mq THEN FALSE
                     ELSE TRUE END AS admitted,
                CASE WHEN mrn > 4 THEN 1 WHEN rn > mq THEN 2 END AS reject_depth,
                CASE WHEN mrn > 4 THEN CAST(4 AS BIGINT)
                     WHEN rn > mq THEN CAST(mq AS BIGINT) END AS quota
         FROM j ORDER BY metric, usr""",

    // quota-state mirror: distinct shard-key tuples, per-depth child
    // counts, override-aware quotas, clamped headroom
    "q165_quota_state" ->
      """WITH s AS (SELECT DISTINCT event_type AS metric,
                           CAST(user_id AS VARCHAR) AS usr FROM events),
              d1 AS (SELECT CAST(1 AS INT) AS depth, '' AS prefix,
                            CAST(count(DISTINCT metric) AS BIGINT) AS n_children,
                            CAST(4 AS BIGINT) AS quota
                     FROM s),
              d2 AS (SELECT CAST(2 AS INT) AS depth, metric AS prefix,
                            CAST(count(DISTINCT usr) AS BIGINT) AS n_children,
                            CAST(CASE WHEN metric = 'click' THEN 120 ELSE 100 END
                                 AS BIGINT) AS quota
                     FROM s GROUP BY metric)
         SELECT depth, prefix, n_children, quota,
                greatest(quota - n_children, CAST(0 AS BIGINT)) AS headroom
         FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
         ORDER BY depth, prefix""",

    "q126_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000000 AS ts_ms
                    FROM events),
              s1 AS (SELECT user_id, min(ts_ms) AS step1_ms
                     FROM e WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT e.user_id, min(ts_ms) AS step2_ms
                     FROM e JOIN s1 USING (user_id)
                     WHERE event_type = 'click' AND ts_ms > step1_ms GROUP BY 1),
              s3 AS (SELECT e.user_id, min(ts_ms) AS step3_ms
                     FROM e JOIN s2 USING (user_id)
                     WHERE event_type = 'purchase' AND ts_ms > step2_ms GROUP BY 1)
         SELECT s1.user_id, step1_ms, step2_ms, step3_ms,
                1 + CASE WHEN step2_ms IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN step3_ms IS NULL THEN 0 ELSE 1 END AS steps_completed
         FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         ORDER BY s1.user_id""",

    "q129_cohort_retention" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts)//1000000 AS ts_ms FROM events),
              f AS (SELECT user_id, min(ts_ms) AS first_ms FROM e GROUP BY 1),
              j AS (SELECT e.user_id,
                           (f.first_ms - ${TsTables.EventsStartMs}) // ${7 * TsTables.Day} AS cohort,
                           (e.ts_ms - f.first_ms) // ${7 * TsTables.Day} AS period
                    FROM e JOIN f USING (user_id))
         SELECT cohort, period, count(DISTINCT user_id) AS n_users
         FROM j GROUP BY 1, 2 ORDER BY 1, 2""",

    "q130_funnel_report" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000000 AS ts_ms
                    FROM events),
              s1 AS (SELECT user_id, min(ts_ms) AS step1_ms
                     FROM e WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT e.user_id, min(ts_ms) AS step2_ms
                     FROM e JOIN s1 USING (user_id)
                     WHERE event_type = 'click' AND ts_ms > step1_ms GROUP BY 1),
              s3 AS (SELECT e.user_id, min(ts_ms) AS step3_ms
                     FROM e JOIN s2 USING (user_id)
                     WHERE event_type = 'purchase' AND ts_ms > step2_ms GROUP BY 1),
              c AS (SELECT (SELECT count(*) FROM s1) AS n1,
                           (SELECT count(*) FROM s2) AS n2,
                           (SELECT count(*) FROM s3) AS n3)
         SELECT 1 AS stage, 'view' AS step, n1 AS n_users,
                round(n1 / CAST(greatest(n1, 1) AS DOUBLE), 6) AS conv_from_prev FROM c
         UNION ALL
         SELECT 2, 'click', n2, round(n2 / CAST(greatest(n1, 1) AS DOUBLE), 6) FROM c
         UNION ALL
         SELECT 3, 'purchase', n3, round(n3 / CAST(greatest(n2, 1) AS DOUBLE), 6) FROM c
         ORDER BY stage""",

    "q141_funnel_timings" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000000 AS ts_ms
                    FROM events),
              s1 AS (SELECT user_id, min(ts_ms) AS step1_ms
                     FROM e WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT e.user_id, min(ts_ms) AS step2_ms
                     FROM e JOIN s1 USING (user_id)
                     WHERE event_type = 'click' AND ts_ms > step1_ms GROUP BY 1),
              s3 AS (SELECT e.user_id, min(ts_ms) AS step3_ms
                     FROM e JOIN s2 USING (user_id)
                     WHERE event_type = 'purchase' AND ts_ms > step2_ms GROUP BY 1),
              d1 AS (SELECT CAST(step2_ms - step1_ms AS DOUBLE) AS dt
                     FROM s2 JOIN s1 USING (user_id)),
              d2 AS (SELECT CAST(step3_ms - step2_ms AS DOUBLE) AS dt
                     FROM s3 JOIN s2 USING (user_id))
         SELECT 1 AS stage, 'view>click' AS transition, count(*) AS n_converted,
                quantile_cont(dt, 0.5) AS p50_ms, quantile_cont(dt, 0.75) AS p75_ms,
                max(dt) AS max_ms
         FROM d1
         UNION ALL
         SELECT 2, 'click>purchase', count(*), quantile_cont(dt, 0.5),
                quantile_cont(dt, 0.75), max(dt)
         FROM d2
         ORDER BY stage""",

    "q140_series_indexed" ->
      """SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS user_id
         FROM events
         WHERE event_type = 'purchase'
           AND regexp_full_match(CAST(user_id AS VARCHAR), '1.*')
         ORDER BY 1, 2""",

    "q136_top_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts)//1000000 AS ts_ms
                    FROM events),
              lagd AS (SELECT *, lag(ts_ms) OVER
                         (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
                       FROM e),
              flg AS (SELECT *, CASE WHEN prev IS NULL OR ts_ms - prev > 21600000
                                     THEN 1 ELSE 0 END AS nw
                      FROM lagd),
              sess AS (SELECT *, sum(nw) OVER
                         (PARTITION BY user_id ORDER BY ts_ms, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
                       FROM flg),
              seq AS (SELECT user_id, session_idx,
                             list(event_type ORDER BY ts_ms, event_id) AS types
                      FROM sess GROUP BY 1, 2),
              grams AS (SELECT array_to_string(types[i:i+2], '>') AS path
                        FROM seq, UNNEST(generate_series(1, len(types) - 2)) AS g(i)
                        WHERE len(types) >= 3)
         SELECT path, count(*) AS n_occurrences FROM grams GROUP BY path
         ORDER BY n_occurrences DESC, path LIMIT 20"""
  )
}
