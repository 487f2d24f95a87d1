package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.TsTables
import graft.promql.PromPlanner

/** End-to-end PromQL coverage: every query here is a PromQL STRING going
  * through lexer → parser → planner → kernel → Catalyst, checked against a
  * DuckDB oracle. This is the engine's primary user surface (SURVEY.md
  * §3.1: parse → logical plan → DataFrame materialization).
  */
object PromEngineQueries {

  private val S = TsTables.EventsStartMs
  private val E = TsTables.EventsEndMs
  private val H6 = 6 * TsTables.Hour
  private val D1 = TsTables.Day

  private val EV =
    "SELECT event_type, user_id, event_id, epoch_ns(ts)//1000000 AS ts_ms, value FROM events"

  private def userCtx(s: SparkSession, dir: String, stepMs: Long) =
    PromPlanner.Ctx(s, TsTables.eventsAsSamples(s, dir), S, E, stepMs)

  private def typeCtx(s: SparkSession, dir: String, stepMs: Long) =
    PromPlanner.Ctx(s, TsTables.eventsAsTypeSamples(s, dir), S, E, stepMs)

  private def steps(stepMs: Long) =
    s"SELECT unnest(generate_series($S, $E, $stepMs)) AS step_ts"

  private def sums1d(metric: String) =
    s"""SELECT s.step_ts, e.user_id, sum(e.value) AS value
        FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
        WHERE e.event_type = '$metric' GROUP BY 1,2"""

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q50_promql_sum_rate_6h" -> ((s, dir) =>
      PromPlanner.queryRange(typeCtx(s, dir, H6), "sum(rate(purchase[6h]))")
        .select(col("step_ts"), round(col("value"), 6).as("value"))
        .orderBy("step_ts")),

    "q51_promql_ratio_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "sum_over_time(purchase[1d]) / on(user) sum_over_time(view[1d])")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    "q52_promql_topk_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1), "topk(2, sum_over_time(purchase[1d]))")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    "q53_promql_agg_by_name_1d" -> ((s, dir) =>
      // last_over_time keeps __name__ (unlike sum_over_time, which drops it
      // per Prometheus semantics), so by(__name__) groups per metric
      PromPlanner.queryRange(userCtx(s, dir, D1),
        """sum by (__name__) (last_over_time({__name__=~"purchase|view"}[1d]))""")
        .select(col("labels")("__name__").as("name"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "name")),

    "q54_promql_label_replace_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        """label_replace(sum_over_time(purchase[1d]), "shard", "u$1", "user", "(.*)")""")
        .select(col("labels")("user").as("user"), col("labels")("shard").as("shard"),
          col("step_ts"), round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    "q55_promql_math_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "clamp_max(sqrt(sum_over_time(purchase[1d])), 15) + sum_over_time(purchase[1d]) % 7")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    "q56_promql_unless_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "sum_over_time(purchase[1d]) unless on(user) sum_over_time(view[1d])")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    "q57_promql_absent_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        """absent_over_time(purchase{user="nosuchuser"}[1d])""")
        .select(col("labels")("user").as("user"), col("step_ts"), col("value"))
        .orderBy("step_ts")),

    // absent() over an ARBITRARY vector expression (reference
    // AbsentFunctionMapper wraps any vector result): the standard alerting
    // idiom absent(sum(...)) — 1.0 at steps where the child yields nothing,
    // no synthesized labels. user 1's purchases are sparse at 30m windows,
    // so both branches of the step-grid anti-join are exercised.
    "q95_promql_absent_expr" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, H6),
        """absent(sum(sum_over_time(purchase{user="1"}[30m])))""")
        .select(col("step_ts"), col("value"))
        .orderBy("step_ts")),

    // absent_over_time over a SUBQUERY matrix: the outer 1d window scans
    // the wrapped expression's inner evaluations at the bare-step
    // default, the 1-minute evaluation interval (reference SubqueryUtils)
    "q96_promql_absent_over_subquery" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, H6),
        """absent_over_time((sum_over_time(purchase{user="1"}[30m]))[1d:])""")
        .select(col("step_ts"), col("value"))
        .orderBy("step_ts")),

    "q13_promql_offset_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "sum_over_time(purchase[1d] offset 1d)")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    // FiloDB interval-multiple notation: [2i] = 2 x step, offset 1i = 1 x
    // step (reference TimeUnits.scala IntervalMultiple) — at step 1d this
    // is exactly [2d] offset 1d, which the mirror evaluates absolutely
    "q152_promql_interval_multiple" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "sum_over_time(purchase[2i] offset 1i)")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    "q14_promql_regex_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        """sum(sum_over_time(purchase{user=~"1.?"}[1d]))""")
        .select(col("step_ts"), round(col("value"), 6).as("value"))
        .orderBy("step_ts")),

    "q15_promql_group_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "group by (user) (sum_over_time(purchase[1d]))")
        .select(col("labels")("user").as("user"), col("step_ts"), col("value"))
        .orderBy("step_ts", "user")),

    "q16_promql_count_values_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        """count_values("bucket", floor(sum_over_time(purchase[1d]) / 100))""")
        .select(col("labels")("bucket").as("bucket"), col("step_ts"), col("value"))
        .orderBy("step_ts", "bucket")),

    "q58_promql_quantile_1d" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "quantile(0.9, sum_over_time(purchase[1d]))")
        .select(col("step_ts"), round(col("value"), 6).as("value"))
        .orderBy("step_ts")),

    // vector ⊕ scalar(expr): the ScalarOperationMapper path — the scalar
    // side joins on step_ts alone, never on the (empty) label key
    "q17_promql_vec_div_scalar" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "sum_over_time(purchase[1d]) / scalar(sum(sum_over_time(view[1d])))")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    // bare top-level subquery: evaluate the inner expr on the subquery grid
    "q18_promql_toplevel_subquery" -> ((s, dir) => {
      val instant = PromPlanner.Ctx(s, TsTables.eventsAsSamples(s, dir), E, E, D1)
      PromPlanner.queryRange(instant, "sum_over_time(purchase[1d])[3d:1d]")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")
    }),

    // 0-arg time scalar on the step grid, composed into a binary op
    "q19_promql_hour_scalar" -> ((s, dir) =>
      PromPlanner.queryRange(typeCtx(s, dir, H6),
        "sum_over_time(purchase[6h]) + hour() * 100")
        .select(col("step_ts"), round(col("value"), 6).as("value"))
        .orderBy("step_ts")),

    // schema-type dispatch: one query over mixed cumulative-counter and
    // delta-counter series; the planner picks the kernel per series_type
    "q82_promql_mixed_schema_rate" -> ((s, dir) => {
      val samples = TsTables.events(s, dir).select(
        col("event_type").as("metric"),
        map(lit("type"), col("event_type")).as("tags"),
        col("ts_ms").as("ts"), col("value"), col("event_id").as("__tie"))
        .withColumn("series_type",
          when(col("metric") === "view", "delta").otherwise("counter"))
      val ctx = PromPlanner.Ctx(s, samples, S, E, H6)
      PromPlanner.queryRange(ctx, """rate({__name__=~"purchase|view"}[6h])""")
        .select(col("labels")("type").as("type"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "type")
    }),

    // cold-tier routing end to end: days <= boundary served from a 1d
    // ds-gauge downsample (raw withheld), hot tail from raw — answers must
    // equal evaluation over the full raw table
    "q87_promql_tier_routed" -> ((s, dir) => {
      import graft.streaming.Ingest
      val samples = TsTables.eventsAsSamples(s, dir)
      val boundary = S + 15 * D1
      val flat = samples.select(col("series_id"), col("metric"),
        col("tags")("user").as("user"), col("ts"), col("value"))
      // (k*1d, (k+1)*1d] buckets, representative ts = bucket end
      val ds = Ingest.downsample(flat, "1 day", bucketOffset = "1 millisecond")
        .select(col("metric"), map(lit("user"), col("user")).as("tags"),
          (col("ts") - 1).as("ts"),
          col("min"), col("max"), col("sum"), col("count"), col("avg"))
      val hot = samples.filter(col("ts") > boundary)
      val ctx = PromPlanner.Ctx(s, hot, S, E, D1,
        cold = Some(PromPlanner.ColdTier(ds, boundary)))
      PromPlanner.queryRange(ctx, "sum_over_time(purchase[1d])")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")
    }),

    // same tiers, avg_over_time: exercises the routed sum/count division
    "q88_promql_tier_routed_avg" -> ((s, dir) => {
      import graft.streaming.Ingest
      val samples = TsTables.eventsAsSamples(s, dir)
      val boundary = S + 15 * D1
      val flat = samples.select(col("series_id"), col("metric"),
        col("tags")("user").as("user"), col("ts"), col("value"))
      val ds = Ingest.downsample(flat, "1 day", bucketOffset = "1 millisecond")
        .select(col("metric"), map(lit("user"), col("user")).as("tags"),
          (col("ts") - 1).as("ts"),
          col("min"), col("max"), col("sum"), col("count"), col("avg"))
      val hot = samples.filter(col("ts") > boundary)
      val ctx = PromPlanner.Ctx(s, hot, S, E, D1,
        cold = Some(PromPlanner.ColdTier(ds, boundary)))
      PromPlanner.queryRange(ctx, "avg_over_time(purchase[1d])")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")
    }),

    "q94_promql_present" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1), "present_over_time(purchase[1d])")
        .select(col("labels")("user").as("user"), col("step_ts"), col("value"))
        .orderBy("step_ts", "user")),

    // `expr limit N` postfix (FiloDB grammar) -> ApplyLimitFunction: at
    // most N series survive, deterministically the lowest series keys
    // (= lexicographically smallest user label here)
    "q105_promql_limit_postfix" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1), "sum_over_time(purchase[1d]) limit 5")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    // limit_ratio (upstream promql 3, experimental): deterministic
    // hash-split sampling — limit_ratio(r, v) or limit_ratio(r-1, v)
    // must partition v exactly, so the union's cardinality equals the
    // full series count at every step regardless of the hash
    "q176_promql_limit_ratio" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "count(limit_ratio(0.4, sum_over_time(purchase[1d])) or limit_ratio(-0.6, sum_over_time(purchase[1d])))")
        .select(col("step_ts"), round(col("value"), 6).as("value"))
        .orderBy("step_ts")),

    // limitk: at most k series survive per step (all of them when the
    // window holds fewer) — the upstream test contract is the count
    "q177_promql_limitk" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "count(limitk(3, sum_over_time(purchase[1d])))")
        .select(col("step_ts"), round(col("value"), 6).as("value"))
        .orderBy("step_ts")),

    // timestamp() over an instant vector: seconds of each series' latest
    // sample within the lookback at every step
    "q93_promql_timestamp" -> ((s, dir) => {
      val ctx = PromPlanner.Ctx(s, TsTables.eventsAsSamples(s, dir), S, E, D1,
        lookbackMs = D1)
      PromPlanner.queryRange(ctx, "timestamp(purchase)")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")
    }),

    // many-to-one group_left arithmetic with an oracle: per-user purchase
    // sums joined to per-parity view sums on the shared parity label
    "q91_promql_group_left" -> ((s, dir) => {
      val samples = TsTables.events(s, dir).select(
        col("event_type").as("metric"),
        map(lit("user"), col("user_id").cast("string"),
            lit("parity"), (col("user_id") % 2).cast("string")).as("tags"),
        col("ts_ms").as("ts"), col("value"), col("event_id").as("__tie"))
      val ctx = PromPlanner.Ctx(s, samples, S, E, D1)
      PromPlanner.queryRange(ctx,
        "sum_over_time(purchase[1d]) * on(parity) group_left sum by (parity) (sum_over_time(view[1d]))")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")
    }),

    // vector-vector comparison with bool: 0/1 per matched pair
    "q92_promql_bool_cmp" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "sum_over_time(purchase[1d]) > bool on(user) sum_over_time(view[1d])")
        .select(col("labels")("user").as("user"), col("step_ts"), col("value"))
        .orderBy("step_ts", "user")),

    // preagg rewrite end to end: raw WITHHELD, answers must come from a
    // pre-aggregated table retaining only the queried label (user parity)
    "q89_promql_preagg_rewrite" -> ((s, dir) => {
      val ev = TsTables.events(s, dir)
      val pa = ev.groupBy(col("event_type"), (col("user_id") % 2).as("parity"), col("ts_ms"))
        .agg(sum(col("value")).as("value"))
        .select(col("event_type").as("metric"),
          map(lit("parity"), col("parity").cast("string")).as("tags"),
          col("ts_ms").as("ts"), col("value"))
      val emptyRaw = TsTables.eventsAsSamples(s, dir).filter(lit(false))
      val ctx = PromPlanner.Ctx(s, emptyRaw, S, E, D1,
        preagg = Seq(PromPlanner.PreaggTable(pa, Set("parity"))))
      PromPlanner.queryRange(ctx, "sum by (parity) (sum_over_time(purchase[1d]))")
        .select(col("labels")("parity").as("parity"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "parity")
    }),

    // ds-gauge preagg count shape: sum of count_over_time reads the
    // pre-aggregated count column (1h buckets aligned (k,k+1])
    "q90_promql_preagg_count" -> ((s, dir) => {
      val ev = TsTables.events(s, dir)
      val hour = TsTables.Hour
      val pa = ev.groupBy(col("event_type"), (col("user_id") % 2).as("parity"),
          (ceil(col("ts_ms") / hour) * hour).cast("long").as("bts"))
        .agg(min(col("value")).as("min"), max(col("value")).as("max"),
          sum(col("value")).as("sum"), count(lit(1)).cast("double").as("count"))
        .select(col("event_type").as("metric"),
          map(lit("parity"), col("parity").cast("string")).as("tags"),
          col("bts").as("ts"), col("min"), col("max"), col("sum"), col("count"))
      val emptyRaw = TsTables.eventsAsSamples(s, dir).filter(lit(false))
      val ctx = PromPlanner.Ctx(s, emptyRaw, S, E, D1,
        preagg = Seq(PromPlanner.PreaggTable(pa, Set("parity"))))
      PromPlanner.queryRange(ctx, "sum by (parity) (count_over_time(purchase[1d]))")
        .select(col("labels")("parity").as("parity"), col("step_ts"),
          col("value"))
        .orderBy("step_ts", "parity")
    }),

    // or_vector (FiloDB extension): NaN sample values replaced by a scalar
    "q85_promql_or_vector" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "or_vector(sum_over_time(purchase[1d]) * 0 / 0, 42)")
        .select(col("labels")("user").as("user"), col("step_ts"), col("value"))
        .orderBy("step_ts", "user")),

    "q86_promql_label_join" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        """label_join(sum_over_time(purchase[1d]), "combo", "-", "user", "user")""")
        .select(col("labels")("combo").as("combo"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "combo")),

    // @ end(): evaluation pinned to the range end, replicated on the grid
    "q12_promql_at_end" -> ((s, dir) =>
      PromPlanner.queryRange(userCtx(s, dir, D1),
        "sum_over_time(purchase[1d] @ end())")
        .select(col("labels")("user").as("user"), col("step_ts"),
          round(col("value"), 6).as("value"))
        .orderBy("step_ts", "user")),

    // Batch-granularity retention end-to-end (Ingest.dropSinkOlderThan):
    // the events samples land as one batch partition per day; dropping at
    // cutoff S+10d removes exactly the whole-day partitions entirely
    // below it (directory deletes, no rewrites) — what survives must
    // equal DuckDB over events with ts >= cutoff. Fixture once per
    // (session, sfDir); the drop is idempotent so bench repeat passes
    // time the aggregate, not a re-drop.
    "q188_retention_drop" -> ((s, dir) => {
      val sink = retentionSinkCache.computeIfAbsent(dir, _ => {
        val base = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), "q188_sink").toString
        val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        TsTables.eventsAsSamples(s, dir)
          .withColumn("batch_id", ((col("ts") - S) / D1).cast("long"))
          .write.partitionBy("batch_id").parquet(base)
        graft.streaming.Ingest.dropSinkOlderThan(s, base, S + 10 * D1)
        base
      })
      s.read.parquet(sink)
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("vsum"))
        .orderBy("metric")
    })
  )

  private val retentionSinkCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def oracles: Map[String, String] = Map(

    "q50_promql_sum_rate_6h" ->
      PromQueries.extrapolatedSql(Seq("event_type"), H6, H6, isCounter = true, isRate = true,
        where = Some("event_type = 'purchase'"),
        selectCols = Some("step_ts, round(value,6) AS value")),

    "q51_promql_ratio_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          p AS (${sums1d("purchase")}), v AS (${sums1d("view")})
          SELECT CAST(p.user_id AS VARCHAR) AS "user", p.step_ts,
                 round(p.value / v.value, 6) AS value
          FROM p JOIN v ON p.step_ts = v.step_ts AND p.user_id = v.user_id
          ORDER BY p.step_ts, "user"""",

    "q52_promql_topk_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (${sums1d("purchase")})
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts, round(value,6) AS value
          FROM (SELECT *, row_number() OVER (PARTITION BY step_ts
                    ORDER BY value DESC, CAST(user_id AS VARCHAR) ASC) AS rk FROM sums)
          WHERE rk <= 2 ORDER BY step_ts, "user"""",

    "q53_promql_agg_by_name_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          lastv AS (SELECT step_ts, event_type, user_id, value FROM (
                      SELECT s.step_ts, e.*, row_number() OVER (
                        PARTITION BY s.step_ts, e.event_type, e.user_id
                        ORDER BY e.ts_ms DESC, e.event_id DESC) AS rn
                      FROM stps s JOIN ev e
                      ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                      WHERE e.event_type IN ('purchase','view')) WHERE rn = 1)
          SELECT event_type AS name, step_ts, round(sum(value),6) AS value
          FROM lastv GROUP BY 1,2 ORDER BY step_ts, name""",

    "q54_promql_label_replace_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (${sums1d("purchase")})
          SELECT CAST(user_id AS VARCHAR) AS "user",
                 'u' || CAST(user_id AS VARCHAR) AS shard,
                 step_ts, round(value,6) AS value
          FROM sums ORDER BY step_ts, "user"""",

    "q55_promql_math_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (${sums1d("purchase")})
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts,
                 round(least(sqrt(value), 15.0) + fmod(value, 7), 6) AS value
          FROM sums ORDER BY step_ts, "user"""",

    "q56_promql_unless_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          p AS (${sums1d("purchase")}),
          v AS (SELECT DISTINCT s.step_ts, e.user_id
                FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'view')
          SELECT CAST(p.user_id AS VARCHAR) AS "user", p.step_ts, round(p.value,6) AS value
          FROM p ANTI JOIN v ON p.step_ts = v.step_ts AND p.user_id = v.user_id
          ORDER BY p.step_ts, "user"""",

    "q57_promql_absent_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          present AS (SELECT DISTINCT s.step_ts
                      FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                      WHERE e.event_type = 'purchase' AND CAST(e.user_id AS VARCHAR) = 'nosuchuser')
          SELECT 'nosuchuser' AS "user", s.step_ts, 1.0 AS value
          FROM stps s ANTI JOIN present p ON s.step_ts = p.step_ts
          ORDER BY s.step_ts""",

    "q95_promql_absent_expr" ->
      s"""WITH ev AS ($EV), stps AS (${steps(H6)}),
          present AS (SELECT DISTINCT s.step_ts
                      FROM stps s JOIN ev e
                        ON e.ts_ms > s.step_ts - 1800000 AND e.ts_ms <= s.step_ts
                      WHERE e.event_type = 'purchase' AND e.user_id = 1)
          SELECT s.step_ts, 1.0 AS value
          FROM stps s ANTI JOIN present p ON s.step_ts = p.step_ts
          ORDER BY s.step_ts""",

    // bare-step subquery = 1-minute default evaluation interval
    // (reference SubqueryUtils): an inner sample exists at any absolute
    // minute t with an event in (t-30m, t]; for event e those t form
    // [ceil_min(e.ts), e.ts+30m) — present at step T iff that interval
    // intersects the window's minute grid (T-1d, T]
    "q96_promql_absent_over_subquery" ->
      s"""WITH ev AS ($EV), stps AS (${steps(H6)}),
          present AS (SELECT DISTINCT s.step_ts
                      FROM stps s JOIN ev e
                        ON greatest(CAST(ceil(e.ts_ms / 60000.0) AS BIGINT) * 60000,
                                    s.step_ts - 86400000 + 60000)
                           <= least(s.step_ts, ((e.ts_ms + 1799999) // 60000) * 60000)
                      WHERE e.event_type = 'purchase' AND e.user_id = 1)
          SELECT s.step_ts, 1.0 AS value
          FROM stps s ANTI JOIN present p ON s.step_ts = p.step_ts
          ORDER BY s.step_ts""",

    "q13_promql_offset_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (SELECT s.step_ts, e.user_id, sum(e.value) AS value
                   FROM stps s JOIN ev e
                   ON e.ts_ms > s.step_ts - ${2 * D1} AND e.ts_ms <= s.step_ts - $D1
                   WHERE e.event_type = 'purchase' GROUP BY 1,2)
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts, round(value,6) AS value
          FROM sums ORDER BY step_ts, "user"""",

    "q152_promql_interval_multiple" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (SELECT s.step_ts, e.user_id, sum(e.value) AS value
                   FROM stps s JOIN ev e
                   ON e.ts_ms > s.step_ts - ${3 * D1} AND e.ts_ms <= s.step_ts - $D1
                   WHERE e.event_type = 'purchase' GROUP BY 1,2)
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts, round(value,6) AS value
          FROM sums ORDER BY step_ts, "user"""",

    "q14_promql_regex_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)})
          SELECT s.step_ts, round(sum(e.value),6) AS value
          FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
          WHERE e.event_type = 'purchase'
            AND regexp_full_match(CAST(e.user_id AS VARCHAR), '1.?')
          GROUP BY 1 ORDER BY 1""",

    "q15_promql_group_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)})
          SELECT DISTINCT CAST(e.user_id AS VARCHAR) AS "user", s.step_ts, 1.0 AS value
          FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
          WHERE e.event_type = 'purchase'
          ORDER BY step_ts, "user"""",

    "q16_promql_count_values_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (SELECT s.step_ts, e.user_id, sum(e.value) AS value
                   FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                   WHERE e.event_type = 'purchase' GROUP BY 1,2)
          SELECT CAST(CAST(floor(value / 100) AS BIGINT) AS VARCHAR) AS bucket, step_ts,
                 CAST(count(*) AS DOUBLE) AS value
          FROM sums GROUP BY 1,2 ORDER BY step_ts, bucket""",

    "q58_promql_quantile_1d" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (${sums1d("purchase")})
          SELECT step_ts, round(quantile_cont(value, 0.9),6) AS value
          FROM sums GROUP BY 1 ORDER BY 1""",

    "q17_promql_vec_div_scalar" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          p AS (${sums1d("purchase")}),
          t AS (SELECT step_ts, sum(value) AS tv FROM (${sums1d("view")}) GROUP BY 1)
          SELECT CAST(p.user_id AS VARCHAR) AS "user", p.step_ts,
                 round(p.value / COALESCE(t.tv, 'NaN'::DOUBLE), 6) AS value
          FROM p LEFT JOIN t ON p.step_ts = t.step_ts
          ORDER BY p.step_ts, "user"""",

    "q18_promql_toplevel_subquery" ->
      s"""WITH ev AS ($EV),
          stps AS (SELECT unnest(generate_series(${E - 3 * D1}, $E, $D1)) AS step_ts),
          sums AS (${sums1d("purchase")})
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts, round(value,6) AS value
          FROM sums ORDER BY step_ts, "user"""",

    "q19_promql_hour_scalar" ->
      s"""WITH ev AS ($EV), stps AS (${steps(H6)})
          SELECT s.step_ts,
                 round(sum(e.value) + ((s.step_ts // 1000) % 86400) // 3600 * 100, 6) AS value
          FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $H6 AND e.ts_ms <= s.step_ts
          WHERE e.event_type = 'purchase'
          GROUP BY 1 ORDER BY 1""",

    "q82_promql_mixed_schema_rate" -> {
      val counter = PromQueries.extrapolatedSql(Seq("event_type"), H6, H6,
        isCounter = true, isRate = true,
        where = Some("event_type = 'purchase'"),
        selectCols = Some("'purchase' AS type, step_ts, round(value,6) AS value"))
      s"""SELECT type, step_ts, value FROM (
            ($counter)
            UNION ALL
            (WITH ev AS ($EV), stps AS (${steps(H6)})
             SELECT 'view' AS type, s.step_ts,
                    round(sum(e.value) / ${H6 / 1000}, 6) AS value
             FROM stps s JOIN ev e ON e.ts_ms > s.step_ts - $H6 AND e.ts_ms <= s.step_ts
             WHERE e.event_type = 'view' GROUP BY 2)
          ) ORDER BY step_ts, type"""
    },

    "q94_promql_present" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)})
          SELECT DISTINCT CAST(e.user_id AS VARCHAR) AS "user", s.step_ts, 1.0 AS value
          FROM stps s JOIN ev e
          ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
          WHERE e.event_type = 'purchase'
          ORDER BY step_ts, "user"""",

    "q93_promql_timestamp" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          lastts AS (SELECT s.step_ts, e.user_id, max(e.ts_ms) AS mts
                     FROM stps s JOIN ev e
                     ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                     WHERE e.event_type = 'purchase' GROUP BY 1,2)
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts,
                 round(mts / 1000.0, 6) AS value
          FROM lastts ORDER BY step_ts, "user"""",

    "q176_promql_limit_ratio" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          p AS (${sums1d("purchase")})
          SELECT step_ts, round(CAST(count(DISTINCT user_id) AS DOUBLE), 6) AS value
          FROM p GROUP BY step_ts ORDER BY step_ts""",

    "q177_promql_limitk" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          p AS (${sums1d("purchase")})
          SELECT step_ts, round(CAST(LEAST(3, count(DISTINCT user_id)) AS DOUBLE), 6) AS value
          FROM p GROUP BY step_ts ORDER BY step_ts""",

    // limit keeps the 5 lexicographically-smallest series keys; with a
    // constant metric name the key order IS the user label's string order
    "q105_promql_limit_postfix" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          p AS (${sums1d("purchase")}),
          keep AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS u FROM p
                   ORDER BY u LIMIT 5)
          SELECT CAST(p.user_id AS VARCHAR) AS "user", p.step_ts,
                 round(p.value, 6) AS value
          FROM p JOIN keep k ON CAST(p.user_id AS VARCHAR) = k.u
          ORDER BY step_ts, "user"""",

    "q91_promql_group_left" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          p AS (${sums1d("purchase")}),
          v AS (SELECT s.step_ts, e.user_id % 2 AS parity, sum(e.value) AS value
                FROM stps s JOIN ev e
                ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                WHERE e.event_type = 'view' GROUP BY 1,2)
          SELECT CAST(p.user_id AS VARCHAR) AS "user", p.step_ts,
                 round(p.value * v.value, 6) AS value
          FROM p JOIN v ON p.step_ts = v.step_ts AND p.user_id % 2 = v.parity
          ORDER BY p.step_ts, "user"""",

    "q92_promql_bool_cmp" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          p AS (${sums1d("purchase")}), v AS (${sums1d("view")})
          SELECT CAST(p.user_id AS VARCHAR) AS "user", p.step_ts,
                 CASE WHEN p.value > v.value THEN 1.0 ELSE 0.0 END AS value
          FROM p JOIN v ON p.step_ts = v.step_ts AND p.user_id = v.user_id
          ORDER BY p.step_ts, "user"""",

    "q89_promql_preagg_rewrite" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (SELECT s.step_ts, e.user_id % 2 AS parity, sum(e.value) AS value
                   FROM stps s JOIN ev e
                   ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                   WHERE e.event_type = 'purchase' GROUP BY 1,2)
          SELECT CAST(parity AS VARCHAR) AS parity, step_ts, round(value,6) AS value
          FROM sums ORDER BY step_ts, parity""",

    "q90_promql_preagg_count" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          cnts AS (SELECT s.step_ts, e.user_id % 2 AS parity,
                     CAST(count(*) AS DOUBLE) AS value
                   FROM stps s JOIN ev e
                   ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                   WHERE e.event_type = 'purchase' GROUP BY 1,2)
          SELECT CAST(parity AS VARCHAR) AS parity, step_ts, value
          FROM cnts ORDER BY step_ts, parity""",

    "q87_promql_tier_routed" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (${sums1d("purchase")})
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts, round(value,6) AS value
          FROM sums ORDER BY step_ts, "user"""",

    "q88_promql_tier_routed_avg" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          avgs AS (SELECT s.step_ts, e.user_id, avg(e.value) AS value
                   FROM stps s JOIN ev e
                   ON e.ts_ms > s.step_ts - $D1 AND e.ts_ms <= s.step_ts
                   WHERE e.event_type = 'purchase' GROUP BY 1,2)
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts, round(value,6) AS value
          FROM avgs ORDER BY step_ts, "user"""",

    "q85_promql_or_vector" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (${sums1d("purchase")})
          SELECT CAST(user_id AS VARCHAR) AS "user", step_ts, 42.0 AS value
          FROM sums ORDER BY step_ts, "user"""",

    "q86_promql_label_join" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (${sums1d("purchase")})
          SELECT CAST(user_id AS VARCHAR) || '-' || CAST(user_id AS VARCHAR) AS combo,
                 step_ts, round(value,6) AS value
          FROM sums ORDER BY step_ts, combo""",

    "q12_promql_at_end" ->
      s"""WITH ev AS ($EV), stps AS (${steps(D1)}),
          sums AS (SELECT user_id, sum(value) AS value FROM ev
                   WHERE event_type = 'purchase'
                     AND ts_ms > $E - $D1 AND ts_ms <= $E
                   GROUP BY 1)
          SELECT CAST(user_id AS VARCHAR) AS "user", s.step_ts, round(value,6) AS value
          FROM sums CROSS JOIN stps s ORDER BY step_ts, "user"""",

    // retention mirror: whole days below the cutoff are gone, the rest
    // is byte-identical
    "q188_retention_drop" ->
      s"""SELECT event_type AS metric, count(*) AS n,
                 round(sum(value), 6) AS vsum
          FROM (SELECT event_type, value FROM events
                WHERE epoch_ns(ts)//1000000 >= ${S + 10 * D1})
          GROUP BY 1 ORDER BY 1"""
  )
}
