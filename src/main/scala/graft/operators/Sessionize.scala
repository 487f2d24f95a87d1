package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization + ordered-funnel analysis over the events stream
  * shape (`user_id`, `ts_ms`, `event_type`, `value`, `event_id`).
  *
  * Everything here is `user_id`-keyed and stays there: sessionization is
  * a running sum over a per-user window behind ONE exchange; the funnel
  * is a per-user conditional min chain (k-1 aggregation rounds for k
  * steps, each on the same key). No global sort, no driver state — the
  * per-user group is the unit of parallelism, so the shape holds at any
  * corpus size (users are the high-cardinality axis; the per-user event
  * list is bounded by retention, the classic sessionization contract).
  * Ordering ties on identical timestamps break on `event_id`, keeping
  * results deterministic across partitionings and engines.
  */
object Sessionize {

  /** Row-level session assignment: a new session starts when the gap to
    * the user's previous event exceeds `gapMs` (first event of a user
    * always starts session 1). Adds `session_idx` (1-based per user). */
  def sessionize(events: DataFrame, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val prev = lag(col("ts_ms"), 1).over(w)
    val isNew = when(prev.isNull || col("ts_ms") - prev > gapMs, 1L).otherwise(0L)
    events.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** The session rollup aggregate list — ONE definition shared with the
    * streaming session_window twin (Ingest.sessionStats), so the two
    * surfaces cannot drift. `tsCol` differs per shape (ts_ms batch, ts
    * samples). */
  private[graft] def sessionAggs(tsCol: String): Seq[Column] = Seq(
    count(lit(1)).as("n_events"),
    min(col(tsCol)).as("start_ms"),
    max(col(tsCol)).as("end_ms"),
    (max(col(tsCol)) - min(col(tsCol))).as("duration_ms"),
    // integer micro-units, rounded per row BEFORE the sum: integer
    // addition is associative, so the rollup is bit-identical across
    // engines and partition orders (a double sum is not — driver-gate
    // convention, see PipelineQueries.meanStrSql / Sampling.dsirSelect)
    sum(round(col("value") * 1e6).cast("long")).as("sum_value_micro"))

  /** Top-k event-type PATHS: n-grams of consecutive event types inside a
    * session, counted corpus-wide — the "how do users actually move
    * through the product" discovery operator that funnels are then built
    * from. The per-session type sequence is assembled inside the same
    * user_id exchange sessionize already pays (array_sort on
    * (ts_ms, event_id, type) structs makes collect_list order-independent
    * and tie-stable); n-gram expansion is map-side; the count groups by
    * short path strings and the ranking is a distributed top-k with a
    * path-string tiebreak so results are engine-stable.
    * Output: (path "a>b>c", n_occurrences). */
  def topPaths(events: DataFrame, gapMs: Long, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, s"a path needs at least 2 steps, got n=$n")
    val seqs = sessionize(events, gapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(typeSeqAgg.as("__evs"))
      .select(transform(col("__evs"), e => e.getField("event_type")).as("__types"))
      .where(size(col("__types")) >= n)
    seqs
      .select(explode(pathGrams(col("__types"), n)).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path").asc)
      .limit(k)
  }

  /** Order-independent per-session event collection and the n-gram
    * expansion — ONE definition shared with the streaming twin
    * (Ingest.sessionPathGrams) so the two surfaces cannot drift. */
  private[graft] def typeSeqAgg: Column =
    array_sort(collect_list(struct(col("ts_ms"), col("event_id"), col("event_type"))))
  private[graft] def pathGrams(types: Column, n: Int): Column =
    transform(sequence(lit(0), size(types) - n),
      i => concat_ws(">", slice(types, i + 1, lit(n))))

  /** Per-session rollup: bounds, duration, event count, value sum. */
  def sessionStats(events: DataFrame, gapMs: Long): DataFrame = {
    val aggs = sessionAggs("ts_ms")
    sessionize(events, gapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Ordered funnel: for `steps` = Seq(a, b, c, ...) find, per user, the
    * earliest occurrence of `a`, then the earliest `b` STRICTLY after it,
    * and so on. Returns one row per user who completed step 1, with
    * `step<i>_ms` (null once the chain breaks) and `steps_completed`.
    *
    * Each stage is one filtered aggregation joined back on `user_id` —
    * k-1 shuffles for a k-step funnel, all on the same key so AQE/exchange
    * reuse co-locates them; nothing is ever collected. */
  def funnel(events: DataFrame, steps: Seq[String],
             withinMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("step1_ms"))
    val chained = steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val prevCol = s"step${i + 1}_ms"
      val thisCol = s"step${i + 2}_ms"
      // conversion window: every later step must land within `withinMs`
      // of the FIRST-TOUCH step-1 time (first-touch attribution — the
      // earliest step-1 is the anchor even if a later one would convert)
      val deadline = withinMs.map(w => col("ts_ms") <= col("step1_ms") + w)
        .getOrElse(lit(true))
      val anchorCols = Seq("user_id", prevCol, "step1_ms").distinct.map(col)
      val nxt = events.filter(col("event_type") === step)
        .join(acc.select(anchorCols: _*), "user_id")
        .where(col("ts_ms") > col(prevCol) && deadline)
        .groupBy(col("user_id")).agg(min(col("ts_ms")).as(thisCol))
      acc.join(nxt.select(col("user_id"), col(thisCol)), Seq("user_id"), "left")
    }
    val stepCols: Seq[Column] = steps.indices.map(i => col(s"step${i + 1}_ms"))
    chained.withColumn("steps_completed",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _))
  }

  /** Aggregate funnel report: users reaching each stage + conversion
    * fraction vs the previous stage — the dashboard rollup over
    * [[funnel]]'s per-user rows (one extra reduce over k columns). */
  def funnelReport(events: DataFrame, steps: Seq[String],
                   withinMs: Option[Long] = None): DataFrame = {
    val f = funnel(events, steps, withinMs)
    val counts = steps.indices.map(i =>
      sum(when(col(s"step${i + 1}_ms").isNotNull, 1L).otherwise(0L)).as(s"__n${i + 1}"))
    val wide = f.agg(counts.head, counts.tail: _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("stage"), lit(step).as("step"),
        col(s"__n${i + 1}").as("n_users"),
        round(col(s"__n${i + 1}") /
          greatest(col(s"__n${math.max(i, 1)}"), lit(1L)).cast("double"), 6)
          .as("conv_from_prev"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Step-transition latency report: for each consecutive funnel step
    * pair, the converting users' median / p75 / max time-to-convert (the
    * "where does the funnel stall" dashboard next to funnelReport's
    * counts). One reduce over the per-user funnel frame. Percentiles are
    * the exact interpolated definition both engines share; 0.5 and 0.75
    * have exact binary fractions, so on integer-ms gaps the interpolation
    * is bit-exact cross-engine (0.9 would not be). */
  def funnelTimings(events: DataFrame, steps: Seq[String],
                    withinMs: Option[Long] = None): DataFrame = {
    require(steps.length >= 2, "funnel timings need at least 2 steps")
    val f = funnel(events, steps, withinMs)
    val aggs = (1 until steps.length).flatMap { i =>
      val dt = s"CAST(step${i + 1}_ms - step${i}_ms AS DOUBLE)"
      Seq(expr(s"count($dt)").as(s"__n$i"),
        expr(s"percentile($dt, 0.5)").as(s"__p50_$i"),
        expr(s"percentile($dt, 0.75)").as(s"__p75_$i"),
        expr(s"max($dt)").as(s"__max$i"))
    }
    val wide = f.agg(aggs.head, aggs.tail: _*)
    val rows = (1 until steps.length).map { i =>
      struct(lit(i).as("stage"),
        lit(s"${steps(i - 1)}>${steps(i)}").as("transition"),
        col(s"__n$i").as("n_converted"),
        col(s"__p50_$i").as("p50_ms"), col(s"__p75_$i").as("p75_ms"),
        col(s"__max$i").as("max_ms"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Cohort retention: users bucketed by first-activity period since
    * `originMs` (the cohort), distinct-counted per (cohort, periods since
    * their own first activity). Two user-keyed aggregations + one
    * broadcast-sized rollup — the events stream shuffles once to find
    * first-touch and once for the distinct count; nothing user-enumerable
    * ever reaches the driver. */
  def cohortRetention(events: DataFrame, periodMs: Long, originMs: Long): DataFrame = {
    val first = events.groupBy(col("user_id")).agg(min(col("ts_ms")).as("__first"))
    events.select(col("user_id"), col("ts_ms")).join(first, "user_id")
      .select(col("user_id"),
        expr(s"(__first - ${originMs}L) div ${periodMs}L").as("cohort"),
        expr(s"(ts_ms - __first) div ${periodMs}L").as("period"))
      .groupBy(col("cohort"), col("period"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }
}
