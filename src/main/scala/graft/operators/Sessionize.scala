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

  /** Per-session rollup: bounds, duration, event count, value sum. */
  def sessionStats(events: DataFrame, gapMs: Long): DataFrame =
    sessionize(events, gapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"),
        round(sum(col("value")), 6).as("sum_value"))

  /** Ordered funnel: for `steps` = Seq(a, b, c, ...) find, per user, the
    * earliest occurrence of `a`, then the earliest `b` STRICTLY after it,
    * and so on. Returns one row per user who completed step 1, with
    * `step<i>_ms` (null once the chain breaks) and `steps_completed`.
    *
    * Each stage is one filtered aggregation joined back on `user_id` —
    * k-1 shuffles for a k-step funnel, all on the same key so AQE/exchange
    * reuse co-locates them; nothing is ever collected. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("step1_ms"))
    val chained = steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val prevCol = s"step${i + 1}_ms"
      val thisCol = s"step${i + 2}_ms"
      val nxt = events.filter(col("event_type") === step)
        .join(acc.select(col("user_id"), col(prevCol)), "user_id")
        .where(col("ts_ms") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts_ms")).as(thisCol))
      acc.join(nxt.select(col("user_id"), col(thisCol)), Seq("user_id"), "left")
    }
    val stepCols: Seq[Column] = steps.indices.map(i => col(s"step${i + 1}_ms"))
    chained.withColumn("steps_completed",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _))
  }
}
