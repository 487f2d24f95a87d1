package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Sessionize

class SessionizeSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()
  import spark.implicits._

  // (user_id, event_id, ts_ms, event_type, value); gap = 100 ms
  val events = Seq(
    (1L, 10L, 1000L, "view", 1.0),
    (1L, 11L, 1050L, "click", 2.0),     // same session (gap 50)
    (1L, 12L, 1200L, "purchase", 3.0),  // new session (gap 150)
    (1L, 13L, 1250L, "view", 4.0),
    (2L, 20L, 5000L, "view", 5.0),      // single-event user
    (3L, 30L, 9000L, "click", 6.0),     // no view -> not in funnel
    (3L, 31L, 9001L, "purchase", 7.0)
  ).toDF("user_id", "event_id", "ts_ms", "event_type", "value")

  test("sessionize splits on gaps > gapMs and numbers sessions per user") {
    val s = Sessionize.sessionize(events, gapMs = 100)
      .select("user_id", "event_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    s((1L, 10L)) shouldEqual 1
    s((1L, 11L)) shouldEqual 1
    s((1L, 12L)) shouldEqual 2
    s((1L, 13L)) shouldEqual 2
    s((2L, 20L)) shouldEqual 1
    s((3L, 30L)) shouldEqual 1
    s((3L, 31L)) shouldEqual 1
  }

  test("sessionStats rolls up bounds, counts and sums per session") {
    val s = Sessionize.sessionStats(events, gapMs = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    s((1L, 1L)) shouldEqual ((2L, 1000L, 1050L, 50L, 3000000L))
    s((1L, 2L)) shouldEqual ((2L, 1200L, 1250L, 50L, 7000000L))
    s((2L, 1L)) shouldEqual ((1L, 5000L, 5000L, 0L, 5000000L))
    s((3L, 1L)) shouldEqual ((2L, 9000L, 9001L, 1L, 13000000L))
  }

  test("sessionize is deterministic under repartitioning") {
    val a = Sessionize.sessionStats(events, gapMs = 100).collect().toSet
    val b = Sessionize.sessionStats(events.repartition(7), gapMs = 100).collect().toSet
    a shouldEqual b
  }

  test("funnel chains strictly-later steps and counts completion depth") {
    val f = Sessionize.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))).toMap
    // user 1: view@1000 -> click@1050 -> purchase@1200
    f(1L) shouldEqual ((Some(1000L), Some(1050L), Some(1200L), 3))
    // user 2: view only
    f(2L) shouldEqual ((Some(5000L), None, None, 1))
    // user 3 never did step 1 -> absent entirely
    f.contains(3L) shouldEqual false
  }

  test("funnel conversion window bounds later steps to first-touch + within") {
    val ev = Seq(
      (1L, 1L, 1000L, "view", 0.0),
      (1L, 2L, 1100L, "click", 0.0),    // within 200 of first view
      (2L, 3L, 1000L, "view", 0.0),
      (2L, 4L, 2000L, "click", 0.0),    // outside the 200ms window
      (2L, 5L, 1500L, "view", 0.0)      // later view would qualify, but
                                        // first-touch anchors at 1000
    ).toDF("user_id", "event_id", "ts_ms", "event_type", "value")
    val f = Sessionize.funnel(ev, Seq("view", "click"), withinMs = Some(200L))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    f(1L) shouldEqual 2
    f(2L) shouldEqual 1
    // no window: user 2 converts
    val open = Sessionize.funnel(ev, Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    open(2L) shouldEqual 2
  }

  test("cohort retention counts distinct users per (cohort, period)") {
    // period 1000ms, origin 0: user 1 first at 500 (cohort 0), active in
    // periods 0 and 2; user 2 first at 1500 (cohort 1), active period 0
    val ev = Seq(
      (1L, 500L), (1L, 700L), (1L, 2600L),
      (2L, 1500L)
    ).toDF("user_id", "ts_ms")
    val r = Sessionize.cohortRetention(ev, periodMs = 1000L, originMs = 0L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    r shouldEqual Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L)
  }

  test("funnel report rolls stage counts and conversion fractions") {
    val r = Sessionize.funnelReport(events, Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    // users 1,2 did 'view' first; only user 1 clicked then purchased
    r(0) shouldEqual ((1, "view", 2L, 1.0))
    r(1) shouldEqual ((2, "click", 1L, 0.5))
    r(2) shouldEqual ((3, "purchase", 1L, 1.0))
  }

  test("funnel requires steps to be strictly after the previous step") {
    // click BEFORE the first view must not count
    val ev = Seq(
      (9L, 1L, 100L, "click", 0.0),
      (9L, 2L, 200L, "view", 0.0)
    ).toDF("user_id", "event_id", "ts_ms", "event_type", "value")
    val f = Sessionize.funnel(ev, Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    f(9L) shouldEqual 1
  }

  test("topPaths counts in-session n-grams only, ties tiebreak on path") {
    val ev = Seq(
      // user 1 session: view>click>purchase (one 3-gram)
      (1L, 1L, 1000L, "view", 0.0), (1L, 2L, 1010L, "click", 0.0),
      (1L, 3L, 1020L, "purchase", 0.0),
      // user 2 same path, then a SESSION BREAK — the cross-session pair
      // must produce no gram
      (2L, 4L, 2000L, "view", 0.0), (2L, 5L, 2010L, "click", 0.0),
      (2L, 6L, 2020L, "purchase", 0.0),
      (2L, 7L, 9000L, "view", 0.0), (2L, 8L, 9010L, "view", 0.0),
      // user 3: 4 events -> two 3-grams
      (3L, 9L, 3000L, "click", 0.0), (3L, 10L, 3010L, "view", 0.0),
      (3L, 11L, 3020L, "click", 0.0), (3L, 12L, 3030L, "purchase", 0.0)
    ).toDF("user_id", "event_id", "ts_ms", "event_type", "value")
    val paths = Sessionize.topPaths(ev, gapMs = 100, n = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    paths.head shouldEqual ("view>click>purchase" -> 3L)
    paths.toMap.apply("click>view>click") shouldEqual 1L
    // user 2's second session (2 events) contributes nothing
    paths.map(_._2).sum shouldEqual 4L
    // deterministic under repartitioning (array_sort, not arrival order)
    Sessionize.topPaths(ev.repartition(5), gapMs = 100, n = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)) shouldEqual paths
  }
}
