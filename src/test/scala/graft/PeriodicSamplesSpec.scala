package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{PeriodicSamples, RangeFns}

/** Windowing semantics of the periodic-samples kernel: left-exclusive
  * windows, out-of-order input, staleness-style last_over_time — the
  * behaviors the reference pins in WindowIteratorSpec. */
class PeriodicSamplesSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()
  import spark.implicits._

  private def run(samples: Seq[(String, Long, Double)],
                  start: Long, end: Long, step: Long, window: Long,
                  fn: graft.operators.RangeFn) = {
    val df = samples.toDF("series", "ts", "value")
    PeriodicSamples(df, Seq("series"), "ts", "value", start, end, step, window, fn)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
  }

  test("window is left-exclusive: sample exactly at t-w excluded, at t included") {
    val out = run(Seq(("a", 100L, 1.0), ("a", 200L, 2.0), ("a", 300L, 4.0)),
      start = 300L, end = 300L, step = 100L, window = 100L, RangeFns.SumOverTime)
    // window (200, 300]: only ts=300
    out shouldEqual Seq(("a", 300L, 4.0))
  }

  test("out-of-order input is sorted before evaluation") {
    val out = run(Seq(("a", 300L, 3.0), ("a", 100L, 1.0), ("a", 200L, 2.0)),
      start = 300L, end = 300L, step = 100L, window = 300L, RangeFns.LastOverTime)
    out shouldEqual Seq(("a", 300L, 3.0))
  }

  test("empty windows emit no rows") {
    val out = run(Seq(("a", 100L, 1.0)),
      start = 400L, end = 600L, step = 100L, window = 100L, RangeFns.SumOverTime)
    out shouldBe empty
  }

  test("multiple series are independent") {
    val out = run(Seq(("a", 100L, 1.0), ("b", 100L, 10.0), ("a", 200L, 2.0), ("b", 200L, 20.0)),
      start = 200L, end = 200L, step = 100L, window = 200L, RangeFns.SumOverTime)
    out shouldEqual Seq(("a", 200L, 3.0), ("b", 200L, 30.0))
  }

  test("counter correction spans windows from scan start") {
    // reset at ts=300 (5 -> 1); rate window (200,400] sees corrected 10->11
    val samples = Seq(("a", 100L, 2.0), ("a", 200L, 10.0), ("a", 300L, 1.0), ("a", 400L, 2.0))
    val out = run(samples, start = 400L, end = 400L, step = 100L, window = 200L, RangeFns.Increase)
    out.size shouldEqual 1
    // corrected values: 2, 10, 11, 12; window (200,400] -> first=(300,11) last=(400,12)
    val expected = RangeFns.extrapolated(200L, 400L, 2, 300L, 11.0, 400L, 12.0,
      isCounter = true, isRate = false)
    out.head._3 shouldEqual expected +- 1e-9
  }

  test("offset shifts the evaluated window") {
    val out = run2(Seq(("a", 100L, 1.0), ("a", 200L, 2.0), ("a", 300L, 4.0)),
      start = 300L, end = 300L, step = 100L, window = 100L, offset = 100L, RangeFns.SumOverTime)
    // offset 100: window (100, 200] -> only ts=200
    out shouldEqual Seq(("a", 300L, 2.0))
  }

  private def run2(samples: Seq[(String, Long, Double)],
                   start: Long, end: Long, step: Long, window: Long, offset: Long,
                   fn: graft.operators.RangeFn) = {
    val df = samples.toDF("series", "ts", "value")
    PeriodicSamples(df, Seq("series"), "ts", "value", start, end, step, window, fn, offsetMs = offset)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
  }

  test("NaN samples are skipped by the *_over_time family (FiloDB NaN discipline)") {
    // the reference's AggrOverTimeFunctions NaN-skip: NaN marks a dead
    // sample slot, not a value — sum/count/avg/min/max ignore it
    val s = Seq(("a", 100L, 1.0), ("a", 200L, Double.NaN), ("a", 300L, 4.0))
    run(s, 300, 300, 100, 300, RangeFns.SumOverTime) shouldEqual Seq(("a", 300L, 5.0))
    run(s, 300, 300, 100, 300, RangeFns.CountOverTime) shouldEqual Seq(("a", 300L, 2.0))
    run(s, 300, 300, 100, 300, RangeFns.AvgOverTime) shouldEqual Seq(("a", 300L, 2.5))
    run(s, 300, 300, 100, 300, RangeFns.MinOverTime) shouldEqual Seq(("a", 300L, 1.0))
    run(s, 300, 300, 100, 300, RangeFns.MaxOverTime) shouldEqual Seq(("a", 300L, 4.0))
  }

  test("per-step windows slide over the same samples with literal contents") {
    val s = Seq(("a", 100L, 1.0), ("a", 200L, 2.0), ("a", 300L, 3.0),
                ("a", 400L, 4.0), ("a", 500L, 5.0))
    // window 200 at steps 300/400/500: (100,300]=2+3, (200,400]=3+4, (300,500]=4+5
    run(s, 300, 500, 100, 200, RangeFns.SumOverTime) shouldEqual
      Seq(("a", 300L, 5.0), ("a", 400L, 7.0), ("a", 500L, 9.0))
  }

  test("staleness-style lookback: last_over_time sees nothing past the window") {
    val s = Seq(("a", 100L, 1.0))
    // lookback 150 at step 300: window (150, 300] is empty -> no row
    run(s, 300, 300, 100, 150, RangeFns.LastOverTime) shouldEqual Seq.empty
    // lookback 250 reaches the sample
    run(s, 300, 300, 100, 250, RangeFns.LastOverTime) shouldEqual Seq(("a", 300L, 1.0))
  }
}
