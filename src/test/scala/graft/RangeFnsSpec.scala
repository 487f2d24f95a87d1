package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{PeriodicSamples, RangeFns}

/** Golden tests for Prometheus range-function semantics. Fixture series and
  * expected-value formulas ported from the reference's test strategy
  * (query/src/test/.../rangefn/RateFunctionsSpec.scala — literal fixtures,
  * hand-derived expectations; implementation is ours). */
class RangeFnsSpec extends AnyFunSuite with Matchers {

  val counter: Seq[(Long, Double)] = Seq(
    8072000L -> 4419.00, 8082100L -> 4511.00, 8092196L -> 4614.00,
    8102215L -> 4724.00, 8112223L -> 4909.00, 8122388L -> 4948.00,
    8132570L -> 5000.00, 8142822L -> 5095.00, 8152858L -> 5102.00,
    8162999L -> 5201.00)

  val gauge: Seq[(Long, Double)] = Seq(
    8072000L -> 7419.00, 8082100L -> 5511.00, 8092196L -> 4614.00,
    8102215L -> 3724.00, 8112223L -> 4909.00, 8122388L -> 4948.00,
    8132570L -> 5000.00, 8142822L -> 3095.00, 8152858L -> 5102.00,
    8162999L -> 8201.00)

  private def arrays(s: Seq[(Long, Double)]) = (s.map(_._1).toArray, s.map(_._2).toArray)

  val eps = 1e-7

  test("rate: start/end just outside the sample span extrapolates to exactly (last-first)/dt") {
    val (ts, vs) = arrays(counter)
    val got = RangeFns.Rate.eval(ts, vs, 0, ts.length, 8071950L, 8163070L)
    val expected = (5201.0 - 4419.0) / (8162999L - 8072000L) * 1000
    got shouldEqual expected +- eps
  }

  test("rate with counter reset: correction adds previous value forward") {
    val all = counter ++ Seq(8173000L -> 325.00, 8183000L -> 511.00,
      8193000L -> 614.00, 8203000L -> 724.00, 8213000L -> 909.00)
    val (ts, vs) = arrays(all)
    PeriodicSamples.monotonize(vs)
    val got = RangeFns.Rate.eval(ts, vs, 0, ts.length, 8071950L, 8213070L)
    val expected = (909.0 + 5201.0 - 4419.0) / (8213000L - 8072000L) * 1000
    got shouldEqual expected +- eps
  }

  test("delta on gauge: extrapolated difference without reset correction") {
    val (ts, vs) = arrays(gauge)
    val got = RangeFns.Delta.eval(ts, vs, 0, ts.length, 8071950L, 8163070L)
    val expected = (8201.0 - 7419.0) / (8162999L - 8072000L) * (8163070L - 8071950L)
    got shouldEqual expected +- 1e-6
  }

  test("monotonize turns resets into cumulative corrections") {
    val vs = Array(5.0, 10.0, 3.0, 4.0, 2.0)
    PeriodicSamples.monotonize(vs)
    vs shouldEqual Array(5.0, 10.0, 13.0, 14.0, 16.0)
  }

  test("irate uses last two samples; reset-aware") {
    val (ts, vs) = arrays(counter)
    RangeFns.Irate.eval(ts, vs, 0, ts.length, 0, 0) shouldEqual
      (5201.0 - 5102.0) / ((8162999L - 8152858L) / 1000.0) +- eps
    val (ts2, vs2) = (Array(10000L, 20000L), Array(100.0, 30.0))
    RangeFns.Irate.eval(ts2, vs2, 0, 2, 0, 0) shouldEqual 30.0 / 10.0 +- eps
  }

  test("idelta is plain last minus second-to-last") {
    val (ts, vs) = arrays(gauge)
    RangeFns.Idelta.eval(ts, vs, 0, ts.length, 0, 0) shouldEqual (8201.0 - 5102.0) +- eps
  }

  test("resets counts drops; changes counts value changes") {
    val vs = Array(1.0, 2.0, 2.0, 1.0, 3.0, 0.5)
    val ts = Array(1L, 2L, 3L, 4L, 5L, 6L)
    RangeFns.Resets.eval(ts, vs, 0, 6, 0, 0) shouldEqual 2.0
    RangeFns.Changes.eval(ts, vs, 0, 6, 0, 0) shouldEqual 4.0
  }

  test("quantile_over_time interpolates between order statistics") {
    val vs = Array(1.0, 2.0, 3.0, 4.0)
    val ts = Array(1L, 2L, 3L, 4L)
    RangeFns.QuantileOverTime(0.5).eval(ts, vs, 0, 4, 0, 0) shouldEqual 2.5 +- eps
    RangeFns.QuantileOverTime(0.0).eval(ts, vs, 0, 4, 0, 0) shouldEqual 1.0 +- eps
    RangeFns.QuantileOverTime(1.0).eval(ts, vs, 0, 4, 0, 0) shouldEqual 4.0 +- eps
    RangeFns.QuantileOverTime(0.25).eval(ts, vs, 0, 4, 0, 0) shouldEqual 1.75 +- eps
  }

  test("deriv of a perfect line is its slope; predict_linear extrapolates it") {
    val ts = Array(1000L, 2000L, 3000L, 4000L)
    val vs = Array(10.0, 20.0, 30.0, 40.0) // slope 10/sec
    RangeFns.Deriv.eval(ts, vs, 0, 4, 0L, 4000L) shouldEqual 10.0 +- eps
    // at window end 4000 value is 40; +10s -> 140
    RangeFns.PredictLinear(10.0).eval(ts, vs, 0, 4, 0L, 4000L) shouldEqual 140.0 +- 1e-6
  }

  test("holt_winters on a linear trend tracks the series") {
    val ts = (1 to 8).map(_ * 1000L).toArray
    val vs = (1 to 8).map(_ * 2.0).toArray
    // perfect linear trend: smoothed value equals the last sample
    RangeFns.HoltWinters(0.5, 0.5).eval(ts, vs, 0, 8, 0, 0) shouldEqual 16.0 +- 1e-9
  }

  test("mad_over_time: median absolute deviation") {
    val vs = Array(1.0, 2.0, 4.0, 10.0)
    val ts = Array(1L, 2L, 3L, 4L)
    // median = 3; |dev| = [2,1,1,7] sorted [1,1,2,7]; median = 1.5
    RangeFns.MadOverTime.eval(ts, vs, 0, 4, 0, 0) shouldEqual 1.5 +- eps
  }

  test("z_score: (last - mean) / stddev") {
    val vs = Array(2.0, 4.0, 6.0)
    val ts = Array(1L, 2L, 3L)
    val mean = 4.0; val sd = math.sqrt((4.0 + 0.0 + 4.0) / 3)
    RangeFns.ZScore.eval(ts, vs, 0, 3, 0, 0) shouldEqual (6.0 - mean) / sd +- eps
  }

  test("delta-counter rate: sum of per-interval deltas per second") {
    val ts = Array(1000L, 2000L, 3000L)
    val vs = Array(5.0, 3.0, 2.0) // already deltas; drops are NOT resets
    RangeFns.RateOverDelta.eval(ts, vs, 0, 3, 0L, 10000L) shouldEqual 10.0 / 10.0 +- 1e-9
    RangeFns.IncreaseOverDelta.eval(ts, vs, 0, 3, 0L, 10000L) shouldEqual 10.0 +- 1e-9
  }

  test("rate needs two samples and distinct timestamps") {
    RangeFns.Rate.eval(Array(1L), Array(1.0), 0, 1, 0, 10).isNaN shouldBe true
    RangeFns.Rate.eval(Array(5L, 5L), Array(1.0, 2.0), 0, 2, 0, 10).isNaN shouldBe true
  }
}
