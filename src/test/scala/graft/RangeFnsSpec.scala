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

  test("ts_of_max/min/last_over_time: seconds-timestamp of the window " +
       "extreme, ties keep the EARLIEST occurrence, NaN samples skipped") {
    val (ts, vs) = arrays(gauge)
    // gauge max 8201 at 8162999, min 3095 at 8142822
    RangeFns.TsOfMaxOverTime.eval(ts, vs, 0, ts.length, 0L, 0L) shouldEqual 8162.999 +- eps
    RangeFns.TsOfMinOverTime.eval(ts, vs, 0, ts.length, 0L, 0L) shouldEqual 8142.822 +- eps
    RangeFns.TsOfLastOverTime.eval(ts, vs, 0, ts.length, 0L, 0L) shouldEqual 8162.999 +- eps
    // tie: two samples share the max -> the earlier timestamp wins
    val tts = Array(1000L, 2000L, 3000L)
    val tvs = Array(7.0, 7.0, 2.0)
    RangeFns.TsOfMaxOverTime.eval(tts, tvs, 0, 3, 0L, 0L) shouldEqual 1.0 +- eps
    RangeFns.TsOfMinOverTime.eval(tts, tvs, 0, 3, 0L, 0L) shouldEqual 3.0 +- eps
    // NaN samples are no-data: skipped, never the champion
    val nvs = Array(Double.NaN, 5.0, Double.NaN)
    RangeFns.TsOfMaxOverTime.eval(tts, nvs, 0, 3, 0L, 0L) shouldEqual 2.0 +- eps
    // all-NaN window -> NaN (kernel emits no row)
    RangeFns.TsOfMaxOverTime.eval(tts,
      Array(Double.NaN, Double.NaN, Double.NaN), 0, 3, 0L, 0L).isNaN shouldBe true
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

  // ===== Reference literal battery =====================================
  // The remaining hand-computed cases of the reference's rate-math matrix
  // (ref: query/src/test/scala/filodb/query/exec/rangefn/
  // RateFunctionsSpec.scala — fixtures and expected doubles transcribed;
  // evaluation through OUR kernel). Window bounds are the reference's
  // exact choices; its tolerance (1e-7) kept.

  test("reference battery: rate with a drop in the middle of each chunk " +
       "accumulates both corrections") {
    val chunk1 = Seq(
      8072000L -> 4419.00, 8082100L -> 4511.00, 8092196L -> 4614.00,
      8102215L -> 4724.00, 8112223L -> 4909.00, 8122388L -> 948.00,
      8132570L -> 1000.00, 8142822L -> 1095.00, 8152858L -> 1102.00,
      8162999L -> 1201.00)
    val chunk2 = Seq(
      8173000L -> 1325.00, 8183000L -> 1511.00, 8193000L -> 214.00,
      8203000L -> 324.00, 8213000L -> 409.00)
    val (ts, vs) = arrays(chunk1 ++ chunk2)
    PeriodicSamples.monotonize(vs)
    val corrections = 4909.0 + 1511.0 // the value before each drop
    val expected = (409.0 + corrections - 4419.0) / (8213000L - 8072000L) * 1000
    RangeFns.Rate.eval(ts, vs, 0, ts.length, 8071950L, 8213070L) shouldEqual expected +- eps
  }

  test("reference battery: flat counter samples rate to exactly 0") {
    val flat = counter.map { case (t, _) => t -> counter.head._2 }
    val (ts, vs) = arrays(flat)
    PeriodicSamples.monotonize(vs)
    RangeFns.Rate.eval(ts, vs, 0, ts.length, 8071950L, 8163070L) shouldEqual 0.0
  }

  test("reference battery: increase is the extrapolated (non-per-second) delta") {
    val (ts, vs) = arrays(counter)
    val expected = (5201.0 - 4419.0) / (8162999L - 8072000L) * (8163070L - 8071950L)
    RangeFns.Increase.eval(ts, vs, 0, ts.length, 8071950L, 8163070L) shouldEqual expected +- eps
  }

  test("reference battery: resets = 4 on the gauge fixture, 1 after sliding past " +
       "the first five samples, 0 on a monotone counter") {
    val (ts, vs) = arrays(gauge)
    RangeFns.Resets.eval(ts, vs, 0, ts.length, 8071950L, 8163070L) shouldEqual 4.0
    // the reference slides the window past the first 5 samples: of the 4
    // resets, 3 sat in the evicted prefix -> 1 remains
    RangeFns.Resets.eval(ts, vs, 5, ts.length, 8071950L, 8163070L) shouldEqual 1.0
    val mono = Seq(
      8072000L -> 1419.00, 8082100L -> 2511.00, 8092196L -> 3614.00,
      8102215L -> 4724.00, 8112223L -> 5909.00, 8122388L -> 6948.00,
      8132570L -> 7000.00, 8142822L -> 8095.00, 8152858L -> 9102.00,
      8163000L -> 9201.00)
    val (ts2, vs2) = arrays(mono)
    RangeFns.Resets.eval(ts2, vs2, 0, ts2.length, 8071950L, 8163070L) shouldEqual 0.0
  }

  test("reference battery: deriv over each 3-sample window lands on the " +
       "reference's literal slopes") {
    val flats = Seq(
      8072000L -> 4419.00, 8082100L -> 4419.00, 8092196L -> 4419.00,
      8102215L -> 4724.00, 8112223L -> 4724.00, 8122388L -> 4724.00,
      8132570L -> 5000.00, 8142822L -> 5000.00, 8152858L -> 5000.00,
      8163000L -> 5201.00)
    val expected = Seq(
      0.00, 15.143392157475684, 15.232227023719313, 0.0,
      13.568427882659712, 13.4914241262328, 0.0, 9.978695375995517)
    val (ts, vs) = arrays(flats)
    for (i <- expected.indices) {
      val got = RangeFns.Deriv.eval(ts, vs, i, i + 3, ts(i), ts(i + 2))
      withClue(s"window $i")(got shouldEqual expected(i) +- eps)
    }
  }

  test("reference battery: delta-histogram rate_over_delta divides the bucket " +
       "sums by the window seconds") {
    // delta histogram samples (4 buckets); expected sums [45, 70, 95, 120]
    val samples = Seq(
      8072000L -> Array(10.0, 15.0, 20.0, 25.0),
      8082100L -> Array(20.0, 30.0, 40.0, 50.0),
      8092196L -> Array(15.0, 25.0, 35.0, 45.0))
    val ts = samples.map(_._1).toArray
    val (wStart, wEnd) = (8071950L, 8092250L)
    val expectedSum = Array(45.0, 70.0, 95.0, 120.0)
    for (b <- 0 until 4) {
      val vs = samples.map(_._2(b)).toArray
      RangeFns.RateOverDelta.eval(ts, vs, 0, 3, wStart, wEnd) shouldEqual
        (expectedSum(b) / ((wEnd - wStart) / 1000.0)) +- eps
    }
  }

  test("reference battery: irate over prom-histogram STORAGE lands on the " +
       "per-bucket instant rates (IRateFunctionH literals)") {
    // ref RateFunctionsSpec "IRateFunctionH should work with compatible
    // histogram buckets": GeometricBuckets(2,2,4), counters per bucket;
    // expected = (last - prev) / dt per bucket. Our engine stores native
    // hist columns and bridges them to per-le counter series at query
    // time, so plain irate() answers the same shape.
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, map, typedLit}
    import graft.promql.PromPlanner
    val hist = Seq(
      (8072000L, Seq(100.0, 120.0, 140.0, 160.0)),
      (8082100L, Seq(150.0, 180.0, 210.0, 240.0)),
      (8092196L, Seq(200.0, 240.0, 280.0, 320.0)),
      (8102215L, Seq(250.0, 300.0, 350.0, 400.0)))
      .toDF("ts", "values")
      .select(lit("h").as("metric"), map(lit("job"), lit("a")).as("tags"),
        col("ts"), lit(Double.NaN).as("value"),
        typedLit(Seq(2.0, 4.0, 8.0, 16.0)).as("le"), col("values"))
    val at = 8103070L
    val ctx = PromPlanner.Ctx(spark, hist, at, at, 1000L)
    val got = PromPlanner.queryRange(ctx, "irate(h[31120ms])")
      .select(org.apache.spark.sql.functions.col("labels")("le"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dt = (8102215L - 8092196L) / 1000.0
    val expected = Map("2.0" -> 50.0 / dt, "4.0" -> 60.0 / dt,
      "8.0" -> 70.0 / dt, "16.0" -> 80.0 / dt)
    got.keySet shouldEqual expected.keySet
    for ((k, v) <- expected) got(k) shouldEqual v +- eps
    // the reference's counter-reset case: last sample drops -> rate is
    // last/dt per bucket
    val reset = Seq(
      (8072000L, Seq(100.0, 120.0, 140.0, 160.0)),
      (8082100L, Seq(200.0, 240.0, 280.0, 320.0)),
      (8092196L, Seq(50.0, 60.0, 70.0, 80.0)))
      .toDF("ts", "values")
      .select(lit("h").as("metric"), map(lit("job"), lit("a")).as("tags"),
        col("ts"), lit(Double.NaN).as("value"),
        typedLit(Seq(2.0, 4.0, 8.0, 16.0)).as("le"), col("values"))
    val at2 = 8093070L
    val got2 = PromPlanner.queryRange(
        PromPlanner.Ctx(spark, reset, at2, at2, 1000L), "irate(h[21120ms])")
      .select(org.apache.spark.sql.functions.col("labels")("le"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dt2 = (8092196L - 8082100L) / 1000.0
    for ((k, base) <- Map("2.0" -> 50.0, "4.0" -> 60.0, "8.0" -> 70.0, "16.0" -> 80.0))
      got2(k) shouldEqual (base / dt2) +- eps
  }

  test("reference battery end-to-end: rate/increase/irate/resets through PromQL " +
       "land on the literal expectations, incl. a NaN row inside the window") {
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, map}
    import graft.promql.PromPlanner
    def ctxFor(rows: Seq[(Long, Double)], atMs: Long) = PromPlanner.Ctx(
      spark,
      rows.toDF("ts", "value")
        .select(lit("m").as("metric"), map(lit("user"), lit("1")).as("tags"),
          col("ts"), col("value")),
      atMs, atMs, 1000L)
    def one(rows: Seq[(Long, Double)], q: String, atMs: Long): Array[Double] =
      PromPlanner.queryRange(ctxFor(rows, atMs), q).select("value").as[Double].collect()
    // rate, window (8071950, 8163070]
    val r = one(counter, "rate(m[91120ms])", 8163070L)
    r.length shouldEqual 1
    r.head shouldEqual ((5201.0 - 4419.0) / (8162999L - 8072000L) * 1000) +- eps
    // increase over the same window
    val inc = one(counter, "increase(m[91120ms])", 8163070L)
    inc.length shouldEqual 1
    inc.head shouldEqual
      ((5201.0 - 4419.0) / (8162999L - 8072000L) * (8163070L - 8071950L)) +- eps
    // a NaN sample at a chunk boundary is skipped; the post-reset chunk
    // still counter-corrects (ref "should be able to handle NAN at the
    // beginning"): window (8071950, 8213070]
    val withNan = counter ++ Seq(8173000L -> Double.NaN, 8183000L -> 511.00,
      8193000L -> 614.00, 8203000L -> 724.00, 8213000L -> 909.00)
    val gotNan = one(withNan, "rate(m[141120ms])", 8213070L)
    gotNan.length shouldEqual 1
    gotNan.head shouldEqual
      ((909.0 + 5201.0 - 4419.0) / (8213000L - 8072000L) * 1000) +- eps
    // irate and resets literals
    one(counter, "irate(m[91120ms])", 8163070L).head shouldEqual
      ((5201.0 - 5102.0) / (8162999L - 8152858L) * 1000) +- eps
    one(gauge, "resets(m[91120ms])", 8163070L) shouldEqual Array(4.0)
    // single-sample window: rate emits NO row (the reference's NaN)
    one(counter.take(1), "rate(m[91120ms])", 8163070L) shouldBe empty
    // empty window: resets emits no row either
    one(gauge, "resets(m[1s])", 8300000L) shouldBe empty
  }
}
