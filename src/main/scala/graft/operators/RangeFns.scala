package graft.operators

import java.util.Locale

/** Range functions: evaluate one output point from the samples of ONE series
  * falling in the window (wStart, wEnd] (left-exclusive — the reference's
  * PeriodicSamplesMapper window convention, see SURVEY.md §2.3).
  *
  * Samples arrive as parallel arrays sorted by timestamp; the window is the
  * slice [lo, hi).  When `needsCounterCorrection` is true the kernel hands
  * in values that were already monotonized from the start of the scanned
  * range (each counter drop adds the previous value forward — the semantics
  * of the reference's BufferableCounterCorrectionIterator,
  * query/.../exec/PeriodicSamplesMapper.scala:551-575).
  *
  * Returning Double.NaN means "no sample at this step" and the kernel emits
  * no row (Prometheus drops NaN points at presentation; we never surface
  * them — SURVEY.md §7.4 "NaN discipline").
  */
trait RangeFn extends Serializable {
  def needsCounterCorrection: Boolean = false
  def eval(ts: Array[Long], vs: Array[Double], lo: Int, hi: Int, wStart: Long, wEnd: Long): Double
}

object RangeFns {

  /** Prometheus-consistent extrapolated rate/increase/delta.
    * Semantics match the reference's RateFunctions.extrapolatedRate
    * (query/.../exec/rangefn/RateFunctions.scala:72-115), which documents
    * itself as "kept consistent with Prometheus' extrapolatedRate":
    * slope between first and last sample in the window, extrapolated to the
    * window edges when the edge gap is < 1.1x the average sample spacing
    * (otherwise by half an average interval), with counter zero-point
    * clamping; per-second division for rate. */
  def extrapolated(wStart: Long, wEnd: Long, n: Int,
                   t1: Long, v1: Double, t2: Long, v2: Double,
                   isCounter: Boolean, isRate: Boolean): Double = {
    if (t2 <= t1) return Double.NaN // all samples in one instant: no slope
    var durationToStart = (t1 - wStart).toDouble / 1000
    val durationToEnd = (wEnd - t2).toDouble / 1000
    val sampledInterval = (t2 - t1).toDouble / 1000
    val avgInterval = sampledInterval / (n.toDouble - 1)
    val delta = v2 - v1
    if (isCounter && delta > 0 && v1 >= 0) {
      val durationToZero = sampledInterval * (v1 / delta)
      if (durationToZero < durationToStart) durationToStart = durationToZero
    }
    val threshold = avgInterval * 1.1
    var extrapolateTo = sampledInterval
    extrapolateTo += (if (durationToStart < threshold) durationToStart else avgInterval / 2)
    extrapolateTo += (if (durationToEnd < threshold) durationToEnd else avgInterval / 2)
    val scaled = delta * (extrapolateTo / sampledInterval)
    if (isRate) scaled / (wEnd - wStart) * 1000 else scaled
  }

  private def rateLike(isCounter: Boolean, isRate: Boolean): RangeFn = new RangeFn {
    override def needsCounterCorrection: Boolean = isCounter
    def eval(ts: Array[Long], vs: Array[Double], lo: Int, hi: Int, wStart: Long, wEnd: Long): Double = {
      val n = hi - lo
      if (n < 2) Double.NaN
      else extrapolated(wStart, wEnd, n, ts(lo), vs(lo), ts(hi - 1), vs(hi - 1), isCounter, isRate)
    }
  }

  val Rate: RangeFn = rateLike(isCounter = true, isRate = true)
  val Increase: RangeFn = rateLike(isCounter = true, isRate = false)
  val Delta: RangeFn = rateLike(isCounter = false, isRate = false)

  /** rate over DELTA-counter samples (reference RateOverDeltaFunction,
    * `delta=true` schemas): each sample is already a per-interval delta,
    * so rate = sum of samples / window seconds — no correction, no
    * extrapolation. */
  val RateOverDelta: RangeFn = new RangeFn {
    def eval(ts: Array[Long], vs: Array[Double], lo: Int, hi: Int, wStart: Long, wEnd: Long): Double = {
      var s = 0.0; var i = lo
      while (i < hi) { if (!vs(i).isNaN) s += vs(i); i += 1 }
      s / (wEnd - wStart) * 1000
    }
  }

  /** increase over delta-counter samples = plain sum of the deltas.
    * (def, not val: SumOverTime initializes later in this object) */
  def IncreaseOverDelta: RangeFn = SumOverTime

  val SumOverTime: RangeFn = simple { (_, vs, lo, hi) =>
    var s = 0.0; var i = lo; while (i < hi) { if (!vs(i).isNaN) s += vs(i); i += 1 }; s
  }
  val CountOverTime: RangeFn = simple { (_, vs, lo, hi) =>
    var c = 0; var i = lo; while (i < hi) { if (!vs(i).isNaN) c += 1; i += 1 }
    if (c == 0) Double.NaN else c.toDouble
  }
  val AvgOverTime: RangeFn = simple { (_, vs, lo, hi) =>
    var s = 0.0; var c = 0; var i = lo
    while (i < hi) { if (!vs(i).isNaN) { s += vs(i); c += 1 }; i += 1 }
    if (c == 0) Double.NaN else s / c
  }
  val MinOverTime: RangeFn = simple { (_, vs, lo, hi) =>
    var m = Double.NaN; var i = lo
    while (i < hi) { if (!vs(i).isNaN && (m.isNaN || vs(i) < m)) m = vs(i); i += 1 }; m
  }
  val MaxOverTime: RangeFn = simple { (_, vs, lo, hi) =>
    var m = Double.NaN; var i = lo
    while (i < hi) { if (!vs(i).isNaN && (m.isNaN || vs(i) > m)) m = vs(i); i += 1 }; m
  }
  /** Population variance (Prometheus stdvar_over_time). */
  val StdvarOverTime: RangeFn = simple { (_, vs, lo, hi) =>
    var s = 0.0; var c = 0; var i = lo
    while (i < hi) { if (!vs(i).isNaN) { s += vs(i); c += 1 }; i += 1 }
    if (c == 0) Double.NaN
    else {
      val mean = s / c; var m2 = 0.0; i = lo
      while (i < hi) { if (!vs(i).isNaN) { val d = vs(i) - mean; m2 += d * d }; i += 1 }
      m2 / c
    }
  }
  val StddevOverTime: RangeFn = simple { (ts, vs, lo, hi) =>
    math.sqrt(StdvarOverTime.eval(ts, vs, lo, hi, 0L, 0L))
  }
  /** Newest sample in window — also the implicit function for plain
    * selectors in range queries (staleness window = 5m default). */
  val LastOverTime: RangeFn = simple { (_, vs, lo, hi) => vs(hi - 1) }
  /** Seconds-precision timestamp of the newest sample. */
  val TimestampFn: RangeFn = simple { (ts, _, lo, hi) => ts(hi - 1).toDouble / 1000 }

  /** Upstream promql 3.5 experimental `ts_of_*_over_time` family: the
    * seconds-precision timestamp OF the extreme/last sample in the window
    * (prometheus/prometheus promql/functions.go funcTsOfMaxOverTime et al).
    * Ties keep the EARLIEST occurrence — upstream only replaces the
    * champion on a strictly-greater (resp. strictly-smaller) value. */
  val TsOfLastOverTime: RangeFn = TimestampFn
  val TsOfMaxOverTime: RangeFn = simple { (ts, vs, lo, hi) =>
    var best = Double.NaN; var bt = Long.MinValue; var i = lo
    while (i < hi) {
      if (!vs(i).isNaN && (best.isNaN || vs(i) > best)) { best = vs(i); bt = ts(i) }
      i += 1
    }
    if (best.isNaN) Double.NaN else bt.toDouble / 1000
  }
  val TsOfMinOverTime: RangeFn = simple { (ts, vs, lo, hi) =>
    var best = Double.NaN; var bt = Long.MinValue; var i = lo
    while (i < hi) {
      if (!vs(i).isNaN && (best.isNaN || vs(i) < best)) { best = vs(i); bt = ts(i) }
      i += 1
    }
    if (best.isNaN) Double.NaN else bt.toDouble / 1000
  }
  val PresentOverTime: RangeFn = simple { (_, _, _, _) => 1.0 }

  /** Exact quantile with linear interpolation between order statistics
    * (Prometheus quantile_over_time; NOT approximate). */
  def QuantileOverTime(phi: Double): RangeFn = simple { (_, vs, lo, hi) =>
    val xs = java.util.Arrays.copyOfRange(vs, lo, hi).filterNot(_.isNaN).sorted
    quantileSorted(xs, phi)
  }

  def quantileSorted(xs: Array[Double], phi: Double): Double = {
    if (xs.isEmpty) Double.NaN
    else if (phi < 0) Double.NegativeInfinity
    else if (phi > 1) Double.PositiveInfinity
    else {
      val rank = phi * (xs.length - 1)
      val lower = math.floor(rank).toInt
      val upper = math.min(lower + 1, xs.length - 1)
      val weight = rank - lower
      xs(lower) * (1 - weight) + xs(upper) * weight
    }
  }

  /** Median absolute deviation over the window. */
  val MadOverTime: RangeFn = simple { (_, vs, lo, hi) =>
    val xs = java.util.Arrays.copyOfRange(vs, lo, hi).filterNot(_.isNaN).sorted
    if (xs.isEmpty) Double.NaN
    else {
      val med = quantileSorted(xs, 0.5)
      val dev = xs.map(v => math.abs(v - med)).sorted
      quantileSorted(dev, 0.5)
    }
  }

  /** FiloDB extension: emit the last sample iff it is a MAD outlier —
    * outside median ± tolerance*MAD, with bounds 0=lower-only, 1=both,
    * 2=upper-only (reference AggrOverTimeFunctions.scala:488-552). */
  def LastIsMadOutlier(tolerance: Double, bounds: Int): RangeFn = simple { (_, vs, lo, hi) =>
    val xs = java.util.Arrays.copyOfRange(vs, lo, hi).filterNot(_.isNaN).sorted
    if (xs.isEmpty) Double.NaN
    else {
      val median = quantileSorted(xs, 0.5)
      val mad = quantileSorted(xs.map(v => math.abs(v - median)).sorted, 0.5)
      val last = vs(hi - 1)
      val isOutlier = (last < median - tolerance * mad && bounds <= 1) ||
        (last > median + tolerance * mad && bounds >= 1)
      if (isOutlier) last else Double.NaN
    }
  }

  /** Number of value changes between consecutive samples. */
  val Changes: RangeFn = simple { (_, vs, lo, hi) =>
    var c = 0; var i = lo + 1
    while (i < hi) { if (vs(i) != vs(i - 1) && !(vs(i).isNaN && vs(i - 1).isNaN)) c += 1; i += 1 }
    c.toDouble
  }

  /** Number of counter resets (value drops) between consecutive samples. */
  val Resets: RangeFn = simple { (_, vs, lo, hi) =>
    var c = 0; var i = lo + 1
    while (i < hi) { if (vs(i) < vs(i - 1)) c += 1; i += 1 }
    c.toDouble
  }

  /** last - second-to-last (no per-second division, no reset handling). */
  val Idelta: RangeFn = simple { (_, vs, lo, hi) =>
    if (hi - lo < 2) Double.NaN else vs(hi - 1) - vs(hi - 2)
  }

  /** Per-second instantaneous rate from the last two samples, reset-aware. */
  val Irate: RangeFn = new RangeFn {
    def eval(ts: Array[Long], vs: Array[Double], lo: Int, hi: Int, wStart: Long, wEnd: Long): Double = {
      if (hi - lo < 2) Double.NaN
      else {
        val prev = vs(hi - 2); val last = vs(hi - 1)
        val dv = if (last < prev) last else last - prev // reset: counter restarted
        val dt = (ts(hi - 1) - ts(hi - 2)).toDouble / 1000
        if (dt == 0) Double.NaN else dv / dt
      }
    }
  }

  /** Least-squares slope per second (Prometheus deriv), computed against
    * timestamps relative to the window's newest sample for stability. */
  private def linreg(ts: Array[Long], vs: Array[Double], lo: Int, hi: Int, interceptAt: Long): (Double, Double) = {
    var n = 0.0; var sumX = 0.0; var sumY = 0.0; var sumXY = 0.0; var sumX2 = 0.0
    var i = lo
    while (i < hi) {
      if (!vs(i).isNaN) {
        val x = (ts(i) - interceptAt).toDouble / 1000
        n += 1; sumX += x; sumY += vs(i); sumXY += x * vs(i); sumX2 += x * x
      }
      i += 1
    }
    if (n < 2) (Double.NaN, Double.NaN)
    else {
      val covXY = sumXY - sumX * sumY / n
      val varX = sumX2 - sumX * sumX / n
      val slope = covXY / varX
      val intercept = sumY / n - slope * sumX / n
      (slope, intercept)
    }
  }

  val Deriv: RangeFn = simpleT { (ts, vs, lo, hi) => linreg(ts, vs, lo, hi, ts(hi - 1))._1 }

  /** Linear prediction `t` seconds from the window end. */
  def PredictLinear(tSecs: Double): RangeFn = new RangeFn {
    def eval(ts: Array[Long], vs: Array[Double], lo: Int, hi: Int, wStart: Long, wEnd: Long): Double = {
      val (slope, icept) = linreg(ts, vs, lo, hi, wEnd)
      if (slope.isNaN) Double.NaN else slope * tSecs + icept
    }
  }

  /** Double (Holt-Winters) exponential smoothing; sf = data smoothing
    * factor, tf = trend factor. Prometheus semantics: seeded with the first
    * sample and first difference, needs >= 2 samples. */
  def HoltWinters(sf: Double, tf: Double): RangeFn = simpleT { (ts, vs, lo, hi) =>
    val n = hi - lo
    if (n < 2 || sf <= 0 || sf >= 1 || tf <= 0 || tf >= 1) Double.NaN
    else {
      var s = vs(lo)
      var b = vs(lo + 1) - vs(lo)
      var i = lo + 1
      while (i < hi) {
        val x = sf * vs(i)
        val y = (1 - sf) * (s + b)
        val sPrev = s
        s = x + y
        b = tf * (s - sPrev) + (1 - tf) * b
        i += 1
      }
      s
    }
  }

  /** (last - mean) / stddev over the window. */
  val ZScore: RangeFn = simple { (ts, vs, lo, hi) =>
    val sd = StddevOverTime.eval(ts, vs, lo, hi, 0L, 0L)
    val mean = AvgOverTime.eval(ts, vs, lo, hi, 0L, 0L)
    (vs(hi - 1) - mean) / sd
  }

  private def simple(f: (Array[Long], Array[Double], Int, Int) => Double): RangeFn = new RangeFn {
    def eval(ts: Array[Long], vs: Array[Double], lo: Int, hi: Int, wStart: Long, wEnd: Long): Double =
      f(ts, vs, lo, hi)
  }
  private def simpleT(f: (Array[Long], Array[Double], Int, Int) => Double): RangeFn = simple(f)

  /** Name → function lookup used by the PromQL planner. */
  def byName(name: String, args: Seq[Double] = Nil): RangeFn =
    name.toLowerCase(Locale.ROOT) match {
      case "rate"               => Rate
      case "rate_over_delta"    => RateOverDelta
      case "increase_over_delta" => IncreaseOverDelta
      case "increase"           => Increase
      case "delta"              => Delta
      case "idelta"             => Idelta
      case "irate"              => Irate
      case "resets"             => Resets
      case "changes"            => Changes
      case "deriv"              => Deriv
      case "predict_linear"     => PredictLinear(args.head)
      case "holt_winters" | "double_exponential_smoothing" =>
        HoltWinters(args(0), args(1))
      case "sum_over_time"      => SumOverTime
      case "avg_over_time"      => AvgOverTime
      case "count_over_time"    => CountOverTime
      case "min_over_time"      => MinOverTime
      case "max_over_time"      => MaxOverTime
      case "stddev_over_time"   => StddevOverTime
      case "stdvar_over_time"   => StdvarOverTime
      case "quantile_over_time" => QuantileOverTime(args.head)
      case "mad_over_time"      => MadOverTime
      case "last_over_time"     => LastOverTime
      case "last"               => LastOverTime // reference alias (PlanEnums "last")
      case "timestamp"          => TimestampFn
      case "ts_of_last_over_time" => TsOfLastOverTime
      case "ts_of_max_over_time"  => TsOfMaxOverTime
      case "ts_of_min_over_time"  => TsOfMinOverTime
      case "present_over_time"  => PresentOverTime
      case "z_score"            => ZScore
      case other => throw new IllegalArgumentException(s"unknown range function: $other")
    }
}
