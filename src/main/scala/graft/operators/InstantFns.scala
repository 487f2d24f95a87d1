package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Instant (per-sample scalar) functions — SURVEY.md §2.4. All are
  * codegen'd Catalyst built-ins, wrapped where Spark's SQL semantics
  * diverge from the reference's scala.math ones
  * (`ref:query/.../rangefn/InstantFunction.scala:130-360`, every impl is
  * a plain scala.math call):
  *  - Spark `ceil`/`floor` return LONG (NaN casts to 0, ±Inf clamp to
  *    Long.Max/Min) — non-finite and already-integral-magnitude values
  *    pass through like scala.math.ceil/floor;
  *  - Spark `log/log2/log10` return NULL for input <= 0 — the reference
  *    (Java) semantics are log(0) = -Inf, log(negative) = NaN;
  *  - Spark `least`/`greatest` order NaN as the LARGEST value, so
  *    clamp_max(NaN) would return the limit — the reference's
  *    math.min/max propagate NaN;
  *  - the calendar functions would cast NaN/±Inf epoch seconds to 0L
  *    (= 1970 dates) — the reference returns NaN.
  * `round` reproduces Prometheus half-up rounding to a multiple
  * (floor(v/to + 0.5) * to; NaN/±Inf fall through unrounded by the same
  * arithmetic), and the calendar functions interpret the VALUE as epoch
  * seconds in UTC, like the reference's InstantFunction.scala:272-360.
  */
object InstantFns {

  private val NaNd = lit(Double.NaN)

  private def notFinite(v: Column): Column =
    isnan(v) || v === lit(Double.PositiveInfinity) || v === lit(Double.NegativeInfinity)

  /** Doubles at |v| >= 2^52 are already integral (and overflow Spark's
    * long-typed ceil/floor) — identity, like scala.math. */
  private def intLike(v: Column): Column = notFinite(v) || abs(v) >= lit(4503599627370496.0)

  /** Spark's long-log family NULLs out non-positive input; restore the
    * Java semantics (0 -> -Inf, negative -> NaN; NaN -> NaN comes out of
    * the builtin itself). */
  private def javaLog(builtin: Column, v: Column): Column =
    coalesce(builtin, when(v === 0.0, lit(Double.NegativeInfinity)).otherwise(NaNd))

  def apply(name: String, v: Column, args: Seq[Double] = Nil): Column = name match {
    case "abs"   => abs(v)
    case "ceil"  => when(intLike(v), v).otherwise(ceil(v).cast("double"))
    case "floor" => when(intLike(v), v).otherwise(floor(v).cast("double"))
    case "exp"   => exp(v)
    case "ln"    => javaLog(log(v), v)
    case "log2"  => javaLog(log2(v), v)
    case "log10" => javaLog(log10(v), v)
    case "sqrt"  => sqrt(v)
    case "sgn"   => signum(v)
    case "round" =>
      val to = if (args.nonEmpty) args.head else 1.0
      val shifted = v / lit(to) + lit(0.5)
      // scala.math computes floor(v/to+0.5)*to with a double-typed floor;
      // at |shifted| >= 2^52 the double is already integral (or non-finite,
      // where v/to overflow must surface as Inf*to), so the floor is the
      // identity and the result is shifted*to — NOT v: Spark's long-typed
      // floor would overflow there, but passing v through diverged on
      // pathological huge-v/tiny-to inputs (round-9 advisor finding)
      when(intLike(shifted), shifted * lit(to)).otherwise(floor(shifted) * lit(to))
    // NaN BOUNDS poison the result (reference ClampMax/ClampMin use
    // scala.math.min/max = java.lang.Math, which return NaN when either
    // operand is NaN; Spark's least/greatest skip NaN instead — r10
    // upstream-corpus finding). Bounds are plan-time constants, so the
    // check is too.
    case "clamp_max" =>
      if (args.head.isNaN) NaNd
      else when(isnan(v), v).otherwise(least(v, lit(args.head)))
    case "clamp_min" =>
      if (args.head.isNaN) NaNd
      else when(isnan(v), v).otherwise(greatest(v, lit(args.head)))
    case "clamp"     =>
      if (args.exists(_.isNaN)) NaNd
      else when(isnan(v), v)
        .otherwise(least(greatest(v, lit(args(0))), lit(args(1))))
    // trigonometric family (upstream promql 3.x; NO reference counterpart
    // — FiloDB has no trig functions; carried for upstream-user parity).
    // Spark's builtins are java.lang.Math, matching Go's special values
    // (sin(Inf)=NaN, asin(2)=NaN, acosh(0.5)=NaN).
    case "sin"   => sin(v)
    case "cos"   => cos(v)
    case "tan"   => tan(v)
    case "asin"  => asin(v)
    case "acos"  => acos(v)
    case "atan"  => atan(v)
    case "sinh"  => sinh(v)
    case "cosh"  => cosh(v)
    case "tanh"  => tanh(v)
    case "asinh" => asinh(v)
    case "acosh" => acosh(v)
    case "atanh" => atanh(v)
    case "deg"   => degrees(v)
    case "rad"   => radians(v)
    // calendar fns: value is epoch SECONDS (UTC); non-finite -> NaN
    case "month"         => calendar(v, month(epochTs(v)))
    case "year"          => calendar(v, year(epochTs(v)))
    case "hour"          => calendar(v, hour(epochTs(v)))
    case "minute"        => calendar(v, minute(epochTs(v)))
    case "day_of_week"   => calendar(v, dayofweek(epochTs(v)) - 1) // 0=Sunday, Prom convention
    case "day_of_month"  => calendar(v, dayofmonth(epochTs(v)))
    case "day_of_year"   => calendar(v, dayofyear(epochTs(v)))
    case "days_in_month" => calendar(v, dayofmonth(last_day(epochTs(v))))
    case other => throw new IllegalArgumentException(s"unknown instant function: $other")
  }

  private def calendar(v: Column, field: Column): Column =
    when(notFinite(v), NaNd).otherwise(field.cast("double"))

  /** Calendar functions that, called with NO argument, evaluate over the
    * step grid as time scalars (the reference's ScalarTimeBasedPlan,
    * query/.../LogicalPlan.scala:846-855). */
  val TimeScalarFns: Set[String] = Set("hour", "minute", "month", "year",
    "day_of_week", "day_of_month", "day_of_year", "days_in_month")

  private def epochTs(v: Column): Column = timestamp_seconds(v.cast("long"))
}
