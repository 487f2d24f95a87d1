package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Instant (per-sample scalar) functions — SURVEY.md §2.4. All are
  * codegen'd Catalyst built-ins; `round` reproduces Prometheus half-up
  * rounding to a multiple (floor(v/to + 0.5) * to), and the calendar
  * functions interpret the VALUE as epoch seconds in UTC, like the
  * reference's InstantFunction.scala:272-360.
  */
object InstantFns {

  def apply(name: String, v: Column, args: Seq[Double] = Nil): Column = name match {
    case "abs"   => abs(v)
    case "ceil"  => ceil(v).cast("double")
    case "floor" => floor(v).cast("double")
    case "exp"   => exp(v)
    case "ln"    => log(v)
    case "log2"  => log2(v)
    case "log10" => log10(v)
    case "sqrt"  => sqrt(v)
    case "sgn"   => signum(v)
    case "round" =>
      val to = if (args.nonEmpty) args.head else 1.0
      floor(v / lit(to) + lit(0.5)) * lit(to)
    case "clamp_max" => least(v, lit(args.head))
    case "clamp_min" => greatest(v, lit(args.head))
    case "clamp"     => least(greatest(v, lit(args(0))), lit(args(1)))
    // calendar fns: value is epoch SECONDS (UTC)
    case "month"         => month(epochTs(v)).cast("double")
    case "year"          => year(epochTs(v)).cast("double")
    case "hour"          => hour(epochTs(v)).cast("double")
    case "minute"        => minute(epochTs(v)).cast("double")
    case "day_of_week"   => (dayofweek(epochTs(v)) - 1).cast("double") // 0=Sunday, Prom convention
    case "day_of_month"  => dayofmonth(epochTs(v)).cast("double")
    case "day_of_year"   => dayofyear(epochTs(v)).cast("double")
    case "days_in_month" => dayofmonth(last_day(epochTs(v))).cast("double")
    case other => throw new IllegalArgumentException(s"unknown instant function: $other")
  }

  /** Calendar functions that, called with NO argument, evaluate over the
    * step grid as time scalars (the reference's ScalarTimeBasedPlan,
    * query/.../LogicalPlan.scala:846-855). */
  val TimeScalarFns: Set[String] = Set("hour", "minute", "month", "year",
    "day_of_week", "day_of_month", "day_of_year", "days_in_month")

  private def epochTs(v: Column): Column = timestamp_seconds(v.cast("long"))
}
