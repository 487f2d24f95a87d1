package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.InstantFns

/** The reference's instant-function battery, ported literally
  * (ref:query/src/test/scala/filodb/query/exec/rangefn/
  * InstantFunctionSpec.scala:94-177,392-435): every function must match
  * the scala.math semantics its reference impl is written in —
  * INCLUDING the special values (NaN, ±Inf, zeros, negatives) where
  * Spark's SQL builtins diverge (long-typed ceil/floor, NULL-on-
  * nonpositive logs, NaN-is-largest least/greatest, NaN-to-epoch-0
  * casts). This battery caught all four divergences; the fixes live in
  * [[InstantFns]]. */
class InstantFnsSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()

  // the reference's "special cases" vector, plus -Inf and a beyond-long
  // magnitude (Spark's long-typed floor/ceil would overflow 1e300)
  private val specials = Seq(
    2.0 / 0d, -2.0 / 0d, 4.5, 0d, -2.1, -0.1, 0.3, 5.9, Double.NaN, 3.3, 1e300, -1e300)

  private def eval(name: String, args: Seq[Double] = Nil): Seq[Double] = {
    import spark.implicits._
    specials.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "value")
      .select(col("i"), InstantFns(name, col("value"), args).as("r"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
  }

  private def assertLike(actual: Seq[Double], expected: Seq[Double]): Unit =
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      withClue(s"input ${specials(i)}: ") {
        if (e.isNaN) a.isNaN shouldEqual true
        else if (e.isInfinity) a shouldEqual e
        else a shouldEqual e +- 1e-4
      }
    }

  test("reference battery: abs/ceil/floor/exp/sqrt/sgn match scala.math on " +
       "special values (NaN, ±Inf, beyond-long magnitudes)") {
    assertLike(eval("abs"), specials.map(math.abs))
    assertLike(eval("ceil"), specials.map(math.ceil))
    assertLike(eval("floor"), specials.map(math.floor))
    assertLike(eval("exp"), specials.map(math.exp))
    assertLike(eval("sqrt"), specials.map(math.sqrt))
    assertLike(eval("sgn"), specials.map(v => math.signum(v)))
  }

  test("reference battery: ln/log2/log10 are the Java semantics — " +
       "log(0) = -Inf, log(negative) = NaN, never NULL") {
    assertLike(eval("ln"), specials.map(math.log))
    assertLike(eval("log10"), specials.map(math.log10))
    assertLike(eval("log2"), specials.map(v => math.log10(v) / math.log10(2.0)))
  }

  test("reference battery: clamp_max/clamp_min/clamp propagate NaN like " +
       "math.min/max (Spark's least/greatest order NaN as largest)") {
    assertLike(eval("clamp_max", Seq(4.0)), specials.map(v => math.min(v, 4.0)))
    assertLike(eval("clamp_min", Seq(4.0)), specials.map(v => math.max(v, 4.0)))
    assertLike(eval("clamp", Seq(0.0, 4.0)),
      specials.map(v => math.min(math.max(v, 0.0), 4.0)))
  }

  test("reference battery: round is floor(v/to + 0.5)*to with NaN/±Inf " +
       "passed through unrounded; negative ties round UP") {
    def expected(to: Double): Seq[Double] = specials.map { v =>
      if (v.isNaN || v.isInfinite) v
      else math.floor(v / to + 0.5) * to
    }
    assertLike(eval("round"), expected(1.0))
    assertLike(eval("round", Seq(10.0)), expected(10.0))
    // the half-up-to-ceiling tie Prometheus specifies (floor(x+0.5), NOT
    // Spark's HALF_UP-away-from-zero): round(-2.5) = -2, round(-0.5) = 0
    import spark.implicits._
    val ties = Seq(-2.5, -0.5, 0.5, 2.5).toDF("value")
      .select(InstantFns("round", col("value")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    ties shouldEqual Seq(-2.0, 0.0, 1.0, 3.0)
  }

  test("reference battery: calendar functions on the pinned timestamps " +
       "(leap day, leap-second boundary, a Sunday) and NaN passthrough") {
    import spark.implicits._
    // ref InstantFunctionSpec.scala:392-414
    val ts = Seq(
      1456790399d, // 2016-02-29 23:59:59 February 29th
      1456790400d, // 2016-03-01 00:00:00 March 1st
      1230768000d, // 2009-01-01 00:00:00 just after leap second
      1230767999d, // 2008-12-31 23:59:59 just before leap second
      1569179748d) // 2019-09-22 19:15:48 Sunday
    def evalCal(name: String, vals: Seq[Double]): Seq[Double] =
      vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "value")
        .select(col("i"), InstantFns(name, col("value")).as("r"))
        .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
    evalCal("month", ts) shouldEqual Seq(2.0, 3.0, 1.0, 12.0, 9.0)
    evalCal("year", ts) shouldEqual Seq(2016.0, 2016.0, 2009.0, 2008.0, 2019.0)
    evalCal("minute", ts) shouldEqual Seq(59.0, 0.0, 0.0, 59.0, 15.0)
    evalCal("hour", ts) shouldEqual Seq(23.0, 0.0, 0.0, 23.0, 19.0)
    evalCal("days_in_month", ts) shouldEqual Seq(29.0, 31.0, 31.0, 31.0, 30.0)
    evalCal("day_of_month", ts) shouldEqual Seq(29.0, 1.0, 1.0, 31.0, 22.0)
    evalCal("day_of_week", ts) shouldEqual Seq(1.0, 2.0, 4.0, 3.0, 0.0)
    // NaN (and ±Inf) epoch values answer NaN, never the 1970 dates a
    // silent long cast would produce (ref :416-435)
    val nanish = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    Seq("month", "year", "minute", "hour", "days_in_month", "day_of_month",
      "day_of_week", "day_of_year").foreach { f =>
      withClue(s"$f: ") { evalCal(f, nanish).forall(_.isNaN) shouldEqual true }
    }
  }

  test("instant functions through PromQL keep the fixed semantics: ln of a " +
       "zero-valued series answers -Inf on the step grid") {
    import spark.implicits._
    import graft.promql.PromPlanner
    val samples = Seq(
      ("zero", Map("job" -> "a"), 10000L, 0.0),
      ("zero", Map("job" -> "a"), 20000L, 0.0))
      .toDF("metric", "tags", "ts", "value")
    val ctx = PromPlanner.Ctx(spark, samples, 20000L, 20000L, 1000L)
    val out = PromPlanner.queryRange(ctx, "ln(zero)").collect()
    out.length shouldEqual 1
    out.head.getAs[Double]("value").isNegInfinity shouldEqual true
  }
}
