package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.Histograms
import graft.operators.RangeFns
import graft.promql.{Parser, PromPlanner, Selector}

class HistogramSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()
  import spark.implicits._

  test("histogram_quantile interpolates within the target bucket") {
    // le [1, 2, +Inf], cumulative [10, 20, 20]; phi=0.75 -> rank 15
    // bucket 2: 1 + (2-1)*(15-10)/(20-10) = 1.5
    val df = Seq((Seq(1.0, 2.0, Double.PositiveInfinity), Seq(10.0, 20.0, 20.0)))
      .toDF("le", "values")
    df.select(Histograms.quantile(0.75, col("le"), col("values")))
      .head().getDouble(0) shouldEqual 1.5 +- 1e-9
    // phi in the +Inf bucket returns the previous bound
    val df2 = Seq((Seq(1.0, 2.0, Double.PositiveInfinity), Seq(10.0, 20.0, 40.0)))
      .toDF("le", "values")
    df2.select(Histograms.quantile(0.9, col("le"), col("values")))
      .head().getDouble(0) shouldEqual 2.0
  }

  test("fraction between bounds uses within-bucket interpolation") {
    val df = Seq((Seq(10.0, 20.0, Double.PositiveInfinity), Seq(10.0, 30.0, 40.0)))
      .toDF("le", "values")
    // cum(15) = 10 + 20*(15-10)/(20-10) = 20; cum(5) = 10*5/10 = 5 -> (20-5)/40
    df.select(Histograms.fraction(5, 15, col("le"), col("values")))
      .head().getDouble(0) shouldEqual (20.0 - 5.0) / 40.0 +- 1e-9
  }

  test("bucket-wise rate over histogram samples matches scalar rate per bucket") {
    val hists = Seq(
      ("s1", 10000L, Seq(10.0, 20.0)),
      ("s1", 20000L, Seq(30.0, 60.0))
    ).toDF("series", "ts", "values")
    val out = Histograms.periodicBucketRate(hists, Seq("series"), "ts",
      20000L, 20000L, 10000L, 20000L, isRate = false)
    val values = out.head().getAs[scala.collection.Seq[Double]]("values")
    val expected0 = RangeFns.extrapolated(0L, 20000L, 2, 10000L, 10.0, 20000L, 30.0,
      isCounter = true, isRate = false)
    val expected1 = RangeFns.extrapolated(0L, 20000L, 2, 10000L, 20.0, 20000L, 60.0,
      isCounter = true, isRate = false)
    values(0) shouldEqual expected0 +- 1e-9
    values(1) shouldEqual expected1 +- 1e-9
  }

  test("exponential histogram converts to explicit cumulative bounds") {
    Histograms.expBucketBound(0, 0) shouldEqual 2.0
    Histograms.expBucketBound(1, 0) shouldEqual math.sqrt(2.0) +- 1e-12
    val df = Seq((0, Seq(1.0, 2.0, 3.0))).toDF("offset", "counts")
    val out = Histograms.fromExponential(df, scale = 0, "offset", "counts").head()
    out.getAs[scala.collection.Seq[Double]]("le").toSeq shouldEqual Seq(2.0, 4.0, 8.0, Double.PositiveInfinity)
    out.getAs[scala.collection.Seq[Double]]("values").toSeq shouldEqual Seq(1.0, 3.0, 6.0, 6.0)
  }

  test("fromExponentialCols handles per-row scales, negative scale and offset") {
    // rows with DIFFERENT (scale, offset): the storage-path form
    val df = Seq(
      (1, 1, -2, Seq(1.0, 1.0, 1.0)), // scale 1: bounds 2^((o+i+1)/2)
      (2, -1, 1, Seq(2.0, 3.0))       // scale -1: bounds 2^((o+i+1)*2)
    ).toDF("id", "scale", "offset", "counts")
    val rows = Histograms.fromExponentialCols(df, col("scale"), col("offset"), "counts")
      .orderBy("id").collect()
    val le1 = rows(0).getAs[scala.collection.Seq[Double]]("le")
    le1(0) shouldEqual math.pow(2.0, -1.0 / 2) +- 1e-12
    le1(1) shouldEqual 1.0 +- 1e-12
    le1(2) shouldEqual math.pow(2.0, 1.0 / 2) +- 1e-12
    le1(3).isPosInfinity shouldBe true
    rows(0).getAs[scala.collection.Seq[Double]]("values").toSeq shouldEqual Seq(1.0, 2.0, 3.0, 3.0)
    val le2 = rows(1).getAs[scala.collection.Seq[Double]]("le")
    le2(0) shouldEqual math.pow(2.0, 4.0) +- 1e-12  // (1+0+1)*2
    le2(1) shouldEqual math.pow(2.0, 6.0) +- 1e-12
    rows(1).getAs[scala.collection.Seq[Double]]("values").toSeq shouldEqual Seq(2.0, 5.0, 5.0)
  }

  test("@ modifier pins evaluation; limit caps series count") {
    val samples = Seq(
      ("a", "1", 1000L, 10.0), ("a", "1", 2000L, 20.0),
      ("a", "2", 1000L, 5.0), ("a", "2", 2000L, 8.0))
      .toDF("metric", "user", "ts", "value")
      .select(col("metric"), map(lit("user"), col("user")).as("tags"), col("ts"), col("value"))
    val ctx = PromPlanner.Ctx(spark, samples, 1000L, 2000L, 1000L, lookbackMs = 1000L)
    // @ 1s: value at ts<=1000 replicated to both steps
    val at = PromPlanner.queryRange(ctx, """a{user="1"} @ 1""")
      .select("step_ts", "value").as[(Long, Double)].collect().sorted
    at shouldEqual Array((1000L, 10.0), (2000L, 10.0))
    Parser.parse("a @ 1.5") shouldEqual Selector(Some("a"), Nil, None, 0L, Some(1500L))
    // limit(1, ...): exactly one series survives
    PromPlanner.queryRange(ctx, "limit(1, sum_over_time(a[1s]))")
      .select("__key").distinct().count() shouldEqual 1L
  }

  test("last_over_time_is_mad_outlier flags only outlier last samples") {
    val ts = Array(1L, 2L, 3L, 4L, 5L)
    val normal = Array(10.0, 11.0, 9.0, 10.0, 10.5)
    RangeFns.LastIsMadOutlier(3.0, 1).eval(ts, normal, 0, 5, 0, 0).isNaN shouldBe true
    val spike = Array(10.0, 11.0, 9.0, 10.0, 50.0)
    RangeFns.LastIsMadOutlier(3.0, 1).eval(ts, spike, 0, 5, 0, 0) shouldEqual 50.0
    // bounds=0: lower only -> upper spike not flagged
    RangeFns.LastIsMadOutlier(3.0, 0).eval(ts, spike, 0, 5, 0, 0).isNaN shouldBe true
  }
}
