package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.streaming.Gateway

class GatewaySpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()
  import spark.implicits._

  val T = 1465839830100400200L // reference-format ns timestamp
  val TMs = 1465839830100L     // ns → ms drops the last 6 digits

  private def decode(lines: String*) =
    Gateway.influxDecode(lines.toDF("line"), defaultTsMs = 777L).collect()

  test("single-field line → one gauge sample; ns timestamp truncates to ms") {
    val r = decode(s"weather,location=us-midwest temperature=82 $T")
    r.length shouldEqual 1
    r.head.err shouldEqual null
    r.head.metric shouldEqual "weather"
    r.head.tags shouldEqual Map("location" -> "us-midwest")
    r.head.ts shouldEqual TMs
    r.head.value shouldEqual 82.0
    r.head.kind shouldEqual "gauge"
  }

  test("escapes: \\, \\space \\= pass through verbatim (reference parseInner)") {
    val r = decode("""weather,loc\,a=us\ mid,k\=1=v temp\ f=82 """ + T)
    r.length shouldEqual 1
    r.head.tags shouldEqual Map("loc,a" -> "us mid", "k=1" -> "v")
    r.head.metric shouldEqual "weather"
  }

  test("integer suffix and missing timestamp (defaultTsMs, deterministic)") {
    val r = decode("cpu value=42i")
    r.head.value shouldEqual 42.0
    r.head.ts shouldEqual 777L
  }

  test("counter field key selects the counter schema (InfluxPromSingleRecord)") {
    decode(s"requests counter=5 $T").head.kind shouldEqual "counter"
    decode(s"requests total=5 $T").head.kind shouldEqual "gauge"
  }

  test("multi-field → histogram rows: le buckets, +Inf from count, _sum/_count") {
    val r = decode(s"lat,host=a 0.025=1,0.05=3,sum=1.2,count=5 $T")
    val byMetric = r.groupBy(_.metric)
    byMetric("lat_bucket").map(d => d.tags("le") -> d.value).toSet shouldEqual
      Set("0.025" -> 1.0, "0.05" -> 3.0, "+Inf" -> 5.0)
    byMetric("lat_sum").head.value shouldEqual 1.2
    byMetric("lat_count").head.value shouldEqual 5.0
    all(r.map(_.ts)) shouldEqual TMs
    all(r.map(_.tags("host"))) shouldEqual "a"
  }

  test("multi-field non-bucket extras become prom-style <m>_<field> gauges") {
    val r = decode(s"sys used=1,free=2 $T")
    r.map(d => d.metric -> d.value).toSet shouldEqual
      Set("sys_used" -> 1.0, "sys_free" -> 2.0)
  }

  test("rejects carry the line and a reason; good lines unaffected") {
    val r = decode(
      "m f=\"hello\"",        // string-only fields
      "m,broken f=1",          // malformed tag (no =)
      "m f=1 12ab",            // malformed timestamp
      ",t=1 f=1",              // empty measurement
      "justname",              // no fields
      s"ok v=1 $T")
    val errs = r.filter(_.err != null).map(d => d.line -> d.err).toMap
    errs("m f=\"hello\"") shouldEqual "no numeric fields"
    errs("m,broken f=1") shouldEqual "malformed tag"
    errs("m f=1 12ab") shouldEqual "malformed timestamp"
    errs(",t=1 f=1") shouldEqual "empty measurement"
    errs("justname") shouldEqual "no fields"
    r.filter(_.err == null).map(_.metric).toSeq shouldEqual Seq("ok")
  }

  test("reject stats aggregate the parse-error counter by reason") {
    val st = Gateway.influxRejectStats(
        Seq("bad", "worse", s"ok v=1 $T").toDF("line"), 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st shouldEqual Map("no fields" -> 2L)
  }

  test("streaming decode matches batch on the same lines (gateway seam)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val q = Gateway.influxSamples(ms.toDF.toDF("line"), defaultTsMs = 5L)
      .writeStream.format("memory").queryName("gw_out")
      .outputMode("append").start()
    try {
      ms.addData(s"weather,location=us temperature=82 $T", "cpu value=42i", "malformed")
      q.processAllAvailable()
      val got = spark.table("gw_out")
        .select("metric", "ts", "value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = Gateway.influxSamples(
          Seq(s"weather,location=us temperature=82 $T", "cpu value=42i", "malformed")
            .toDF("line"), defaultTsMs = 5L)
        .select("metric", "ts", "value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      got shouldEqual batch
      got shouldEqual Set(("weather", TMs, 82.0), ("cpu", 5L, 42.0))
    } finally q.stop()
  }
}
