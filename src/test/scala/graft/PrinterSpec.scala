package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.promql._

/** Printer round-trips: parse(print(parse(q))) == parse(q) for a broad
  * query corpus — the LogicalPlanParser re-serialization guarantee the
  * reference uses to ship plans across clusters. */
class PrinterSpec extends AnyFunSuite with Matchers {

  private val corpus = Seq(
    // selectors + matchers
    """m""",
    """m{a="x", b!="y", c=~"z.*", d!~"w+", e=""}""",
    """{__name__="m", job="x"}""",
    """job:request_rate:sum5m""",
    """m{a="x\"y"}""",
    """m{a="tab\there\nand\\slash"}""",
    // windows, offsets, @
    """rate(m[5m])""",
    """rate(m[1w2d])""",
    """m[90s]""",
    """m offset 1h""",
    """m offset -30m""",
    """m @ 1609459200""",
    """m @ start()""",
    """rate(m[5m] @ end())""",
    """m @ 1700000000 offset 5m""",
    // functions
    """clamp_max(round(m, 0.5), 10)""",
    """holt_winters(m[10m], 0.5, 0.1)""",
    """quantile_over_time(0.95, m{q="v"}[10m])""",
    """predict_linear(m[1h], 3600)""",
    """hour()""",
    """hour() * 60 + minute()""",
    """label_replace(up, "svc", "$1", "pod", "(.*)-[0-9a-f]+")""",
    """absent(nonexistent{job="x"})""",
    // aggregations
    """sum by (job) (m)""",
    """sum without (instance, pod) (m)""",
    """count_values("version", build_info)""",
    """topk(5, sum_over_time(m[1d]))""",
    """quantile(0.5, m)""",
    """sum(rate(http_requests_total{job="api"}[5m])) by (status)""",
    // binary ops + matching
    """a + b > c * 2""",
    """a and b unless c""",
    """a or b and c""",
    """a * ignoring(x) group_right(y, z) b""",
    """a * on(job) group_left b""",
    """max by (pod) (container_memory_usage) / on(pod) kube_pod_limits""",
    """count(up == bool 1) by (cluster)""",
    """(a + b) * (c - d) % e ^ 2""",
    """2 ^ 3 ^ 2""",
    """-sum(m) + +avg(n)""",
    """1 - (node_memory_free / node_memory_total)""",
    """sum(rate(errs[5m])) / sum(rate(reqs[5m])) > 0.01""",
    """scalar(sum(m)) * vector(1)""",
    // subqueries
    """avg_over_time(up{job=~"a|b|c"}[1h:5m])""",
    """min_over_time(m[1h:])""",
    """rate(foo[5i]) + rate(bar{job="a"}[4i])""",
    """sum_over_time(purchase[2i] offset 1i)""",
    """max_over_time(sum(rate(m[2i]))[10i:1i])""",
    """rate(m[6h])[3d:6h] offset 1d""",
    """rate(m[5m])[1h:5m] @ end()""",
    """max_over_time(rate(m[5m])[30m:][1h:10m])""",
    // numbers
    """m > 1e3""",
    """m * 2.5e-2""",
    """histogram_quantile(0.99, sum(rate(req_latency_bucket[5m])) by (le, job))""",
    """histogram_fraction(0, 100, sum(rate(lat[5m])) by (le))""",
    // round-4 parser breadth: limit postfix, Inf, extended metric names
    """foo limit 1""",
    """foo * bar limit 2""",
    """metric < -Inf""",
    """foo:ba-r:a.b{a="bc"}""",
    """:node_memory_utilisation:{_ns="cloud"}""",
    """-5 * m""",
    """foo and on() bar""",
    // shapes from the reference's LogicalPlanParserSpec round-trip corpus
    """http_requests_total::sum{job="app"}""",
    """http_requests_total:::agg{job="app"}""",
    """1 / (2 + foo)""",
    """5.1 > bool 2.2""",
    """scalar(node_filesystem_size_bytes) - scalar(node_filesystem_free_bytes)""",
    """scalar(time()) - scalar(node_boot_time_seconds)""",
    """absent(sum_over_time(http_requests_total{job="api"}[1h]))""",
    """hist_to_prom_vectors(http_request_latency)""",
    // reference arg order (LogicalPlanParserSpec.scala:72): scalars first,
    // subquery over the AGGREGATED vector last
    """last_over_time_is_mad_outlier(3.0, 1.0, sum(rate(http_requests_total{job="a"}[5m]))[10m:1m])""",
    """ln(topk(1, http_requests_total{job="app"}))""",
    """quantile_over_time(0.5, test{_ws_="demo"}[5m])""",
    """max_over_time(avg_over_time(test{_ws_="demo"}[5m])[10m:1m])""",
    """foo[300s:60s]""",
    """count_values("freq", http_requests_total{job="app"})""",
    """holt_winters(http_requests_total{job="app"}[5m], 0.1, 0.6)""",
    """label_replace(http_requests_total{job="api"}, "dst", "$1-$2", "src", "(.*)-(.*)")"""
  )

  test("parse . print . parse is identity over the corpus") {
    corpus.foreach { q =>
      val ast = Parser.parse(q)
      val printed = Printer.print(ast)
      withClue(s"query: $q\nprinted: $printed\n") {
        Parser.parse(printed) shouldEqual ast
      }
    }
  }

  test("printed durations are compact and exact") {
    Printer.print(Parser.parse("m[90m]")) shouldEqual "m[1h30m]"
    Printer.print(Parser.parse("m[500ms]")) shouldEqual "m[500ms]"
    Printer.print(Parser.parse("m[1w]")) shouldEqual "m[1w]"
  }

  test("negative offsets and @ sentinels survive") {
    Printer.print(Parser.parse("m offset -1h")) shouldEqual "m offset -1h"
    Printer.print(Parser.parse("m @ start()")) shouldEqual "m @ start()"
  }

  test("string escaping survives a double round trip") {
    val q = """m{a="q\"uote", b="new\nline", c="back\\slash"}"""
    val once = Printer.print(Parser.parse(q))
    Parser.parse(once) shouldEqual Parser.parse(q)
    Printer.print(Parser.parse(once)) shouldEqual once
  }
}
