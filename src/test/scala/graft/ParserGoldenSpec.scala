package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.promql._

/** Parser round-trips in the style of the reference's ParserSpec: PromQL
  * strings → expected AST, covering shapes not exercised by planner specs. */
class ParserGoldenSpec extends AnyFunSuite with Matchers {

  private def sel(m: String) = Selector(Some(m), Nil)

  test("matcher operator zoo") {
    Parser.parse("""m{a="x", b!="y", c=~"z.*", d!~"w+", e=""}""") shouldEqual
      Selector(Some("m"), Seq(
        LabelMatcher("a", MatchOp.Eq, "x"), LabelMatcher("b", MatchOp.Ne, "y"),
        LabelMatcher("c", MatchOp.Re, "z.*"), LabelMatcher("d", MatchOp.NotRe, "w+"),
        LabelMatcher("e", MatchOp.Eq, "")))
  }

  test("recording-rule metric names with colons") {
    Parser.parse("job:request_rate:sum5m") shouldEqual sel("job:request_rate:sum5m")
  }

  test("unary minus and parentheses") {
    Parser.parse("-(a + b)") shouldEqual
      BinOp("-", NumberLit(0), BinOp("+", sel("a"), sel("b")))
  }

  test("comparison precedence binds looser than arithmetic") {
    Parser.parse("a + b > c * 2") shouldEqual
      BinOp(">", BinOp("+", sel("a"), sel("b")),
        BinOp("*", sel("c"), NumberLit(2)))
  }

  test("set-op chain is left-associative at its level") {
    Parser.parse("a and b unless c") shouldEqual
      BinOp("unless", BinOp("and", sel("a"), sel("b")), sel("c"))
    Parser.parse("a or b and c") shouldEqual // and binds tighter than or
      BinOp("or", sel("a"), BinOp("and", sel("b"), sel("c")))
  }

  test("aggregation clause before or after args") {
    val expected = Agg("sum", sel("m"), None, Seq("job"), Nil)
    Parser.parse("sum by (job) (m)") shouldEqual expected
    Parser.parse("sum(m) by (job)") shouldEqual expected
    Parser.parse("sum without (instance, pod) (m)") shouldEqual
      Agg("sum", sel("m"), None, Nil, Seq("instance", "pod"))
  }

  test("count_values takes a string parameter") {
    Parser.parse("""count_values("version", build_info)""") shouldEqual
      Agg("count_values", sel("build_info"), Some(StringLit("version")), Nil, Nil)
  }

  test("nested function calls with scalar args") {
    Parser.parse("clamp_max(round(m, 0.5), 10)") shouldEqual
      FuncCall("clamp_max", Seq(FuncCall("round", Seq(sel("m"), NumberLit(0.5))), NumberLit(10)))
    Parser.parse("holt_winters(m[10m], 0.5, 0.1)") shouldEqual
      FuncCall("holt_winters", Seq(
        Selector(Some("m"), Nil, Some(600000L)), NumberLit(0.5), NumberLit(0.1)))
  }

  test("ignoring + group_right with include list") {
    Parser.parse("a * ignoring(x) group_right(y, z) b") shouldEqual
      BinOp("*", sel("a"), sel("b"), bool = false,
        Some(VectorMatch(on = false, Seq("x"), groupRight = true, include = Seq("y", "z"))))
  }

  test("durations: weeks, days, fractional-free compounds") {
    Parser.parse("rate(m[1w])") shouldEqual
      FuncCall("rate", Seq(Selector(Some("m"), Nil, Some(604800000L))))
    Parser.parse("rate(m[2d12h])") shouldEqual
      FuncCall("rate", Seq(Selector(Some("m"), Nil, Some(2L * 86400000L + 12L * 3600000L))))
  }

  test("subquery default step (empty step slot)") {
    Parser.parse("min_over_time(m[1h:])") shouldEqual
      FuncCall("min_over_time", Seq(Subquery(sel("m"), 3600000L, None)))
  }

  test("scientific-notation numbers") {
    Parser.parse("m > 1e3") shouldEqual BinOp(">", sel("m"), NumberLit(1000.0))
    Parser.parse("m * 2.5e-2") shouldEqual BinOp("*", sel("m"), NumberLit(0.025))
  }

  test("@ modifier: numeric timestamp, start(), end()") {
    Parser.parse("m @ 1609459200") shouldEqual
      Selector(Some("m"), Nil, None, 0L, Some(1609459200000L))
    Parser.parse("m @ start()") shouldEqual
      Selector(Some("m"), Nil, None, 0L, Some(At.Start))
    Parser.parse("rate(m[5m] @ end())") shouldEqual
      FuncCall("rate", Seq(Selector(Some("m"), Nil, Some(300000L), 0L, Some(At.End))))
  }

  test("top-level subquery with step and offset") {
    Parser.parse("rate(m[6h])[3d:6h] offset 1d") shouldEqual
      Subquery(FuncCall("rate", Seq(Selector(Some("m"), Nil, Some(21600000L)))),
        3L * 86400000L, Some(21600000L), 86400000L)
  }

  test("@ on a subquery") {
    Parser.parse("rate(m[5m])[1h:5m] @ end()") shouldEqual
      Subquery(FuncCall("rate", Seq(Selector(Some("m"), Nil, Some(300000L)))),
        3600000L, Some(300000L), 0L, Some(At.End))
  }

  test("histogram functions parse as ordinary calls") {
    Parser.parse("histogram_quantile(0.9, sum by (le) (rate(m_bucket[5m])))") shouldEqual
      FuncCall("histogram_quantile", Seq(NumberLit(0.9),
        Agg("sum", FuncCall("rate", Seq(Selector(Some("m_bucket"), Nil, Some(300000L)))),
          None, Seq("le"), Nil)))
  }

  test("0-arg time functions") {
    Parser.parse("hour()") shouldEqual FuncCall("hour", Nil)
    Parser.parse("m - day_of_week()") shouldEqual
      BinOp("-", sel("m"), FuncCall("day_of_week", Nil))
  }

  test("shape zoo: real-world query forms parse (round-trip to a plan-able AST)") {
    // shapes lifted from common dashboards + the reference ParserSpec's
    // coverage areas (our own assertions, not a port)
    val ok = Seq(
      """sum(rate(http_requests_total{job="api"}[5m])) by (status)""",
      """histogram_quantile(0.99, sum(rate(req_latency_bucket[5m])) by (le, job))""",
      """1 - (node_memory_free / node_memory_total)""",
      """sum(rate(errs[5m])) / sum(rate(reqs[5m])) > 0.01""",
      """avg_over_time(up{job=~"a|b|c"}[1h:5m])""",
      """max by (pod) (container_memory_usage) / on(pod) kube_pod_limits""",
      """count(up == bool 1) by (cluster)""",
      """(a + b) * (c - d) % e ^ 2""",
      """rate(m{x!~"(?:foo|bar).*"}[10m] offset 1w)""",
      """label_replace(up, "svc", "$1", "pod", "(.*)-[0-9a-f]+")""",
      """clamp(quantile(0.5, m), 0, 100)""",
      """absent(nonexistent{job="x"})""",
      """topk(5, sum_over_time(m[1d])) and on(user) present_over_time(n[1d])""",
      """-sum(m) + +avg(n)""",
      """m @ 1700000000 offset 5m""",
      """scalar(sum(m)) * vector(1)""",
      """sum without (instance) (irate(m[30s]))""",
      """hour() * 60 + minute()""",
      """quantile_over_time(0.95, m{q="v"}[10m])""",
      """predict_linear(m[1h], 3600)"""
    )
    ok.foreach { q =>
      withClue(q)(noException should be thrownBy Parser.parse(q))
    }
    // and a few that must NOT parse
    val bad = Seq("sum(", "m[", "m{a=}", "rate(m[5m]", "m offset", "m @ x", "1 +")
    bad.foreach { q =>
      withClue(q)(an[IllegalArgumentException] should be thrownBy Parser.parse(q))
    }
  }

  test("errors carry position context") {
    val e1 = intercept[IllegalArgumentException](Parser.parse("sum("))
    e1.getMessage should include("parse error")
    intercept[IllegalArgumentException](Parser.parse("m[5x]"))
    intercept[IllegalArgumentException](Parser.parse("""m{a=}"""))
  }

  test("^ is right-associative and binds tighter than unary minus chains") {
    Parser.parse("2 ^ 3 ^ 2") shouldEqual
      BinOp("^", NumberLit(2), BinOp("^", NumberLit(3), NumberLit(2)))
    Parser.parse("a ^ b % c") shouldEqual
      BinOp("%", BinOp("^", sel("a"), sel("b")), sel("c"))
  }

  test("negative offset looks into the future") {
    Parser.parse("m offset -1h") shouldEqual
      Selector(Some("m"), Nil, None, -3600000L)
    Parser.parse("sum_over_time(m[5m] offset -30m)") shouldEqual
      FuncCall("sum_over_time", Seq(Selector(Some("m"), Nil, Some(300000L), -1800000L)))
  }

  test("(expr) offset distributes but skips @-pinned nodes (inner @ is absolute)") {
    Parser.parse("(m @ 100 + n) offset 1h") shouldEqual
      BinOp("+",
        Selector(Some("m"), Nil, None, 0L, Some(100000L)), // pinned: NOT shifted
        Selector(Some("n"), Nil, None, 3600000L))
    // a subquery's own offset shifts its whole inner evaluation — the
    // distribution must not also recurse into its inner expression (the
    // subquery sits under a range fn: bare matrix binop operands are a
    // type error, as in Prometheus)
    Parser.parse("(max_over_time(rate(m[5m])[1h:5m]) + n) offset 30m") shouldEqual
      BinOp("+",
        FuncCall("max_over_time", Seq(
          Subquery(FuncCall("rate", Seq(Selector(Some("m"), Nil, Some(300000L)))),
            3600000L, Some(300000L), 1800000L))),
        Selector(Some("n"), Nil, None, 1800000L))
  }

  test("(expr) @ distributes; inner @ wins") {
    Parser.parse("(m @ 50 + n) @ 100") shouldEqual
      BinOp("+",
        Selector(Some("m"), Nil, None, 0L, Some(50000L)),
        Selector(Some("n"), Nil, None, 0L, Some(100000L)))
  }

  test("time modifiers on literal-only expressions error instead of silently no-op") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("2 @ 100")
    an[IllegalArgumentException] should be thrownBy Parser.parse("(1 + 2) offset 1h")
    an[IllegalArgumentException] should be thrownBy Parser.parse("(2 * 3) @ start()")
  }

  test("group_left without an include list") {
    Parser.parse("a * on(job) group_left b") shouldEqual
      BinOp("*", sel("a"), sel("b"), bool = false,
        Some(VectorMatch(on = true, Seq("job"), groupLeft = true)))
  }

  test("keyword-adjacent identifiers parse as metric names") {
    // 'on', 'bool', 'start' only have meaning in operator/modifier position
    Parser.parse("on") shouldEqual sel("on")
    Parser.parse("bool") shouldEqual sel("bool")
    Parser.parse("start + end") shouldEqual BinOp("+", sel("start"), sel("end"))
  }

  test("duration literal zoo") {
    Parser.parse("m[90s]") shouldEqual Selector(Some("m"), Nil, Some(90000L))
    Parser.parse("m[1w2d]") shouldEqual
      Selector(Some("m"), Nil, Some(604800000L + 2L * 86400000L))
    Parser.parse("m[1h30m15s]") shouldEqual
      Selector(Some("m"), Nil, Some(5415000L))
    Parser.parse("m[500ms]") shouldEqual Selector(Some("m"), Nil, Some(500L))
  }

  test("string escapes in matcher values") {
    Parser.parse("""m{a="x\"y"}""") shouldEqual
      Selector(Some("m"), Seq(LabelMatcher("a", MatchOp.Eq, "x\"y")))
    Parser.parse("""m{a="tab\there"}""") shouldEqual
      Selector(Some("m"), Seq(LabelMatcher("a", MatchOp.Eq, "tab\there")))
  }

  test("chained subqueries postfix-compose") {
    Parser.parse("max_over_time(rate(m[5m])[30m:][1h:10m])") shouldEqual
      FuncCall("max_over_time", Seq(
        Subquery(
          Subquery(FuncCall("rate", Seq(Selector(Some("m"), Nil, Some(300000L)))),
            1800000L, None),
          3600000L, Some(600000L))))
  }

  test("single-quoted strings and empty matcher set") {
    Parser.parse("m{a='x'}") shouldEqual
      Selector(Some("m"), Seq(LabelMatcher("a", MatchOp.Eq, "x")))
    Parser.parse("m{}") shouldEqual sel("m")
  }

  test("limit postfix is sugar for the limit() function, binding loosest") {
    Parser.parse("foo limit 1") shouldEqual
      FuncCall("limit", Seq(NumberLit(1), sel("foo")))
    Parser.parse("foo * bar limit 2") shouldEqual
      FuncCall("limit", Seq(NumberLit(2), BinOp("*", sel("foo"), sel("bar"))))
    Parser.parse("(foo * bar) limit 2") shouldEqual
      FuncCall("limit", Seq(NumberLit(2), BinOp("*", sel("foo"), sel("bar"))))
    Parser.parse("""test{a="b"}[5y] offset 3d limit 3""") shouldEqual
      FuncCall("limit", Seq(NumberLit(3),
        Selector(Some("test"), Seq(LabelMatcher("a", MatchOp.Eq, "b")),
          Some(5L * 31536000000L), 3L * 86400000L)))
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[5m] limit 1m")
    // `limit` stays a valid metric name in operand position
    Parser.parse("sum(limit)") shouldEqual Agg("sum", sel("limit"), None, Nil, Nil)
  }

  test("keywords are case-insensitive (reference grammar fragments)") {
    Parser.parse("""test{a="b"}[5y] OFFSET 3d""") shouldEqual
      Selector(Some("test"), Seq(LabelMatcher("a", MatchOp.Eq, "b")),
        Some(5L * 31536000000L), 3L * 86400000L)
    Parser.parse("""test[5y] OFFSET 3d LIMIT 3""") shouldEqual
      Parser.parse("""test[5y] offset 3d limit 3""")
    Parser.parse("a AND b") shouldEqual BinOp("and", sel("a"), sel("b"))
    Parser.parse("sum BY (job) (m)") shouldEqual Agg("sum", sel("m"), None, Seq("job"), Nil)
    Parser.parse("a + ON(x) b") shouldEqual
      BinOp("+", sel("a"), sel("b"), bool = false, Some(VectorMatch(on = true, Seq("x"))))
  }

  test("Inf and NaN literals in any case; not valid metric names") {
    Parser.parse("Inf") shouldEqual NumberLit(Double.PositiveInfinity)
    Parser.parse("+inf") shouldEqual NumberLit(Double.PositiveInfinity)
    Parser.parse("-Inf") shouldEqual NumberLit(Double.NegativeInfinity)
    Parser.parse("INF + 1") shouldEqual
      BinOp("+", NumberLit(Double.PositiveInfinity), NumberLit(1))
    Parser.parse("metric < -Inf") shouldEqual
      BinOp("<", sel("metric"), NumberLit(Double.NegativeInfinity))
    assert(Parser.parse("NaN").asInstanceOf[NumberLit].v.isNaN)
    assert(Parser.parse("nan").asInstanceOf[NumberLit].v.isNaN)
    an[IllegalArgumentException] should be thrownBy Parser.parse("inf{}")
    an[IllegalArgumentException] should be thrownBy Parser.parse("""Inf{job="api"}""")
    // but Inf/NaN are fine as LABEL names
    Parser.parse("foo{Inf='value'}") shouldEqual
      Selector(Some("foo"), Seq(LabelMatcher("Inf", MatchOp.Eq, "value")))
  }

  test("unary minus folds numeric literals") {
    Parser.parse("-5") shouldEqual NumberLit(-5)
    Parser.parse("+5.5e-3") shouldEqual NumberLit(0.0055)
    Parser.parse("-0755") shouldEqual NumberLit(-755)
    Parser.parse("+1 + -2 * 1") shouldEqual
      BinOp("+", NumberLit(1), BinOp("*", NumberLit(-2), NumberLit(1)))
  }

  test("recording-rule metric names: leading colon, dashes and dots after a colon") {
    Parser.parse(""":node_memory_utilisation:{_ns="cloud"}""") shouldEqual
      Selector(Some(":node_memory_utilisation:"), Seq(LabelMatcher("_ns", MatchOp.Eq, "cloud")))
    Parser.parse("""foo:ba-r:a.b{a="bc"}""") shouldEqual
      Selector(Some("foo:ba-r:a.b"), Seq(LabelMatcher("a", MatchOp.Eq, "bc")))
    // no colon => '-' stays subtraction
    Parser.parse("a-b") shouldEqual BinOp("-", sel("a"), sel("b"))
  }

  test("structural guards: bool off-comparison, set-op grouping, __name__ conflict, zero range") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo + bool bar")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo and bool 10")
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("foo and on(bar) group_left(baz) bar")
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("foo unless on(bar) group_right bar")
    an[IllegalArgumentException] should be thrownBy Parser.parse("""foo{__name__="bar"}""")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[0m]")
    // still-legal neighbors of the guards
    Parser.parse("foo == bool 1") shouldEqual
      BinOp("==", sel("foo"), NumberLit(1), bool = true)
    Parser.parse("foo and on() bar") shouldEqual
      BinOp("and", sel("foo"), sel("bar"), bool = false, Some(VectorMatch(on = true, Nil)))
  }

  test("number literal zoo") {
    Parser.parse(".5") shouldEqual NumberLit(0.5)
    Parser.parse("5.") shouldEqual NumberLit(5.0)
    Parser.parse("0755") shouldEqual NumberLit(755)
    an[IllegalArgumentException] should be thrownBy Parser.parse("2.5.")
    an[IllegalArgumentException] should be thrownBy Parser.parse(".")
  }

  // ----- tranche 3 (round 5): quoted/UTF-8 names, ^ vs unary, duration
  // corner forms, keyword-as-label-name — coverage areas from the
  // reference's ParserSpec (our own assertions, not a port) -----

  test("quoted label names in matchers (UTF-8 names)") {
    Parser.parse("""m{"label with spaces"="v"}""") shouldEqual
      Selector(Some("m"), Seq(LabelMatcher("label with spaces", MatchOp.Eq, "v")))
    Parser.parse("""m{"http.status"=~"5.."}""") shouldEqual
      Selector(Some("m"), Seq(LabelMatcher("http.status", MatchOp.Re, "5..")))
    Parser.parse("""m{"läbel"!="x"}""") shouldEqual
      Selector(Some("m"), Seq(LabelMatcher("läbel", MatchOp.Ne, "x")))
  }

  test("quoted metric name inside braces (UTF-8 names)") {
    Parser.parse("""{"my.metric"}""") shouldEqual sel("my.metric")
    Parser.parse("""{"my.metric", job="api"}""") shouldEqual
      Selector(Some("my.metric"), Seq(LabelMatcher("job", MatchOp.Eq, "api")))
    Parser.parse("""rate({"http.requests.total", code="500"}[5m])""") shouldEqual
      FuncCall("rate", Seq(Selector(Some("http.requests.total"),
        Seq(LabelMatcher("code", MatchOp.Eq, "500")), Some(300000L))))
    // metric set twice -> error, as Prometheus
    an[IllegalArgumentException] should be thrownBy Parser.parse("""foo{"bar"}""")
    an[IllegalArgumentException] should be thrownBy Parser.parse("""{"a", "b"}""")
  }

  test("quoted label names in by/on clauses") {
    Parser.parse("""sum by ("a b") (m)""") shouldEqual
      Agg("sum", sel("m"), None, Seq("a b"), Nil)
    Parser.parse("""x * on("the label") y""") shouldEqual
      BinOp("*", sel("x"), sel("y"), bool = false,
        Some(VectorMatch(on = true, Seq("the label"))))
  }

  test("quoted/UTF-8 names round-trip through the printer") {
    Seq(
      """{"my.metric", job="api"}[5m]""",
      """m{"label with spaces"!~"a.*"}""",
      """sum by ("a b") (rate({"dot.ted"}[5m]))""",
      """{"sum"}""" // a metric literally named like an agg keyword
    ).foreach { q =>
      val ast = Parser.parse(q)
      withClue(s"$q -> ${Printer.print(ast)}")(
        Parser.parse(Printer.print(ast)) shouldEqual ast)
    }
  }

  test("^ binds tighter than unary minus (Prometheus: -2^2 == -(2^2))") {
    Parser.parse("-2^2") shouldEqual
      BinOp("-", NumberLit(0), BinOp("^", NumberLit(2), NumberLit(2)))
    Parser.parse("2^-3") shouldEqual BinOp("^", NumberLit(2), NumberLit(-3))
    Parser.parse("-m^2") shouldEqual
      BinOp("-", NumberLit(0), BinOp("^", sel("m"), NumberLit(2)))
    // right-assoc chain under unary: -2^3^2 = -(2^(3^2))
    Parser.parse("-2^3^2") shouldEqual
      BinOp("-", NumberLit(0),
        BinOp("^", NumberLit(2), BinOp("^", NumberLit(3), NumberLit(2))))
    // unary still binds tighter than * (unchanged)
    Parser.parse("-2 * 3") shouldEqual
      BinOp("*", NumberLit(-2), NumberLit(3))
  }

  test("multi-unit durations with zero components") {
    Parser.parse("""foo{label="bar"}[3d0h25m0s] offset 0d12h15m30s""") shouldEqual
      Selector(Some("foo"), Seq(LabelMatcher("label", MatchOp.Eq, "bar")),
        Some(3L * 86400000L + 25L * 60000L),
        12L * 3600000L + 15L * 60000L + 30000L)
    Parser.parse("m[1m30s] offset 2h15m") shouldEqual
      Selector(Some("m"), Nil, Some(90000L), 2L * 3600000L + 15L * 60000L)
  }

  test("compact @ (no space) with multi-unit offset, reference ParserSpec forms") {
    Parser.parse("""foo{label="bar"}[3d2h25m10s] @600 offset 2d12h15m30s""") shouldEqual
      Selector(Some("foo"), Seq(LabelMatcher("label", MatchOp.Eq, "bar")),
        Some(3L * 86400000L + 2L * 3600000L + 25L * 60000L + 10000L),
        2L * 86400000L + 12L * 3600000L + 15L * 60000L + 30000L,
        Some(600000L))
    Parser.parse("""foo[3d0h25m0s] offset 0d12h15m30s @start()""") shouldEqual
      Selector(Some("foo"), Nil, Some(3L * 86400000L + 25L * 60000L),
        12L * 3600000L + 15L * 60000L + 30000L, Some(At.Start))
  }

  test("subquery with multi-unit window AND step") {
    Parser.parse("""foo[3d2h25m10s:1d4h30m4s] offset 2d12h15m30s""") shouldEqual
      Subquery(sel("foo"),
        3L * 86400000L + 2L * 3600000L + 25L * 60000L + 10000L,
        Some(86400000L + 4L * 3600000L + 30L * 60000L + 4000L),
        2L * 86400000L + 12L * 3600000L + 15L * 60000L + 30000L)
  }

  test("fractional-second @ round-trips exactly") {
    Parser.parse("m @ 1.234") shouldEqual
      Selector(Some("m"), Nil, None, 0L, Some(1234L))
    val ast = Selector(Some("m"), Nil, None, 0L, Some(1700000000001L))
    Parser.parse(Printer.print(ast)) shouldEqual ast
  }

  test("keywords as label names in matchers") {
    Parser.parse("""m{on="x", and="y", bool="z", offset="w", limit="q", by="b"}""") shouldEqual
      Selector(Some("m"), Seq(
        LabelMatcher("on", MatchOp.Eq, "x"), LabelMatcher("and", MatchOp.Eq, "y"),
        LabelMatcher("bool", MatchOp.Eq, "z"), LabelMatcher("offset", MatchOp.Eq, "w"),
        LabelMatcher("limit", MatchOp.Eq, "q"), LabelMatcher("by", MatchOp.Eq, "b")))
    Parser.parse("sum by (by, without) (m)") shouldEqual
      Agg("sum", sel("m"), None, Seq("by", "without"), Nil)
  }

  test("trailing comma in a matcher list is legal") {
    Parser.parse("""m{a="b",}""") shouldEqual
      Selector(Some("m"), Seq(LabelMatcher("a", MatchOp.Eq, "b")))
  }

  test("__name__ via quoted label name still routes to the metric slot") {
    Parser.parse("""{"__name__"="up"}""") shouldEqual sel("up")
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("""up{"__name__"="x"}""")
  }

  // ----- tranche 4 (round 5, late): postfix aggregation clauses, literal-
  // ish label names, column-selector names, malformed-input zoo — further
  // ParserSpec coverage areas (our own assertions, not a port) -----

  test("by/without clause may follow the aggregate's argument list") {
    Parser.parse("sum (m) without (foo)") shouldEqual
      Agg("sum", sel("m"), None, Nil, Seq("foo"))
    Parser.parse("group by(foo)(m)") shouldEqual
      Agg("group", sel("m"), None, Seq("foo"), Nil)
    Parser.parse("sum by ()(m)") shouldEqual Agg("sum", sel("m"), None, Nil, Nil)
  }

  test("keywords are legal inside a without() label list") {
    Parser.parse("sum without(and, by, avg, count)(m)") shouldEqual
      Agg("sum", sel("m"), None, Nil, Seq("and", "by", "avg", "count"))
  }

  test("Inf/NaN are legal label NAMES in matchers") {
    Parser.parse("""foo{NaN="bc", inf="test"}""") shouldEqual
      Selector(Some("foo"), Seq(
        LabelMatcher("NaN", MatchOp.Eq, "bc"), LabelMatcher("inf", MatchOp.Eq, "test")))
  }

  test("bool immediately followed by a parenthesized operand") {
    Parser.parse("4 == bool(2)") shouldEqual
      BinOp("==", NumberLit(4), NumberLit(2), bool = true)
  }

  test("leading and trailing colons in recording-rule names") {
    Parser.parse(""":node_memory_utilisation:{_ns="x"}""") shouldEqual
      Selector(Some(":node_memory_utilisation:"),
        Seq(LabelMatcher("_ns", MatchOp.Eq, "x")))
  }

  test("column-selector metric names keep their ::col suffix") {
    Parser.parse("""rate(m::sum{a="b"}[5m])""") shouldEqual
      FuncCall("rate", Seq(Selector(Some("m::sum"),
        Seq(LabelMatcher("a", MatchOp.Eq, "b")), Some(300000L))))
  }

  test("errors: malformed ranges, offsets and selector bodies") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[5mm]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[1]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("""foo["5m"]""")
    an[IllegalArgumentException] should be thrownBy Parser.parse("some_metric[5m] offset 1")
    an[IllegalArgumentException] should be thrownBy Parser.parse("some_metric offset 1m[5m]")
    // ... regardless of the offset's VALUE (Prometheus rejects the form)
    an[IllegalArgumentException] should be thrownBy Parser.parse("some_metric offset 0s[5m]")
    // ... and across parentheses (parens unwrap to a bare Selector),
    // including zero-valued modifiers — the guard is structural, not
    // value-based (round-5 advice)
    an[IllegalArgumentException] should be thrownBy Parser.parse("(foo offset 1m)[5m]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("(foo offset 0s)[5m]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("((foo offset 0s))[5m]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("(foo @ 100)[5m]")
    // subquery after a modifier stays legal, as in the reference grammar
    Parser.parse("some_metric offset 1m[5m:1m]") shouldEqual
      Subquery(Selector(Some("some_metric"), Nil, None, 60000L), 300000L, Some(60000L))
    an[IllegalArgumentException] should be thrownBy Parser.parse("""some_metric{a=b}""")
    an[IllegalArgumentException] should be thrownBy Parser.parse("""foo{a>="b"}""")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo{1}")
    an[IllegalArgumentException] should be thrownBy Parser.parse("{}")
  }

  test("duration expressions (promql-duration-expr): arithmetic in range, " +
       "subquery step and parenthesized offset; numbers are seconds but a " +
       "LONE number is still rejected") {
    Parser.parse("foo[1h+30m]") shouldEqual
      Selector(Some("foo"), Nil, Some(5400000L))
    Parser.parse("foo[2*1h]") shouldEqual
      Selector(Some("foo"), Nil, Some(7200000L))
    Parser.parse("foo[1h/2]") shouldEqual
      Selector(Some("foo"), Nil, Some(1800000L))
    Parser.parse("foo[(90s)]") shouldEqual
      Selector(Some("foo"), Nil, Some(90000L))
    // numbers are seconds inside compound expressions
    Parser.parse("foo[5m+30]") shouldEqual
      Selector(Some("foo"), Nil, Some(330000L))
    // precedence: * over +, ^ right-assoc, unary minus
    Parser.parse("foo[1h+30m*2]") shouldEqual
      Selector(Some("foo"), Nil, Some(7200000L))
    Parser.parse("foo[2^2^3 * 1s]") shouldEqual
      Selector(Some("foo"), Nil, Some(256000L))
    Parser.parse("foo[1h-(-30m)]") shouldEqual
      Selector(Some("foo"), Nil, Some(5400000L))
    // ^ binds TIGHTER than unary minus, exactly like the scalar grammar:
    // -2^2 is -(2^2) (r13 advisor finding — the old grammar read (-2)^2)
    Parser.parse("foo[1h - -2^2 * 1s]") shouldEqual
      Selector(Some("foo"), Nil, Some(3604000L))
    Parser.parse("foo offset (1h + -2^2 * 1s)") shouldEqual
      Selector(Some("foo"), Nil, None, 3596000L)
    // ...while the exponent itself still accepts a sign: 2^-1 h = 30m
    Parser.parse("foo[2^-1 * 1h]") shouldEqual
      Selector(Some("foo"), Nil, Some(1800000L))
    // subquery: expressions on both range and step
    Parser.parse("foo[1h/2:5m*2]") shouldEqual
      Subquery(Selector(Some("foo"), Nil), 1800000L, Some(600000L))
    // offset takes the PARENTHESIZED form only: `offset 5m + bar` must
    // stay a binary + between two vectors
    Parser.parse("foo offset (1h-10m)") shouldEqual
      Selector(Some("foo"), Nil, None, 3000000L)
    Parser.parse("foo offset -(30m)") shouldEqual
      Selector(Some("foo"), Nil, None, -1800000L)
    Parser.parse("foo offset 5m + bar") shouldEqual
      BinOp("+", Selector(Some("foo"), Nil, None, 300000L), sel("bar"))
    // non-positive / malformed expressions still reject
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[5m-5m]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[5m+bar]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[1h/0]")
  }

  test("range on a parenthesized expression needs a subquery step") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("(foo + bar)[5m]")
    Parser.parse("(foo + bar)[5m:1m]") shouldEqual
      Subquery(BinOp("+", sel("foo"), sel("bar")), 300000L, Some(60000L))
  }

  test("errors: empty input, comments, operator soup, backtick strings") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("")
    an[IllegalArgumentException] should be thrownBy Parser.parse("# just a comment")
    an[IllegalArgumentException] should be thrownBy Parser.parse("-=")
    an[IllegalArgumentException] should be thrownBy Parser.parse("++-++-+-+-<")
    an[IllegalArgumentException] should be thrownBy Parser.parse("e-+=/(0)")
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("label_replace(a, `b`, `cff`, `d`, `.*`)")
  }

  test("info() parses with an optional selector argument; range vectors " +
       "and strings reject (promql-experimental carry)") {
    Parser.parse("info(m)") shouldEqual FuncCall("info", Seq(sel("m")))
    Parser.parse("""info(m, {env="prod"})""") shouldEqual
      FuncCall("info", Seq(sel("m"),
        Selector(None, Seq(LabelMatcher("env", MatchOp.Eq, "prod")))))
    an[IllegalArgumentException] should be thrownBy Parser.parse("info(m[5m])")
    an[IllegalArgumentException] should be thrownBy Parser.parse("""info(m, "x")""")
    an[IllegalArgumentException] should be thrownBy Parser.parse("info()")
  }

  test("non-existent function name is a parse error (closed function set)") {
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("non_existent_function_far_bar(m)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("rrate(m[5m])")
    // known functions still parse
    Parser.parse("sgn(m)") shouldEqual FuncCall("sgn", Seq(sel("m")))
  }

  // tranche 5: the reference ParserSpec's binary-expression TYPE errors —
  // Prometheus rejects these at parse, not at evaluation
  test("set operators require vectors on both sides") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo and 1")
    an[IllegalArgumentException] should be thrownBy Parser.parse("1 and foo")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo or 1")
    an[IllegalArgumentException] should be thrownBy Parser.parse("1 unless foo")
    an[IllegalArgumentException] should be thrownBy Parser.parse("1 and 1")
    an[IllegalArgumentException] should be thrownBy Parser.parse("1 or on(bar) foo")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo and scalar(bar)")
    // vector() restores vector type, so these stay legal
    Parser.parse("foo or vector(0)") shouldEqual
      BinOp("or", sel("foo"), FuncCall("vector", Seq(NumberLit(0))))
  }

  test("scalar-scalar comparisons require the bool modifier") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("1 == 1")
    an[IllegalArgumentException] should be thrownBy Parser.parse("time() > 100")
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("scalar(foo) > scalar(bar)")
    Parser.parse("1 == bool 1") shouldEqual
      BinOp("==", NumberLit(1), NumberLit(1), bool = true)
    Parser.parse("1 < bool 2 - 1 * 2") shouldEqual
      BinOp("<", NumberLit(1),
        BinOp("-", NumberLit(2), BinOp("*", NumberLit(1), NumberLit(2))), bool = true)
    // vector-scalar comparisons never need bool
    Parser.parse("foo > 2") shouldEqual BinOp(">", sel("foo"), NumberLit(2))
  }

  test("vector matching requires vectors; matrix operands are never binop legal") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo == on(bar) 10")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo + on(x) 2")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo + bar[5m]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("bar[5m] / foo")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo + bar[5m:1m]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("-test[5m]")
    // range inside a function argument is of course fine
    Parser.parse("foo / rate(bar[5m])") shouldEqual
      BinOp("/", sel("foo"), FuncCall("rate", Seq(sel("bar").copy(windowMs = Some(300000L)))))
  }

  // ---- tranche 6: function arity + argument types at parse (reference
  // ParserSpec's function-error battery) ----

  test("range functions require a range-vector argument") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("sum_over_time(foo)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("avg_over_time(some_metric)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("rate(foo)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("changes(abcd, some_metric[5m])")
    an[IllegalArgumentException] should be thrownBy Parser.parse("quantile_over_time(foo[5m])")
    Parser.parse("quantile_over_time(0.5, foo[5m])") // (scalar, matrix)
    Parser.parse("rate(foo[5m:1m])")                 // subquery is a matrix
  }

  test("function arity is checked at parse") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("avg_over_time(some_metric[5m], hello)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("round()")
    an[IllegalArgumentException] should be thrownBy Parser.parse("clamp_max(foo)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("histogram_quantile(0.9)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("""label_replace(a, "b", "c", "d")""")
    an[IllegalArgumentException] should be thrownBy Parser.parse("predict_linear(foo[5m])")
    an[IllegalArgumentException] should be thrownBy Parser.parse("holt_winters(foo[5m], 0.5)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("vector()")
    an[IllegalArgumentException] should be thrownBy Parser.parse("scalar()")
    an[IllegalArgumentException] should be thrownBy Parser.parse("time(foo)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("absent()")
    Parser.parse("round(foo)")             // optional scalar arg
    Parser.parse("round(foo, 5)")
    Parser.parse("month()")                // calendar fns allow zero args
    Parser.parse("""label_join(a, "dst", "-", "src1", "src2")""")
  }

  test("parameterized aggregates require their parameter") {
    an[IllegalArgumentException] should be thrownBy Parser.parse("topk(some_metric)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("quantile(some_metric)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("count_values(some_metric)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("""count_values(5, m)""")
    an[IllegalArgumentException] should be thrownBy Parser.parse("sum(a, b)")
    an[IllegalArgumentException] should be thrownBy Parser.parse("sum(foo[5m])") // matrix agg arg
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("sum (some_metric) without (test) by (test)") // double clause
    Parser.parse("""count_values("label", m)""")
    Parser.parse("topk(5, m)")
  }

  test("reference arg order for last_over_time_is_mad_outlier: scalars first") {
    // LogicalPlanParserSpec.scala:72 form
    Parser.parse("""last_over_time_is_mad_outlier(3.0, 1.0, sum(rate(m[5m]))[1d:5m])""")
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("""last_over_time_is_mad_outlier(sum(rate(m[5m]))[1d:5m], 3.0, 1.0)""")
  }

  test("interval-multiple durations: [Ni] windows, Ni offsets, no unit mixing") {
    Parser.parse("foo[5i]") shouldEqual sel("foo").copy(windowSteps = Some(5L))
    Parser.parse("rate(foo[5i])") shouldEqual
      FuncCall("rate", Seq(sel("foo").copy(windowSteps = Some(5L))))
    Parser.parse("foo offset 2i") shouldEqual sel("foo").copy(offsetSteps = 2L)
    Parser.parse("foo offset -2i") shouldEqual sel("foo").copy(offsetSteps = -2L)
    Parser.parse("sum(rate(m[2i]))[10i:1i]") shouldEqual
      Subquery(Agg("sum", FuncCall("rate",
        Seq(sel("m").copy(windowSteps = Some(2L)))), None, Nil, Nil),
        0L, None, rangeSteps = Some(10L), stepSteps = Some(1L))
    // mixing with absolute units is an error (reference AntlrParser:451)
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[1i5m]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[5m1i]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[0i]")
    an[IllegalArgumentException] should be thrownBy
      Parser.parse("some_metric[5m] offset 5m2i")
    // a ZERO absolute segment must not launder the mix, and 0i steps are
    // as illegal as 0s ones
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo[0m1i]")
    an[IllegalArgumentException] should be thrownBy Parser.parse("max_over_time(m[10i:0i])")
    an[IllegalArgumentException] should be thrownBy Parser.parse("max_over_time(m[10m:0s])")
    // duplicate offsets never silently last-win (cross-unit included)
    an[IllegalArgumentException] should be thrownBy Parser.parse("foo offset 1h offset 2i")
    an[IllegalArgumentException] should be thrownBy Parser.parse("(foo offset 1h) offset 2i")
  }

  test("trailing commas in grouping/matching label lists are legal") {
    Parser.parse("sum without(a, b,)(m)") shouldEqual
      Agg("sum", sel("m"), None, Nil, Seq("a", "b"))
    Parser.parse("sum by(and, by, avg, count, alert, annotations, )(m)") shouldEqual
      Agg("sum", sel("m"), None,
        Seq("and", "by", "avg", "count", "alert", "annotations"), Nil)
    Parser.parse("foo and ignoring(test,blub,) bar") shouldEqual
      BinOp("and", sel("foo"), sel("bar"),
        matching = Some(VectorMatch(on = false, Seq("test", "blub"))))
    Parser.parse("foo / on(test,blub, ) group_left(bar) bar") shouldEqual
      BinOp("/", sel("foo"), sel("bar"),
        matching = Some(VectorMatch(on = true, Seq("test", "blub"),
          groupLeft = true, include = Seq("bar"))))
    // empty-after-comma still needs at least the closing paren next
    an[IllegalArgumentException] should be thrownBy Parser.parse("sum by(a,,b)(m)")
  }

  test("NaN-carrying ASTs are equal to themselves (bit-level NumberLit equality)") {
    val a = Parser.parse("vector(NaN)")
    a shouldEqual Parser.parse(Printer.print(a))
    Parser.parse("m > NaN") shouldEqual Parser.parse("m > NaN")
  }

  test("structural matcher/grouping rejections from the reference battery") {
    // colons are metric-name-only
    an[IllegalArgumentException] should be thrownBy Parser.parse("""some_metric{a:b="b"}""")
    // a label cannot be an on() key and a group include at once
    an[IllegalArgumentException] should be thrownBy Parser.parse(
      """http_requests{g="p"} + on(instance) group_left(job,instance) cpu_count{t="s"}""")
    // ignoring() has no such restriction
    Parser.parse(
      """http_requests{g="p"} + ignoring(instance) group_left(job) cpu_count{t="s"}""")
    // unary minus on a string literal
    an[IllegalArgumentException] should be thrownBy Parser.parse("""-"string"""")
  }
}
