package graft.promql

/** PromQL pretty-printer — the inverse of Parser, mirroring the
  * reference's LogicalPlanParser (ref: coordinator/.../queryplanner/
  * LogicalPlanParser.scala), which serializes a logical plan back to a
  * query string so plans can be SHIPPED — federated to a remote cluster,
  * logged, or cached by normalized text. Guarantee (spec-enforced):
  * `parse(print(ast)) == ast` for every AST the parser can produce.
  */
object Printer {

  def print(e: PromExpr): String = e match {
    case Selector(metric, matchers, window, offset, at, windowSteps, offsetSteps) =>
      // UTF-8 metric names (dots, spaces, keyword collisions like `sum`)
      // can't stand bare — print them as the quoted in-braces form
      // ({"my.metric", a="b"}), which the parser reads back as the metric
      val base = metric match {
        case Some(m) if safeMetric(m) && matchers.isEmpty => m
        case Some(m) if safeMetric(m) =>
          m + matchers.map(matcherStr).mkString("{", ", ", "}")
        case Some(m) =>
          (quote(m) +: matchers.map(matcherStr)).mkString("{", ", ", "}")
        case None => matchers.map(matcherStr).mkString("{", ", ", "}")
      }
      base + window.map(w => s"[${dur(w)}]")
        .orElse(windowSteps.map(k => s"[${k}i]")).getOrElse("") +
        modifiers(offset, offsetSteps, at)

    case NumberLit(v) => num(v)

    case StringLit(s) => quote(s)

    case FuncCall(name, args) => s"$name(${args.map(print).mkString(", ")})"

    case Agg(op, expr, param, by, without) =>
      val clause =
        if (by.nonEmpty) s" by (${by.map(ident).mkString(", ")}) "
        else if (without.nonEmpty) s" without (${without.map(ident).mkString(", ")}) "
        else ""
      val args = param.map(p => print(p) + ", ").getOrElse("") + print(expr)
      s"$op$clause($args)"

    case BinOp(op, lhs, rhs, bool, matching) =>
      val boolStr = if (bool) " bool" else ""
      val matchStr = matching.map { m =>
        val kind = if (m.on) "on" else "ignoring"
        val grp =
          if (m.groupLeft) " group_left" + includeStr(m.include)
          else if (m.groupRight) " group_right" + includeStr(m.include)
          else ""
        s" $kind(${m.labels.map(ident).mkString(", ")})$grp"
      }.getOrElse("")
      s"${operand(lhs)} $op$boolStr$matchStr ${operand(rhs)}"

    case Subquery(expr, range, step, offset, at, rangeSteps, stepSteps, offsetSteps) =>
      val inner = expr match {
        case _: BinOp => s"(${print(expr)})"
        // a bare negative literal would re-lex with the unary minus OUTSIDE
        // the subquery postfix: -363[1h:] parses as -(363[1h:])
        case n: NumberLit if print(n).startsWith("-") => s"(${print(n)})"
        case _ => print(expr)
      }
      val rangeStr = rangeSteps.map(k => s"${k}i").getOrElse(dur(range))
      val stepStr = stepSteps.map(k => s"${k}i").orElse(step.map(dur)).getOrElse("")
      s"$inner[$rangeStr:$stepStr]" + modifiers(offset, offsetSteps, at)
  }

  /** Parenthesize binary operands: parens group without creating AST nodes,
    * so always-parenthesizing is round-trip-safe and sidesteps precedence
    * bookkeeping (the reference printer does the same for binary joins). */
  private def operand(e: PromExpr): String = e match {
    case _: BinOp => s"(${print(e)})"
    case _ => print(e)
  }

  /** Always parenthesized, even when empty: a bare `group_left` followed
    * by a parenthesized right operand would lex the operand's parens as
    * the include list. */
  private def includeStr(inc: Seq[String]): String = s"(${inc.mkString(", ")})"

  private def matcherStr(m: LabelMatcher): String = {
    val op = m.op match {
      case MatchOp.Eq => "="
      case MatchOp.Ne => "!="
      case MatchOp.Re => "=~"
      case MatchOp.NotRe => "!~"
    }
    s"${ident(m.label)}$op${quote(m.value)}"
  }

  /** A name is bare-safe iff the lexer reads it back as exactly itself;
    * otherwise print the quoted form (UTF-8 label names). */
  private def ident(l: String): String = if (lexesAsId(l)) l else quote(l)

  private def lexesAsId(s: String): Boolean =
    try Parser.lex(s) match {
      case Vector(Parser.TId(id), Parser.TEnd) => id == s
      case _ => false
    } catch { case _: Exception => false }

  /** Metric names additionally collide with literal/keyword call forms
    * (`inf`, `nan`, aggregation operators). */
  private def safeMetric(m: String): Boolean =
    lexesAsId(m) && !m.equalsIgnoreCase("inf") && !m.equalsIgnoreCase("nan") &&
      !Parser.AggOps.contains(m)

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def modifiers(offsetMs: Long, offsetSteps: Long, atMs: Option[Long]): String = {
    val off =
      if (offsetSteps < 0L) s" offset -${-offsetSteps}i"
      else if (offsetSteps > 0L) s" offset ${offsetSteps}i"
      else if (offsetMs == 0L) ""
      else if (offsetMs < 0L) s" offset -${dur(-offsetMs)}"
      else s" offset ${dur(offsetMs)}"
    val at = atMs match {
      case Some(At.Start) => " @ start()"
      case Some(At.End) => " @ end()"
      case Some(ms) => s" @ ${tsSeconds(ms)}"
      case None => ""
    }
    off + at
  }

  /** Exact decimal seconds for an @ timestamp: ms/1000.0 through a double
    * would shave sub-ms FP error off fractional values, breaking the
    * parse(print(ast)) == ast guarantee. Emit the ms remainder digitally. */
  private def tsSeconds(ms: Long): String = {
    val sign = if (ms < 0) "-" else ""
    val a = math.abs(ms)
    val frac = a % 1000
    if (frac == 0L) s"$sign${a / 1000}"
    else s"$sign${a / 1000}.${f"$frac%03d".reverse.dropWhile(_ == '0').reverse}"
  }

  /** Compact duration: greedy w/d/h/m/s/ms decomposition ("90m" stays
    * "1h30m" — equal total ms, so the round-trip AST is identical). */
  private def dur(ms: Long): String = {
    require(ms >= 0, s"negative duration $ms handled by caller")
    if (ms == 0) return "0s"
    val units = Seq("w" -> 604800000L, "d" -> 86400000L, "h" -> 3600000L,
      "m" -> 60000L, "s" -> 1000L, "ms" -> 1L)
    val sb = new StringBuilder
    var rest = ms
    units.foreach { case (u, m) =>
      if (rest >= m) { sb.append(rest / m).append(u); rest %= m }
    }
    sb.toString
  }

  private def num(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    else if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString
    else v.toString.toLowerCase // keeps exponent forms lexable (1.0e21)
}
