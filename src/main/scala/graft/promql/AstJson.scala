package graft.promql

/** JSON AST rendering for `/api/v1/parse_query` (upstream Prometheus 3.x;
  * node shapes follow web/api/v1/translate_ast.go, the renderer Grafana
  * consumes): `vectorSelector`/`matrixSelector` with a `matchers` list,
  * `call`, `aggregation`, `binaryExpr` (+`matching`), `subquery`,
  * `numberLiteral`/`stringLiteral`. Durations render as float seconds,
  * `timestamp` (@ modifier) as epoch millis or null, `startOrEnd` as
  * "start"/"end"/null — upstream's units.
  *
  * Documented divergences (deterministic, pinned in PromApiSpec):
  *  - `parenExpr`/`unaryExpr` nodes never appear: this parser normalizes
  *    parentheses and folds unary sign at parse time (print∘parse is the
  *    engine's canonical form), so the rendered AST is the normalized one.
  *  - `call.func` carries only `{"name": …}` — upstream's
  *    argTypes/variadic/returnType are its function-registry metadata,
  *    not properties of the query string.
  *  - FiloDB-style step-multiple durations (`[3i]`) cannot resolve to
  *    seconds without a query step; they render as `rangeSteps` /
  *    `offsetSteps` counts instead (an engine extension upstream lacks).
  */
object AstJson {

  def render(e: PromExpr): String = e match {
    case s: Selector => selector(s)
    case NumberLit(v) =>
      s"""{"type":"numberLiteral","val":${js(num(v))}}"""
    case StringLit(v) =>
      s"""{"type":"stringLiteral","val":${js(v)}}"""
    case FuncCall(name, args) =>
      s"""{"type":"call","func":{"name":${js(name)}},""" +
        s""""args":[${args.map(render).mkString(",")}]}"""
    case Agg(op, expr, param, by, without) =>
      val grouping = if (without.nonEmpty) without else by
      s"""{"type":"aggregation","op":${js(op)},"expr":${render(expr)},""" +
        s""""param":${param.map(render).getOrElse("null")},""" +
        s""""grouping":[${grouping.map(js).mkString(",")}],""" +
        s""""without":${without.nonEmpty}}"""
    case BinOp(op, lhs, rhs, bool, matching) =>
      val m = matching.map { vm =>
        val card =
          if (vm.groupLeft) "many-to-one"
          else if (vm.groupRight) "one-to-many"
          else "one-to-one"
        s"""{"card":${js(card)},"labels":[${vm.labels.map(js).mkString(",")}],""" +
          s""""on":${vm.on},"include":[${vm.include.map(js).mkString(",")}]}"""
      }.getOrElse("null")
      s"""{"type":"binaryExpr","op":${js(op)},"lhs":${render(lhs)},""" +
        s""""rhs":${render(rhs)},"matching":$m,"bool":$bool}"""
    case Subquery(expr, rangeMs, stepMs, offsetMs, atMs, rangeSteps,
                  stepSteps, offsetSteps) =>
      s"""{"type":"subquery","expr":${render(expr)},""" +
        s""""range":${secs(rangeMs)},"step":${stepMs.map(secs).getOrElse("0")},""" +
        s""""offset":${secs(offsetMs)},${atFields(atMs)}""" +
        stepExt(rangeSteps, stepSteps.isDefined || offsetSteps != 0,
          stepSteps, offsetSteps) + "}"
  }

  private def selector(s: Selector): String = {
    val ms = s.metric.map(m =>
      s"""{"name":"__name__","type":"=","value":${js(m)}}""").toSeq ++
      s.matchers.map { m =>
        val op = m.op match {
          case MatchOp.Eq => "="
          case MatchOp.Ne => "!="
          case MatchOp.Re => "=~"
          case MatchOp.NotRe => "!~"
        }
        s"""{"name":${js(m.label)},"type":"$op","value":${js(m.value)}}"""
      }
    val typ = if (s.windowMs.isDefined || s.windowSteps.isDefined)
      "matrixSelector" else "vectorSelector"
    val range = s.windowMs.map(w => s""""range":${secs(w)},""").getOrElse("")
    s"""{"type":"$typ","name":${js(s.metric.getOrElse(""))},$range""" +
      s""""offset":${secs(s.offsetMs)},${atFields(s.atMs)}""" +
      stepExt(s.windowSteps, s.offsetSteps != 0, None, s.offsetSteps) +
      s""","matchers":[${ms.mkString(",")}]}"""
  }

  /** `timestamp` + `startOrEnd`, resolving the [[At]] sentinels. */
  private def atFields(atMs: Option[Long]): String = atMs match {
    case Some(At.Start) => """"timestamp":null,"startOrEnd":"start""""
    case Some(At.End) => """"timestamp":null,"startOrEnd":"end""""
    case Some(t) => s""""timestamp":$t,"startOrEnd":null"""
    case None => """"timestamp":null,"startOrEnd":null"""
  }

  /** Engine-extension fields for unresolved step-multiple durations;
    * empty when the query used plain durations (the common case). */
  private def stepExt(rangeSteps: Option[Long], hasOffsetish: Boolean,
                      stepSteps: Option[Long], offsetSteps: Long): String = {
    val parts = rangeSteps.map(n => s""""rangeSteps":$n""").toSeq ++
      stepSteps.map(n => s""""stepSteps":$n""").toSeq ++
      (if (offsetSteps != 0) Seq(s""""offsetSteps":$offsetSteps""") else Nil)
    if (parts.isEmpty) "" else parts.mkString(",", ",", "")
  }

  private def secs(ms: Long): String = num(ms / 1000.0)

  private def num(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "+Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    else if (v == v.toLong.toDouble) v.toLong.toString
    else v.toString

  private def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
