package graft.promql

import scala.collection.mutable.ArrayBuffer

/** Hand-written PromQL lexer + recursive-descent parser with the standard
  * precedence ladder (or < and/unless < comparisons < +- < * / % < ^,
  * ^ right-associative). Grammar follows the published PromQL spec and the
  * reference's ANTLR grammar surface
  * (/root/reference/prometheus/src/main/java/filodb/prometheus/antlr/PromQL.g4);
  * the implementation is original.
  */
object Parser {

  // ----- lexer -----

  sealed trait Tok
  case class TId(s: String) extends Tok
  case class TNum(v: Double) extends Tok
  case class TDur(ms: Long) extends Tok
  /** FiloDB interval-multiple duration: `Ni` = N x the query step
    * (reference TimeUnits.scala IntervalMultiple); never mixes with
    * absolute units. */
  case class TDurSteps(n: Long) extends Tok
  case class TStr(s: String) extends Tok
  case class TOp(s: String) extends Tok   // operators and punctuation
  case object TEnd extends Tok

  private val unitMs = Map("ms" -> 1L, "s" -> 1000L, "m" -> 60000L, "h" -> 3600000L,
    "d" -> 86400000L, "w" -> 604800000L, "y" -> 31536000000L)

  def lex(q: String): Vector[Tok] = lexWithPos(q)._1

  /** [[lex]] plus each token's CHARACTER start offset in `q` (TEnd gets
    * `q.length`) — what upstream-compatible error positions (`line:col:
    * parse error ...`, the ranges Grafana underlines from) derive from;
    * token ordinals alone cannot reproduce them. */
  def lexWithPos(q: String): (Vector[Tok], Vector[Int]) = {
    val out = ArrayBuffer[Tok]()
    val starts = ArrayBuffer[Int]()
    def emit(start: Int, t: Tok): Unit = { out += t; starts += start }
    var i = 0
    val n = q.length
    def peek(k: Int) = if (i + k < n) q(i + k) else '\u0000'
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        while (i < n && (q(i).isDigit || q(i) == '.' || q(i) == 'e' || q(i) == 'E' ||
          ((q(i) == '+' || q(i) == '-') && (q(i - 1) == 'e' || q(i - 1) == 'E')))) i += 1
        val numStr = q.substring(start, i)
        // duration? digits followed by a unit (5m, 1h30m, 10s, 1ms...)
        if (i < n && (q(i).isLetter) && !numStr.contains('.') && !numStr.toLowerCase.contains('e')) {
          var total = 0L
          var numPart = numStr
          var ok = true
          var sawAbsUnit = false // any ms-unit segment, even zero-valued
          var j = i
          while (ok) {
            val us = j
            while (j < n && q(j).isLetter) j += 1
            val unit = q.substring(us, j)
            unitMs.get(unit) match {
              case Some(m) =>
                total += numPart.toLong * m
                sawAbsUnit = true
                val ns = j
                while (j < n && q(j).isDigit) j += 1
                if (j > ns) numPart = q.substring(ns, j)
                else { ok = false; i = j; emit(start, TDur(total)) }
              case None if unit == "i" =>
                // FiloDB interval-multiple: whole-token only, never mixed
                // with absolute units (ref AntlrParser.scala:451) — flag,
                // not total, so a zero segment like `0m1i` still rejects
                if (sawAbsUnit || (j < n && q(j).isDigit))
                  throw new IllegalArgumentException(
                    s"interval-multiple 'i' cannot mix with other duration units in: $q")
                emit(start, TDurSteps(numPart.toLong))
                i = j
                ok = false
              case None if unit.isEmpty =>
                emit(start, TNum(numStr.toDouble))
                ok = false
              case None =>
                throw new IllegalArgumentException(s"bad duration unit '$unit' at $us in: $q")
            }
          }
        } else emit(start, TNum(numStr.toDouble))
      }
      else if (c.isLetter || c == '_' ||
               (c == ':' && (peek(1).isLetter || peek(1) == '_' || peek(1) == ':'))) {
        // recording-rule names may START with ':' and, once a ':' appears,
        // may continue with '-'/'.' (ref grammar IDENTIFIER_EXTENDED:
        // `foo:ba-r:a.b`); a plain `a-b` stays a subtraction
        val start = i
        var seenColon = c == ':'
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_' || q(i) == ':' ||
               ((q(i) == '-' || q(i) == '.') && seenColon))) {
          if (q(i) == ':') seenColon = true
          i += 1
        }
        emit(start, TId(q.substring(start, i)))
      }
      else if (c == '"' || c == '\'') {
        val start = i
        val quote = c; i += 1
        val sb = new StringBuilder
        while (i < n && q(i) != quote) {
          if (q(i) == '\\' && i + 1 < n) { sb.append(unescape(q(i + 1))); i += 2 }
          else { sb.append(q(i)); i += 1 }
        }
        i += 1
        emit(start, TStr(sb.toString))
      }
      else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (Set("==", "!=", "=~", "!~", ">=", "<=").contains(two)) { emit(i, TOp(two)); i += 2 }
        else { emit(i, TOp(c.toString)); i += 1 }
      }
    }
    emit(n, TEnd)
    (out.toVector, starts.toVector)
  }

  private def unescape(c: Char): Char = c match {
    case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'; case other => other
  }

  // ----- parser -----

  val AggOps: Set[String] = Set("sum", "min", "max", "avg", "count", "group", "stddev",
    "stdvar", "topk", "bottomk", "quantile", "count_values", "limitk", "limit_ratio")

  /** The closed function set (FiloDB has no UDF surface — PlanEnums.scala
    * is a closed enum; same contract here). Kept in sync with
    * PromPlanner.planFunc / InstantFns by the full query suite. */
  val KnownFunctions: Set[String] = Set(
    // range functions
    "rate", "increase", "delta", "idelta", "irate", "resets", "changes", "deriv",
    "predict_linear", "holt_winters", "double_exponential_smoothing",
    "sum_over_time", "avg_over_time",
    "count_over_time", "min_over_time", "max_over_time", "stddev_over_time",
    "stdvar_over_time", "quantile_over_time", "mad_over_time", "last_over_time",
    "last", "timestamp", "present_over_time", "absent_over_time", "z_score",
    "last_over_time_is_mad_outlier",
    "ts_of_last_over_time", "ts_of_max_over_time", "ts_of_min_over_time",
    // instant functions
    "abs", "ceil", "floor", "exp", "ln", "log2", "log10", "sqrt", "sgn", "round",
    "clamp", "clamp_max", "clamp_min",
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "asinh", "acosh", "atanh", "deg", "rad", "pi",
    "month", "year", "hour", "minute", "day_of_week", "day_of_month",
    "day_of_year", "days_in_month",
    // histogram functions
    "histogram_quantile", "histogram_fraction", "histogram_bucket",
    "histogram_max_quantile", "histogram_max_quantile_even",
    "histogram_count", "histogram_sum", "histogram_avg",
    "histogram_stddev", "histogram_stdvar",
    "hist_to_prom_vectors",
    // scalar / misc
    "absent", "vector", "scalar", "time", "sort", "sort_desc",
    "sort_by_label", "sort_by_label_desc", "limit", "info",
    "label_replace", "label_join", "or_vector", "no_optimize",
    "optimize_with_agg", "_filodb_chunkmeta_all")

  /** Parse-time argument signatures (Prometheus checks arity and operand
    * types at parse; the reference ParserSpec's function-error battery —
    * `sum_over_time(foo)`, `avg_over_time(m[5m], hello)`, `topk(m)` … —
    * all reject before planning). Each entry is (types, minArgs) with
    * types.length = maxArgs. Type letters:
    *   'm' range vector (range selector / subquery)
    *   's' scalar-typed expression
    *   'S' string literal
    *   'v' instant vector — scalars allowed too (the reference grammar
    *       accepts `floor(1)`; its scalar args plan as constant vectors)
    *   'e' vector or range vector (timestamp/last accept both here)
    * label_join's trailing string list is variadic and special-cased. */
  val FunctionSigs: Map[String, (String, Int)] = {
    val m1 = Seq("rate", "increase", "delta", "idelta", "irate", "resets",
      "changes", "deriv", "z_score", "sum_over_time", "avg_over_time",
      "count_over_time", "min_over_time", "max_over_time", "stddev_over_time",
      "stdvar_over_time", "last_over_time", "present_over_time",
      "absent_over_time", "mad_over_time",
      "ts_of_last_over_time", "ts_of_max_over_time",
      "ts_of_min_over_time").map(_ -> ("m", 1))
    val v1 = Seq("abs", "ceil", "floor", "exp", "ln", "log2", "log10", "sqrt",
      "sgn", "sort", "sort_desc", "scalar", "hist_to_prom_vectors",
      "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
      "asinh", "acosh", "atanh", "deg", "rad",
      "no_optimize", "optimize_with_agg").map(_ -> ("v", 1))
    val cal = Seq("month", "year", "hour", "minute", "day_of_week",
      "day_of_month", "day_of_year", "days_in_month").map(_ -> ("v", 0))
    (m1 ++ v1 ++ cal ++ Seq(
      "predict_linear" -> ("ms", 2),
      "holt_winters" -> ("mss", 3),
      "double_exponential_smoothing" -> ("mss", 3),
      "quantile_over_time" -> ("sm", 2),
      "last_over_time_is_mad_outlier" -> ("ssm", 3),
      "last" -> ("e", 1), "timestamp" -> ("e", 1),
      "info" -> ("vv", 1),
      "round" -> ("vs", 1),
      "clamp" -> ("vss", 3), "clamp_max" -> ("vs", 2), "clamp_min" -> ("vs", 2),
      "histogram_quantile" -> ("sv", 2),
      "histogram_count" -> ("v", 1),
      "histogram_sum" -> ("v", 1),
      "histogram_avg" -> ("v", 1),
      "histogram_stddev" -> ("v", 1),
      "histogram_stdvar" -> ("v", 1),
      "histogram_fraction" -> ("ssv", 3),
      "histogram_bucket" -> ("sv", 2),
      "histogram_max_quantile" -> ("svvv", 3),
      "histogram_max_quantile_even" -> ("svvv", 3),
      "absent" -> ("e", 1),
      "vector" -> ("s", 1),
      "time" -> ("", 0),
      "pi" -> ("", 0),
      "limit" -> ("sv", 2),
      "label_replace" -> ("vSSSS", 5),
      "or_vector" -> ("vs", 2),
      "_filodb_chunkmeta_all" -> ("e", 1))).toMap
  }

  def parse(query: String): PromExpr = {
    val (toks, starts) = lexWithPos(query)
    new P(toks, starts, query).parseAll()
  }

  /** Parse a standalone Prometheus duration string ("5m", "90s", "1h30m"),
    * as accepted by the HTTP API's `step` parameter. */
  def parseDuration(s: String): Long = lex(s) match {
    case Vector(TDur(ms), TEnd) => ms
    case _ => throw new IllegalArgumentException(s"not a duration: '$s'")
  }

  private class P(toks: Vector[Tok], starts: Vector[Int] = Vector.empty,
                  query: String = "") {
    private var pos = 0
    // AST nodes that had an offset/@ clause WRITTEN on them, even if
    // zero-valued. Prometheus rejects modifier-then-range regardless of the
    // offset's value; a value check (offsetMs != 0) let `(foo offset 0s)
    // [5m]` slip through the fresh postfix chain after the parens. Identity
    // tracking keeps this structural fact out of the AST (equality, golden
    // specs and the printer are unaffected).
    private val modWritten =
      java.util.Collections.newSetFromMap(new java.util.IdentityHashMap[PromExpr, java.lang.Boolean]())
    private def markMod(e: PromExpr): PromExpr = { modWritten.add(e); e }
    private def cur: Tok = toks(pos)
    private def peek: Tok = if (pos + 1 < toks.length) toks(pos + 1) else TEnd
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def expectOp(s: String): Unit = cur match {
      case TOp(`s`) => pos += 1
      case other => fail(s"expected '$s' got $other")
    }
    /** Upstream-style CHARACTER-positioned message (`line:col: parse
      * error: ...`, 1-based — the ranges Grafana's error underlining and
      * promtool key on); token-ordinal fallback only for the
      * position-less [[P]] constructions (none in production paths). */
    private def fail(msg: String) = {
      if (starts.isEmpty || pos >= starts.length)
        throw new IllegalArgumentException(
          s"PromQL parse error at token $pos: $msg")
      val off = math.min(starts(pos), query.length)
      val before = query.substring(0, off)
      val line = before.count(_ == '\n') + 1
      val col = off - before.lastIndexOf('\n')
      throw new IllegalArgumentException(s"$line:$col: parse error: $msg")
    }

    def parseAll(): PromExpr = {
      val e = parseOr()
      if (cur != TEnd) fail(s"trailing input: $cur")
      e
    }

    /** Keywords are case-insensitive, as in the reference grammar (PromQL.g4
      * defines every keyword token from case-insensitive fragments). */
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TId(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }

    /** Lowest level: or-chains plus the `expr limit N` postfix (a FiloDB
      * extension, ref PromQL.g4 `vectorExpression limit` #limitOperation) —
      * sugar for the `limit(N, expr)` function form. */
    private def parseOr(): PromExpr = {
      var e = binLevel(Seq("or"), parseAndUnless _)
      while (isKw(cur, "limit")) {
        advance()
        cur match {
          case TNum(k) => advance(); e = FuncCall("limit", Seq(NumberLit(k), e))
          case other => fail(s"limit expects a number of series, got $other")
        }
      }
      e
    }
    private def parseAndUnless(): PromExpr = binLevel(Seq("and", "unless"), parseCompare _)
    private def parseCompare(): PromExpr =
      binLevel(Seq("==", "!=", ">", "<", ">=", "<="), parseAddSub _)
    private def parseAddSub(): PromExpr = binLevel(Seq("+", "-"), parseMulDiv _)
    // `atan2` is a keyword binary operator at */-precedence (upstream
    // promql 3); binLevel only matches it at OPERATOR position, so a
    // metric named atan2 still parses as a selector operand
    private def parseMulDiv(): PromExpr = binLevel(Seq("*", "/", "%", "atan2"), parsePow _)
    private def parsePow(): PromExpr = {
      val lhs = parseUnary()
      cur match {
        case TOp("^") =>
          advance()
          val (bool, matching) = parseModifiers()
          BinOp("^", lhs, parsePow(), bool, matching) // right-assoc
        case _ => lhs
      }
    }

    private val ComparisonOps = Set("==", "!=", ">", "<", ">=", "<=")
    private val SetOps = Set("and", "or", "unless")

    private def binLevel(ops: Seq[String], next: () => PromExpr): PromExpr = {
      var lhs = next()
      var done = false
      while (!done) cur match {
        case TOp(o) if ops.contains(o) =>
          advance()
          val (bool, matching) = parseModifiers()
          lhs = mkBinOp(o, lhs, next(), bool, matching)
        case TId(o) if ops.contains(o.toLowerCase) => // and/or/unless, any case
          advance()
          val (bool, matching) = parseModifiers()
          lhs = mkBinOp(o.toLowerCase, lhs, next(), bool, matching)
        case _ => done = true
      }
      lhs
    }

    /** Static operand type at parse time, mirroring Prometheus' checker
      * (and PromPlanner.isScalarTyped): scalar = one value per step. */
    private def scalarTyped(e: PromExpr): Boolean = e match {
      case NumberLit(_) => true
      case FuncCall("scalar", _) => true
      case FuncCall("time", Seq()) => true
      case FuncCall("pi", Seq()) => true
      case FuncCall(n, Seq())
        if graft.operators.InstantFns.TimeScalarFns.contains(n) => true
      case BinOp(_, l, r, _, _) => scalarTyped(l) && scalarTyped(r)
      case _ => false
    }

    /** Matrix-typed operand (range selector / subquery): legal only as a
      * range-function argument, never as a binary operand. */
    private def matrixTyped(e: PromExpr): Boolean = e match {
      case s: Selector => s.windowMs.isDefined || s.windowSteps.isDefined
      case _: Subquery => true
      case _ => false
    }

    /** Structural guards the reference parser enforces (ParserSpec):
      * `bool` only on comparisons; set operators never carry
      * group_left/group_right (their result cardinality is inherent);
      * set ops and vector matching need vectors on both sides;
      * scalar-scalar comparisons require `bool`; matrix operands are
      * never legal in a binary expression. */
    private def mkBinOp(op: String, lhs: PromExpr, rhs: PromExpr,
                        bool: Boolean, matching: Option[VectorMatch]): BinOp = {
      if (bool && !ComparisonOps.contains(op))
        fail(s"bool modifier only applies to comparison operators, not '$op'")
      if (SetOps.contains(op) && matching.exists(m => m.groupLeft || m.groupRight))
        fail(s"group_left/group_right are not allowed with set operator '$op'")
      if (matrixTyped(lhs) || matrixTyped(rhs))
        fail(s"binary expression '$op' must contain only scalar and instant vector types")
      val (ls, rs) = (scalarTyped(lhs), scalarTyped(rhs))
      if (SetOps.contains(op) && (ls || rs))
        fail(s"set operator '$op' not allowed in binary scalar expression")
      if (ComparisonOps.contains(op) && ls && rs && !bool)
        fail("comparisons between scalars must use BOOL modifier")
      if (matching.isDefined && (ls || rs))
        fail("vector matching only allowed between instant vectors")
      BinOp(op, lhs, rhs, bool, matching)
    }

    /** [bool] [on(...)|ignoring(...)] [group_left|group_right [(...)]] */
    private def parseModifiers(): (Boolean, Option[VectorMatch]) = {
      var bool = false
      if (isKw(cur, "bool")) { bool = true; advance() }
      var matching: Option[VectorMatch] = None
      if (isKw(cur, "on") || isKw(cur, "ignoring")) {
        val on = isKw(cur, "on")
        advance()
        val labels = parseLabelList()
        var vm = VectorMatch(on = on, labels = labels)
        if (isKw(cur, "group_left") || isKw(cur, "group_right")) {
          val left = isKw(cur, "group_left")
          advance()
          val include = cur match {
            case TOp("(") => parseLabelList()
            case _ => Nil
          }
          vm = vm.copy(groupLeft = left, groupRight = !left, include = include)
          // a label cannot be both a join key and a carried-over extra
          // (ref ParserSpec: on(instance) group_left(job,instance) fails)
          val dup = vm.include.intersect(vm.labels)
          if (vm.on && dup.nonEmpty)
            fail(s"label '${dup.head}' must not occur in ON and GROUP clause at once")
        }
        matching = Some(vm)
      }
      (bool, matching)
    }

    private def parseLabelList(): Seq[String] = {
      expectOp("(")
      val out = ArrayBuffer[String]()
      var done = cur == TOp(")")
      while (!done) {
        cur match {
          case TId(l) => out += l; advance()
          // quoted label names (Prometheus 3 UTF-8 names): by ("a b")
          case TStr(l) => out += l; advance()
          case other => fail(s"expected label name, got $other")
        }
        cur match {
          // trailing comma before ')' is legal in every grouping list
          // (ref ParserSpec: `sum without(a, b,)(m)`, `on(x,) group_left`)
          case TOp(",") => advance(); done = cur == TOp(")")
          case _ => done = true
        }
      }
      expectOp(")")
      out.toSeq
    }

    private def parseUnary(): PromExpr = cur match {
      case TOp("-") =>
        advance()
        // ^ binds TIGHTER than unary minus (Prometheus: -2^2 == -(2^2));
        // parse the operand at the pow level, then negate
        parsePow() match {
          // fold literal negation so `-5`/`-Inf` are literals (Prometheus
          // semantics, and what the printer round-trip needs)
          case NumberLit(v) => NumberLit(-v)
          case e if matrixTyped(e) || e.isInstanceOf[StringLit] =>
            // Prometheus: `-test[5m]` and `-"string"` are parse errors
            fail("unary expression only allowed on scalars or instant vectors")
          case e => BinOp("-", NumberLit(0), e)
        }
      case TOp("+") => advance(); parsePow()
      case _ => parsePostfix(parsePrimary())
    }

    // ----- duration expressions (upstream promql-duration-expr,
    // experimental in Prometheus 3.4+): arithmetic over durations and
    // bare numbers (both carried in SECONDS, so `5m * 2` = 600s and
    // `[300]` = 5m), with + - * / % ^, parentheses and unary minus.
    // Allowed in full inside [range] / [range:step]; after `offset` only
    // a simple duration or a PARENTHESIZED expression is accepted —
    // `foo offset 5m + bar` must stay the binary + of two vectors. -----

    /** Full duration expression, in seconds. */
    private def parseDurExpr(): Double = {
      var v = parseDurTerm()
      var done = false
      while (!done) cur match {
        case TOp("+") => advance(); v += parseDurTerm()
        case TOp("-") => advance(); v -= parseDurTerm()
        case _ => done = true
      }
      v
    }

    private def parseDurTerm(): Double = {
      var v = parseDurPow()
      var done = false
      while (!done) cur match {
        case TOp("*") => advance(); v *= parseDurPow()
        case TOp("/") => advance(); v /= parseDurPow()
        case TOp("%") => advance(); v %= parseDurPow()
        case _ => done = true
      }
      v
    }

    private def parseDurPow(): Double = {
      val base = parseDurUnary()
      cur match {
        case TOp("^") => advance(); math.pow(base, parseDurPow()) // right-assoc
        case _ => base
      }
    }

    private def parseDurUnary(): Double = cur match {
      // like the scalar grammar's parseUnary: `^` binds TIGHTER than unary
      // minus, so the negated operand is parsed at the pow level —
      // `-2^2 * 1s` is -(2^2) = -4s, not (-2)^2 (r13 advisor finding)
      case TOp("-") => advance(); -parseDurPow()
      case TOp("+") => advance(); parseDurPow()
      case TOp("(") =>
        advance()
        val v = parseDurExpr()
        expectOp(")")
        v
      case TDur(ms) => advance(); ms / 1000.0
      case TNum(v) => advance(); v
      case other => fail(s"expected duration expression, got $other")
    }

    private def durToMs(secs: Double, what: String): Long = {
      if (secs.isNaN || secs.isInfinite)
        fail(s"$what duration expression is not finite")
      math.round(secs * 1000)
    }

    /** selector/paren followed by [range], [range:step], offset. */
    private def parsePostfix(e0: PromExpr): PromExpr = {
      var e = e0
      var done = false
      // Prometheus rejects offset/@ BEFORE the range regardless of value
      // ("no offset modifiers allowed before range selector") — a value
      // check (offsetMs != 0) would let `offset 0s [5m]` slip through
      var modifierSeen = false
      var offsetSeen = false // Prometheus: at most one offset per chain
      while (!done) cur match {
        case TOp("[") =>
          advance()
          // (ms duration, step-multiple) — exactly one is set; `Ni` is
          // FiloDB's interval-multiple notation, resolved at plan time
          val (rangeMs, rangeSteps) = cur match {
            case TDurSteps(k) => advance(); (0L, Some(k))
            // a LONE bare number is not a duration (classic `foo[1]`
            // rejection stands); numbers are legal inside compound
            // duration expressions only
            case TNum(_) if peek == TOp("]") || peek == TOp(":") =>
              fail(s"expected duration in range, got $cur")
            case _ => (durToMs(parseDurExpr(), "range"), None)
          }
          if (rangeSteps.isEmpty && rangeMs <= 0L)
            fail(s"range duration must be positive, got ${rangeMs}ms")
          if (rangeSteps.exists(_ <= 0L))
            fail(s"range duration must be positive, got ${rangeSteps.get}i")
          cur match {
            case TOp(":") => // subquery
              advance()
              val (step, stepSteps) = cur match {
                case TDurSteps(k) => advance(); (None, Some(k))
                case TOp("]") => (None, None)
                case TNum(_) if peek == TOp("]") =>
                  fail(s"expected duration as subquery step, got $cur")
                case _ => (Some(durToMs(parseDurExpr(), "subquery step")), None)
              }
              if (step.exists(_ <= 0L) || stepSteps.exists(_ <= 0L))
                fail("subquery step must be positive")
              expectOp("]")
              e = Subquery(e, rangeMs, step,
                rangeSteps = rangeSteps, stepSteps = stepSteps)
              // the subquery is a NEW node: a following offset belongs to
              // it, not to the inner selector whose offset already closed
              offsetSeen = false
            case TOp("]") =>
              advance()
              e = e match {
                // modifiers must FOLLOW the range; a second range on a
                // range selector is likewise an error. The flag catches a
                // modifier in THIS postfix chain, the modWritten identity
                // set catches one applied inside parentheses — `(foo
                // offset 0s)[5m]` unwraps to a bare Selector in a fresh
                // chain, rejected regardless of the offset's value
                case _ if modifierSeen =>
                  fail("offset/@ modifiers must come after the range selector")
                case s: Selector if modWritten.contains(s) =>
                  fail("offset/@ modifiers must come after the range selector")
                case s: Selector if s.windowMs.isDefined || s.windowSteps.isDefined =>
                  fail("range selector already has a range")
                case s: Selector if rangeSteps.isDefined =>
                  s.copy(windowSteps = rangeSteps)
                case s: Selector => s.copy(windowMs = Some(rangeMs))
                case other => fail(s"range [] applies to selectors, got $other")
              }
            case other => fail(s"expected ':' or ']' got $other")
          }
        case TOp("@") =>
          advance()
          modifierSeen = true
          val at = cur match {
            // round, don't truncate: "@ 1.234" lexes to a double a hair
            // below 1.234, and toLong would drift 1234 -> 1233 -> 1232
            // across print/parse round-trips
            case TNum(v) => advance(); math.round(v * 1000)
            case t if isKw(t, "start") => advance(); expectOp("("); expectOp(")"); At.Start
            case t if isKw(t, "end") => advance(); expectOp("("); expectOp(")"); At.End
            case other => fail(s"expected unix-seconds timestamp, start() or end() after @, got $other")
          }
          e = e match {
            case s: Selector => markMod(s.copy(atMs = Some(at)))
            case sq: Subquery => markMod(sq.copy(atMs = Some(at)))
            // (expr) @ t — an intentional EXTENSION beyond Prometheus and
            // the reference grammar (PromQL.g4 restricts modifiers to
            // selectors/subqueries): distribute the pin to every
            // selector/subquery inside; inner @s are absolute and win.
            // A literal-only subtree has nothing to pin — error, don't
            // silently ignore.
            case other =>
              if (!hasVectorNode(other))
                fail(s"@ modifier applies to selectors/subqueries (or expressions containing them), got $other")
              applyAt(other, at)
          }
        case t if isKw(t, "offset") =>
          advance()
          modifierSeen = true
          // negative offsets look into the future: `offset -1h`
          val neg = cur match { case TOp("-") => advance(); true; case _ => false }
          val (d0, st0) = cur match {
            case TDur(ms) => advance(); (ms, 0L)
            case TDurSteps(k) => advance(); (0L, k) // `offset 2i` = 2 steps
            // parenthesized duration EXPRESSION (promql-duration-expr):
            // only the parenthesized form here, so `offset 5m + bar`
            // stays a binary + between vectors
            case TOp("(") => (durToMs(parseDurExpr(), "offset"), 0L)
            case other => fail(s"expected duration after offset, got $other")
          }
          val d = if (neg) -d0 else d0
          val ds = if (neg) -st0 else st0
          // Prometheus rejects a second offset on the same selector; the
          // value check also catches the cross-paren form `(foo offset
          // 1h) offset 2i`, which would otherwise silently clobber
          def oneOffset(prevMs: Long, prevSteps: Long): Unit = {
            if (offsetSeen || prevMs != 0L || prevSteps != 0L)
              fail("duplicate offset modifier")
            offsetSeen = true
          }
          e = e match {
            case s: Selector =>
              oneOffset(s.offsetMs, s.offsetSteps)
              markMod(s.copy(offsetMs = d, offsetSteps = ds))
            case sq: Subquery =>
              oneOffset(sq.offsetMs, sq.offsetSteps)
              markMod(sq.copy(offsetMs = d, offsetSteps = ds))
            case other if ds != 0L =>
              // distributing a step-unit offset into (expr) needs the
              // resolved step; keep the extension ms-only
              fail("step-unit offsets apply directly to selectors/subqueries")
            // (expr) offset d — same intentional extension as (expr) @ t:
            // shift every selector/subquery directly inside (a subquery's
            // own offset already shifts its entire inner evaluation — don't
            // recurse in). Literal-only subtrees error.
            case other =>
              if (!hasVectorNode(other))
                fail(s"offset applies to selectors/subqueries (or expressions containing them), got $other")
              if (offsetSeen) fail("duplicate offset modifier")
              offsetSeen = true
              applyOffset(other, d)
          }
        case _ => done = true
      }
      e
    }

    /** Distribute `(expr) offset d` into the tree. Recursion stops at
      * Selector/Subquery nodes: their own offset shifts everything below.
      * An @-pinned node evaluates at an ABSOLUTE time — the distributed
      * offset (which shifts the outer evaluation time) must not move it,
      * mirroring applyAt's "inner @ is absolute and wins" rule. */
    private def applyOffset(e: PromExpr, d: Long): PromExpr = e match {
      case s: Selector => if (s.atMs.isDefined) markMod(s) else markMod(s.copy(offsetMs = s.offsetMs + d))
      case sq: Subquery => if (sq.atMs.isDefined) markMod(sq) else markMod(sq.copy(offsetMs = sq.offsetMs + d))
      case FuncCall(n, args) => FuncCall(n, args.map(applyOffset(_, d)))
      case a: Agg => a.copy(expr = applyOffset(a.expr, d))
      case b: BinOp => b.copy(lhs = applyOffset(b.lhs, d), rhs = applyOffset(b.rhs, d))
      case other => other // literals
    }

    /** Does the subtree contain anything a time modifier can apply to? */
    private def hasVectorNode(e: PromExpr): Boolean = e match {
      case _: Selector | _: Subquery => true
      case FuncCall(_, args) => args.exists(hasVectorNode)
      case a: Agg => hasVectorNode(a.expr) || a.param.exists(hasVectorNode)
      case b: BinOp => hasVectorNode(b.lhs) || hasVectorNode(b.rhs)
      case _ => false
    }

    /** Distribute `(expr) @ t`: pin selectors/subqueries that aren't
      * already pinned (an inner @ is absolute and takes precedence). */
    private def applyAt(e: PromExpr, at: Long): PromExpr = e match {
      case s: Selector => if (s.atMs.isDefined) markMod(s) else markMod(s.copy(atMs = Some(at)))
      case sq: Subquery => if (sq.atMs.isDefined) markMod(sq) else markMod(sq.copy(atMs = Some(at)))
      case FuncCall(n, args) => FuncCall(n, args.map(applyAt(_, at)))
      case a: Agg => a.copy(expr = applyAt(a.expr, at))
      case b: BinOp => b.copy(lhs = applyAt(b.lhs, at), rhs = applyAt(b.rhs, at))
      case other => other
    }

    private def parsePrimary(): PromExpr = cur match {
      case TNum(v) => advance(); NumberLit(v)
      case TStr(s) => advance(); StringLit(s)
      case TOp("(") =>
        advance(); val e = parseOr(); expectOp(")"); e
      case TOp("{") => parseSelector(None)
      case TId(name) if name.equalsIgnoreCase("inf") || name.equalsIgnoreCase("nan") =>
        // Inf/NaN literals, any case (ref ParserSpec); `inf{...}` is NOT a
        // valid metric name
        advance()
        if (cur == TOp("{")) fail(s"'$name' is a number literal, not a metric name")
        if (name.equalsIgnoreCase("inf")) NumberLit(Double.PositiveInfinity)
        else NumberLit(Double.NaN)
      // aggregation-op KEYWORDS are case-insensitive in the upstream
      // grammar (`SUM(x) BY (job)` lexes sum/by as keywords) — unlike
      // function names, which stay case-sensitive (r10 upstream-corpus)
      case TId(name) if AggOps.contains(name.toLowerCase) => parseAgg()
      case TId(name) =>
        advance()
        cur match {
          case TOp("(") => // function call
            // unknown names are a PARSE error, as in the reference's
            // grammar (ParserSpec: non_existent_function_far_bar() fails)
            if (!Parser.KnownFunctions(name)) fail(s"unknown function '$name'")
            advance()
            val args = ArrayBuffer[PromExpr]()
            if (cur != TOp(")")) {
              args += parseOr()
              while (cur == TOp(",")) { advance(); args += parseOr() }
            }
            expectOp(")")
            checkFunctionArgs(name, args.toSeq)
            FuncCall(name, args.toSeq)
          case TOp("{") => parseSelector(Some(name))
          case _ => Selector(Some(name), Nil)
        }
      case other => fail(s"unexpected token $other")
    }

    /** Function arity + operand types, enforced at parse like the
      * reference grammar (ParserSpec's function-error battery). */
    private def checkFunctionArgs(name: String, args: Seq[PromExpr]): Unit = {
      def typeName(e: PromExpr): String =
        if (matrixTyped(e)) "range vector"
        else if (e.isInstanceOf[StringLit]) "string"
        else if (scalarTyped(e)) "scalar"
        else "instant vector"
      def check(t: Char, e: PromExpr, i: Int): Unit = {
        val ok = t match {
          case 'm' => matrixTyped(e)
          case 's' => scalarTyped(e)
          case 'S' => e.isInstanceOf[StringLit]
          case 'v' => !matrixTyped(e) && !e.isInstanceOf[StringLit]
          case 'e' => !e.isInstanceOf[StringLit]
        }
        if (!ok) {
          val want = t match {
            case 'm' => "range vector"; case 's' => "scalar"
            case 'S' => "string"; case 'v' => "instant vector"
            case 'e' => "instant or range vector"
          }
          fail(s"$name: argument ${i + 1} must be a $want, got ${typeName(e)}")
        }
      }
      if (name == "label_join") { // variadic trailing source labels
        if (args.size < 3) fail(s"label_join expects at least 3 arguments, got ${args.size}")
        check('v', args.head, 0)
        args.tail.zipWithIndex.foreach { case (a, i) => check('S', a, i + 1) }
      } else if (name == "sort_by_label" || name == "sort_by_label_desc") {
        // variadic trailing sort labels, at least one (upstream promql 3)
        if (args.size < 2) fail(s"$name expects at least 2 arguments, got ${args.size}")
        check('v', args.head, 0)
        args.tail.zipWithIndex.foreach { case (a, i) => check('S', a, i + 1) }
      } else Parser.FunctionSigs.get(name).foreach { case (types, minArgs) =>
        if (args.size < minArgs || args.size > types.length)
          fail(s"$name expects " +
            (if (minArgs == types.length) s"$minArgs argument(s)"
             else s"$minArgs to ${types.length} arguments") +
            s", got ${args.size}")
        args.zipWithIndex.foreach { case (a, i) => check(types(i), a, i) }
      }
    }

    private val ParamAggs = Set("topk", "bottomk", "quantile", "count_values",
      "limitk", "limit_ratio")

    private def parseAgg(): PromExpr = {
      val op = advance().asInstanceOf[TId].s.toLowerCase
      var by: Seq[String] = Nil
      var without: Seq[String] = Nil
      var clauseSeen = false
      def clause(): Boolean =
        if (isKw(cur, "by")) {
          if (clauseSeen) fail(s"only one by/without clause allowed on $op")
          clauseSeen = true; advance(); by = parseLabelList(); true
        } else if (isKw(cur, "without")) {
          if (clauseSeen) fail(s"only one by/without clause allowed on $op")
          clauseSeen = true; advance(); without = parseLabelList()
          // `without ()` keeps every label (minus __name__) — distinct from
          // NO clause (one global group). The planner always appends
          // __name__ to the drop list, so encoding the empty clause as
          // dropping exactly __name__ is both distinguishable and
          // semantically exact (r10 upstream-corpus finding).
          if (without.isEmpty) without = Seq("__name__")
          true
        } else false
      clause() // modifier before args
      expectOp("(")
      val args = ArrayBuffer[PromExpr]()
      args += parseOr()
      while (cur == TOp(",")) { advance(); args += parseOr() }
      expectOp(")")
      clause() // or after args
      // arity + parameter type, enforced at parse (ref ParserSpec:
      // `topk(some_metric)` and `sum(a, b)` are parse errors)
      if (ParamAggs(op)) {
        if (args.size != 2)
          fail(s"$op expects (parameter, vector), got ${args.size} argument(s)")
        if (op == "count_values") {
          if (!args(0).isInstanceOf[StringLit])
            fail("count_values expects a string label name parameter")
        } else if (!scalarTyped(args(0)))
          fail(s"$op parameter must be a scalar")
      } else if (args.size != 1)
        fail(s"$op expects a single argument, got ${args.size}")
      val (param, expr) =
        if (args.size == 2) (Some(args(0)), args(1))
        else (None, args(0))
      if (matrixTyped(expr) || expr.isInstanceOf[StringLit])
        fail(s"$op expects an instant vector argument")
      Agg(op, expr, param, by, without)
    }

    private def isMatcherOp(t: Tok): Boolean = t match {
      case TOp("=") | TOp("==") | TOp("!=") | TOp("=~") | TOp("!~") => true
      case _ => false
    }

    private def parseSelector(metric: Option[String]): PromExpr = {
      expectOp("{")
      val ms = ArrayBuffer[LabelMatcher]()
      // Prometheus 3 UTF-8 names: a bare quoted string entry is the metric
      // name ({"my.metric", a="b"} == {__name__="my.metric", a="b"}), and
      // quoted strings followed by a matcher op are LABEL names.
      var bare: Option[String] = None
      var done = cur == TOp("}")
      while (!done) {
        cur match {
          case TStr(name) if !isMatcherOp(toks(pos + 1)) =>
            advance()
            if (bare.isDefined || metric.isDefined)
              fail("metric name set twice in selector")
            bare = Some(name)
            cur match {
              case TOp(",") => advance(); done = cur == TOp("}")
              case _ => done = true
            }
          case _ =>
            done = parseOneMatcher(ms)
        }
      }
      expectOp("}")
      finishSelector(metric.orElse(bare), ms)
    }

    /** One `label op "value"` entry; returns true when the list ends. */
    private def parseOneMatcher(ms: ArrayBuffer[LabelMatcher]): Boolean = {
        val label = cur match {
          // colons are legal in METRIC names (recording rules), never in
          // unquoted label names (ref ParserSpec: some_metric{a:b="b"})
          case TId(l) if l.contains(':') => fail(s"invalid label name '$l'")
          case TId(l) => advance(); l
          case TStr(l) => advance(); l // quoted label name (UTF-8 names)
          case other => fail(s"expected label, got $other")
        }
        val op = cur match {
          case TOp("=") => advance(); MatchOp.Eq
          case TOp("==") => advance(); MatchOp.Eq
          case TOp("!=") => advance(); MatchOp.Ne
          case TOp("=~") => advance(); MatchOp.Re
          case TOp("!~") => advance(); MatchOp.NotRe
          case other => fail(s"expected matcher op, got $other")
        }
        val v = cur match {
          case TStr(s) => advance(); s
          case other => fail(s"expected string value, got $other")
        }
        ms += LabelMatcher(label, op, v)
        cur match {
          case TOp(",") => advance(); cur == TOp("}")
          case _ => true
        }
    }

    private def finishSelector(metric: Option[String],
                               ms: ArrayBuffer[LabelMatcher]): PromExpr = {
      if (metric.isEmpty && ms.isEmpty)
        fail("vector selector must contain at least one matcher")
      if (metric.isDefined && ms.exists(_.label == "__name__"))
        fail(s"metric name '${metric.get}' and a __name__ matcher cannot both be given")
      val named = ms.find(_.label == "__name__") match {
        case Some(m) if m.op == MatchOp.Eq && metric.isEmpty =>
          (Some(m.value), ms.filterNot(_.label == "__name__"))
        case _ => (metric, ms)
      }
      Selector(named._1, named._2.toSeq)
    }
  }
}
