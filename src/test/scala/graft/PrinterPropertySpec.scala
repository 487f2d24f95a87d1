package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.promql._

/** Property-based printer round-trip: for RANDOM ASTs drawn from the
  * parser's image, parse(print(ast)) == ast. Catches escaping, duration,
  * precedence, and modifier-printing bugs the hand-picked corpus misses. */
class PrinterPropertySpec extends AnyFunSuite with Matchers {

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString match {
    // avoid tokens with positional meaning and literal words
    case s @ ("on" | "bool" | "and" | "or" | "unless" | "by" | "without" |
              "offset" | "limit" | "inf" | "nan" | "ignoring" | "start" | "end") => s + "_x"
    case s => s
  }

  private val strVal: Gen[String] =
    Gen.listOfN(6, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\\', '"', '\n', '\t', ' ', '|', '.', '*')))
      .map(_.mkString)

  private val matcher: Gen[LabelMatcher] = for {
    l <- ident
    op <- Gen.oneOf(MatchOp.Eq, MatchOp.Ne, MatchOp.Re, MatchOp.NotRe)
    v <- strVal
  } yield LabelMatcher(l, op, v)

  private val durMs: Gen[Long] =
    Gen.oneOf(Gen.choose(1L, 600L).map(_ * 1000L), Gen.choose(1L, 2000L))

  private val atGen: Gen[Option[Long]] = Gen.frequency(
    5 -> Gen.const(None),
    1 -> Gen.const(Some(At.Start)), 1 -> Gen.const(Some(At.End)),
    2 -> Gen.choose(0L, 2000000000L).map(s => Some(s * 1000L)),
    // fractional-second timestamps: the r4 (v*1000).toLong parse drifted
    // 1234 -> 1233 -> 1232 across round-trips and whole-second-only
    // generation masked it
    2 -> Gen.choose(0L, 2000000000000L).map(ms => Some(ms)))

  private val offGen: Gen[Long] = Gen.frequency(
    4 -> Gen.const(0L),
    1 -> durMs, 1 -> durMs.map(-_))

  private val selector: Gen[Selector] = for {
    m <- ident
    ms <- Gen.listOfN(2, matcher).flatMap(l => Gen.someOf(l)).map(_.toSeq)
    w <- Gen.option(durMs)
    off <- offGen
    at <- atGen
  } yield Selector(Some(m), ms, w, off, at)

  private val numLit: Gen[NumberLit] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(n => NumberLit(n.toDouble)),
    Gen.choose(-1e12, 1e12).map(NumberLit(_)),
    Gen.oneOf(NumberLit(Double.PositiveInfinity), NumberLit(0.0), NumberLit(1e21), NumberLit(2.5e-7)))

  private val cmpOps = Seq("==", "!=", ">", "<", ">=", "<=")
  private val setOps = Seq("and", "or", "unless")
  private val arithOps = Seq("+", "-", "*", "/", "%", "^", "atan2")

  /** Static types, mirroring the parser's binop guards (Parser.mkBinOp):
    * the generator must only build ASTs whose printed form re-parses. */
  private def scalarT(e: PromExpr): Boolean = e match {
    case NumberLit(_) => true
    case FuncCall("scalar", _) => true
    case FuncCall("time", Seq()) => true
    case BinOp(_, l, r, _, _) => scalarT(l) && scalarT(r)
    case _ => false
  }
  private def matrixT(e: PromExpr): Boolean = e match {
    case s: Selector => s.windowMs.isDefined
    case _: Subquery => true
    case _ => false
  }
  /** Matrix operand → wrap in a range fn (legal); scalar → swap for alt. */
  private def debox(e: PromExpr): PromExpr =
    if (matrixT(e)) FuncCall("sum_over_time", Seq(e)) else e
  private def vecOr(e: PromExpr, alt: PromExpr): PromExpr =
    if (scalarT(e)) alt else e

  private def vmatch(grouping: Boolean): Gen[Option[VectorMatch]] = Gen.frequency(
    4 -> Gen.const(None),
    1 -> (for {
      on <- Gen.oneOf(true, false)
      ls <- Gen.listOfN(2, ident).flatMap(Gen.someOf(_)).map(_.toSeq)
      g <- if (grouping) Gen.oneOf(0, 1, 2) else Gen.const(0)
      inc <- if (g != 0) Gen.listOfN(1, ident).flatMap(Gen.someOf(_)).map(_.toSeq)
             else Gen.const(Nil)
      // on() join keys and group_left/right include labels must be
      // disjoint (the parser now rejects the overlap, like Prometheus)
      inc2 = if (on) inc.filterNot(ls.contains) else inc
    } yield Some(VectorMatch(on, ls, groupLeft = g == 1, groupRight = g == 2, include = inc2))))

  private def expr(depth: Int): Gen[PromExpr] =
    if (depth <= 0) Gen.oneOf(selector, numLit)
    else Gen.frequency(
      3 -> selector,
      1 -> numLit,
      2 -> (for { // range function over a matrix selector
        fn <- Gen.oneOf("rate", "increase", "sum_over_time", "max_over_time")
        s <- selector
        w <- durMs
      } yield FuncCall(fn, Seq(s.copy(windowMs = Some(w))))),
      2 -> (for { // instant function
        fn <- Gen.oneOf("abs", "ceil", "sgn", "sqrt")
        e <- expr(depth - 1)
      } yield FuncCall(fn, Seq(debox(e)))),
      2 -> (for {
        op <- Gen.oneOf("sum", "min", "max", "avg", "count", "stddev")
        e <- expr(depth - 1)
        by <- Gen.listOfN(2, ident).flatMap(Gen.someOf(_)).map(_.toSeq)
        without <- if (by.isEmpty) Gen.listOfN(1, ident).flatMap(Gen.someOf(_)).map(_.toSeq)
                   else Gen.const(Nil)
      } yield Agg(op, debox(e), None, by, without)),
      1 -> (for {
        op <- Gen.oneOf("topk", "bottomk", "limitk")
        k <- Gen.choose(1, 10)
        e <- expr(depth - 1)
      } yield Agg(op, debox(e), Some(NumberLit(k.toDouble)), Nil, Nil)),
      1 -> (for {
        r <- Gen.choose(-100, 100)
        e <- expr(depth - 1)
      } yield Agg("limit_ratio", debox(e), Some(NumberLit(r / 100.0)), Nil, Nil)),
      1 -> (for {
        l <- ident; e <- expr(depth - 1)
      } yield Agg("count_values", debox(e), Some(StringLit(l)), Nil, Nil)),
      3 -> (for { // arithmetic/comparison binop — typed like the parser's
        // guards: no matrix operands, bool forced on scalar-scalar
        // comparisons, matching only between vectors
        op <- Gen.oneOf(arithOps ++ cmpOps)
        l0 <- expr(depth - 1); r0 <- expr(depth - 1)
        l = debox(l0); r = debox(r0)
        bothScalar = scalarT(l) && scalarT(r)
        bool <- if (!cmpOps.contains(op)) Gen.const(false)
                else if (bothScalar) Gen.const(true)
                else Gen.oneOf(true, false)
        m <- if (scalarT(l) || scalarT(r)) Gen.const(None)
             else vmatch(grouping = true)
      } yield BinOp(op, l, r, bool, m)),
      1 -> (for { // set op: no bool, no grouping, vectors both sides
        op <- Gen.oneOf(setOps)
        l0 <- expr(depth - 1); r0 <- expr(depth - 1)
        // fallback operands must be INSTANT selectors (a windowed one
        // would reintroduce the matrix-operand type error)
        sl <- selector.map(_.copy(windowMs = None))
        sr <- selector.map(_.copy(windowMs = None))
        m <- vmatch(grouping = false)
      } yield BinOp(op, vecOr(debox(l0), sl), vecOr(debox(r0), sr),
                    bool = false, m)),
      1 -> (for {
        e <- expr(depth - 1)
        r <- durMs
        st <- Gen.option(durMs)
        off <- offGen
        at <- atGen
      } yield Subquery(e, r, st, off, at)))

  test("parse(print(ast)) == ast for 500 random ASTs (seeded)") {
    val gen = Gen.choose(0, 3).flatMap(expr)
    var seed = Seed(42L)
    (1 to 500).foreach { i =>
      val ast = gen.apply(Gen.Parameters.default, seed)
        .getOrElse(fail(s"generator returned no value at case $i"))
      seed = seed.next
      val printed = Printer.print(ast)
      withClue(s"case $i printed: $printed\n") {
        Parser.parse(printed) shouldEqual ast
      }
    }
  }
}
