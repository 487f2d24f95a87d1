package graft.promql

/** PromQL AST — our own ADT mirroring the reference's logical-plan node set
  * (SURVEY.md §2, /root/reference/query/.../LogicalPlan.scala) but shaped
  * for a Spark planner. All durations are epoch-millis longs.
  */
sealed trait PromExpr

sealed trait MatchOp
object MatchOp {
  case object Eq extends MatchOp
  case object Ne extends MatchOp
  case object Re extends MatchOp
  case object NotRe extends MatchOp
}

final case class LabelMatcher(label: String, op: MatchOp, value: String)

/** Sentinels for `@ start()` / `@ end()` — resolved against the query
  * range at plan time (the parser has no context). */
object At {
  val Start: Long = Long.MinValue
  val End: Long = Long.MaxValue
}

/** Instant vector selector; `window` (set via [d]) turns it into a matrix
  * selector usable by range functions. `windowSteps`/`offsetSteps` carry
  * FiloDB's interval-multiple "Ni" notation (N x the query step —
  * reference TimeUnits.scala IntervalMultiple); the planner resolves them
  * to ms against the query context before planning. */
final case class Selector(metric: Option[String], matchers: Seq[LabelMatcher],
                          windowMs: Option[Long] = None, offsetMs: Long = 0L,
                          atMs: Option[Long] = None,
                          windowSteps: Option[Long] = None,
                          offsetSteps: Long = 0L)
  extends PromExpr

final case class NumberLit(v: Double) extends PromExpr {
  // bit-level equality: the default Double == makes NumberLit(NaN)
  // unequal to ITSELF, so any AST containing NaN fails every identity
  // check (found round-tripping the reference corpus's vector(NaN))
  override def equals(o: Any): Boolean = o match {
    case NumberLit(w) => java.lang.Double.compare(v, w) == 0
    case _ => false
  }
  override def hashCode: Int = java.lang.Double.hashCode(v)
}
final case class StringLit(v: String) extends PromExpr

/** fn(args...) — range functions take a matrix Selector/Subquery argument,
  * instant functions take vectors/scalars. */
final case class FuncCall(name: String, args: Seq[PromExpr]) extends PromExpr

/** Aggregation with optional by/without clause and optional parameter
  * (topk/quantile/count_values). */
final case class Agg(op: String, expr: PromExpr, param: Option[PromExpr],
                     by: Seq[String], without: Seq[String]) extends PromExpr

final case class VectorMatch(on: Boolean, labels: Seq[String],
                             groupLeft: Boolean = false, groupRight: Boolean = false,
                             include: Seq[String] = Nil)

final case class BinOp(op: String, lhs: PromExpr, rhs: PromExpr,
                       bool: Boolean = false,
                       matching: Option[VectorMatch] = None) extends PromExpr

/** expr[range:step] — subquery producing a matrix from an inner expr;
  * supports offset and the @ modifier like selectors. */
final case class Subquery(expr: PromExpr, rangeMs: Long, stepMs: Option[Long],
                          offsetMs: Long = 0L, atMs: Option[Long] = None,
                          rangeSteps: Option[Long] = None,
                          stepSteps: Option[Long] = None,
                          offsetSteps: Long = 0L) extends PromExpr
