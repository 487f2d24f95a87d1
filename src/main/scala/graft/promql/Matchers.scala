package graft.promql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Label-matcher predicate compilation shared by the query planner and the
  * metadata operators.
  *
  * Regex matchers are compiled to pushdown-friendly predicates when the
  * pattern is simple (the reference's index does the same trick for its
  * Lucene/Tantivy queries): a pure literal becomes equality, a top-level
  * alternation of literals becomes IN, and a literal prefix + `.*` becomes
  * startsWith — all three reach the parquet scan as EqualTo / In /
  * StringStartsWith, where a raw RLIKE cannot push down at all. Anything
  * else falls back to an anchored rlike, per Prometheus full-match
  * semantics.
  */
object Matchers {

  private val MetaChars = ".[]{}()*+?\\^$|".toSet

  private def isLiteral(s: String): Boolean = s.nonEmpty && !s.exists(MetaChars)

  /** Anchored-regex predicate over a (possibly null) string column,
    * simplified for pushdown when possible. Equivalent to
    * `rlike("^(?:" + re + ")$")` in all cases. */
  def regexMatch(v: Column, re: String): Column =
    if (isLiteral(re)) v === re
    else if (re.length > 2 && re.endsWith(".*") && isLiteral(re.dropRight(2)))
      v.startsWith(re.dropRight(2))
    else {
      val alts = re.split('|')
      // pure alternation of literals iff rejoining the literal parts
      // reproduces the pattern exactly (rules out escapes/empty branches)
      if (alts.length > 1 && alts.forall(isLiteral) && alts.mkString("|") == re)
        v.isin(alts.toSeq: _*)
      else v.rlike("^(?:" + re + ")$")
    }

  /** Full matcher predicate on the canonical (metric, tags) columns. */
  def pred(m: LabelMatcher): Column = {
    val v = if (m.label == "__name__") col("metric") else col("tags")(m.label)
    m.op match {
      case MatchOp.Eq =>
        if (m.value.isEmpty) v.isNull || v === "" else v === m.value
      case MatchOp.Ne =>
        if (m.value.isEmpty) v.isNotNull && v =!= "" else v.isNull || v =!= m.value
      case MatchOp.Re => v.isNotNull && regexMatch(v, m.value)
      case MatchOp.NotRe => v.isNull || !regexMatch(v, m.value)
    }
  }
}
