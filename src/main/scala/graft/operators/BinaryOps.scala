package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector binary operations between two periodic series sets
  * (SURVEY.md §2.6 — the reference's BinaryJoinExec / SetOperatorExec /
  * ScalarOperationMapper re-expressed as Dataset joins).
  *
  * Both inputs are periodic (same step grid), so the join key is
  * (join labels..., step_ts). One-to-one arithmetic is an inner equi-join;
  * set ops are left-semi / left-anti / union joins. Spark + AQE picks
  * broadcast vs shuffled hash vs sort-merge from runtime sizes — the
  * reference's hand-built hash map on the "one" side becomes a broadcast
  * hint when the caller knows a side is small (group_left/group_right).
  */
object BinaryOps {

  private val NaNd = lit(Double.NaN)

  def scalarOp(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" =>
      // IEEE-754 semantics (PromQL): x/0 = ±Inf signed by BOTH operands
      // (1/-0.0 = -Inf), 0/0 = NaN, NaN/0 = NaN. Spark's `/` returns NULL
      // (legacy) or errors (ANSI) on zero divisors, and its comparisons
      // normalize -0.0 == 0.0 which hides the divisor's sign — recover it
      // from the string form (Java Double.toString keeps "-0.0"); the
      // cast is only evaluated in the zero-divisor branch.
      val divisorNeg = startswith(r.cast("string"), lit("-"))
      when(r =!= 0, l / r)
        .when(isnan(l) || l === 0, NaNd)
        .when((l > 0) =!= divisorNeg, lit(Double.PositiveInfinity))
        .otherwise(lit(Double.NegativeInfinity))
    case "%" =>
      when(r =!= 0, l % r).otherwise(NaNd) // fmod(x, 0) = NaN
    case "^" => pow(l, r)
    // keyword binop, */-precedence (upstream promql 3): Go math.Atan2 and
    // Java Math.atan2 share IEEE semantics (NaN operand -> NaN)
    case "atan2" => atan2(l, r)
    case cmp if ComparisonOps.contains(cmp) =>
      // Comparison truth with legacy (Spark-ordered) NaN handling — only
      // correct when neither operand can be NaN; PromQL paths go through
      // cmpKeep/cmpBool instead.
      cmpKeep(cmp, l, r).cast("double")
    case other => throw new IllegalArgumentException(s"unknown binary op: $other")
  }

  val ComparisonOps: Set[String] = Set("==", "!=", ">", ">=", "<", "<=")

  /** Filter-comparison KEEP condition with Java double semantics
    * (`ref:query/exec/binaryOp/BinaryOperatorFunction.scala:29-34`: the
    * reference returns lhs when the Java comparison holds, else NaN, and
    * NaN means "no sample"). Java orders nothing against NaN — every
    * comparison with a NaN operand is false except `!=`, which is true
    * whenever the operands aren't Java-equal. Spark SQL instead treats
    * NaN == NaN as true and sorts NaN largest, so the raw column
    * operators would keep exactly the wrong samples. A kept sample must
    * also have a non-NaN lhs (only reachable via `!=`): the reference's
    * returned lhs would be NaN = missing. */
  def cmpKeep(op: String, l: Column, r: Column): Column = op match {
    case "==" => !isnan(l) && !isnan(r) && (l === r)
    case "!=" => !isnan(l) && (isnan(r) || (l =!= r))
    case ">"  => !isnan(l) && !isnan(r) && (l > r)
    case ">=" => !isnan(l) && !isnan(r) && (l >= r)
    case "<"  => !isnan(l) && !isnan(r) && (l < r)
    case "<=" => !isnan(l) && !isnan(r) && (l <= r)
    case other => throw new IllegalArgumentException(s"not a comparison op: $other")
  }

  /** `bool`-modifier comparison: 1.0/0.0 by the Java comparison, NaN if
    * either operand is NaN (`ref:BinaryOperatorFunction.scala:35-70`, the
    * *_BOOL variants all special-case NaN first). */
  def cmpBool(op: String, l: Column, r: Column): Column =
    when(isnan(l) || isnan(r), NaNd)
      .otherwise(cmpKeep(op, l, r).cast("double"))

  /** vector OP vector on the given join labels (PromQL `on(...)` — callers
    * computing "all labels minus ignoring" resolve that before the call).
    * Comparison ops filter (keep LHS sample where true) per PromQL. */
  def join(left: DataFrame, right: DataFrame, op: String, onLabels: Seq[String],
           stepCol: String = "step_ts", valueCol: String = "value",
           broadcastRight: Boolean = false): DataFrame = {
    val keys = onLabels :+ stepCol
    val r0 = right.select((keys.map(col) :+ col(valueCol).as("__rv")): _*)
    val r = if (broadcastRight) broadcast(r0) else r0
    val joined = left.join(r, keys, "inner")
    if (ComparisonOps.contains(op))
      joined.filter(cmpKeep(op, col(valueCol), col("__rv"))).drop("__rv")
    else
      joined.withColumn(valueCol, scalarOp(op, col(valueCol), col("__rv"))).drop("__rv")
  }

  /** and: LHS samples whose key exists in RHS at the same step. */
  def and(left: DataFrame, right: DataFrame, onLabels: Seq[String],
          stepCol: String = "step_ts"): DataFrame =
    left.join(right.select((onLabels :+ stepCol).map(col): _*).distinct(),
      onLabels :+ stepCol, "left_semi")

  /** unless: LHS samples whose key does NOT exist in RHS at the same step. */
  def unless(left: DataFrame, right: DataFrame, onLabels: Seq[String],
             stepCol: String = "step_ts"): DataFrame =
    left.join(right.select((onLabels :+ stepCol).map(col): _*).distinct(),
      onLabels :+ stepCol, "left_anti")

  /** or: all LHS samples, plus RHS samples whose key+step is absent from LHS.
    * Requires both sides to share a schema (same columns, same order). */
  def or(left: DataFrame, right: DataFrame, onLabels: Seq[String],
         stepCol: String = "step_ts"): DataFrame = {
    val rhsOnly = right.join(
      left.select((onLabels :+ stepCol).map(col): _*).distinct(),
      onLabels :+ stepCol, "left_anti")
    left.unionByName(rhsOnly.select(left.columns.map(col).toSeq: _*))
  }
}
