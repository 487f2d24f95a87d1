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

  def scalarOp(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" =>
      // IEEE-754 semantics (PromQL): x/0 = +-Inf, 0/0 = NaN. Spark's `/`
      // returns NULL (legacy) or errors (ANSI) on zero divisors instead.
      when(r =!= 0, l / r)
        .when(l > 0, lit(Double.PositiveInfinity))
        .when(l < 0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN))
    case "%" =>
      when(r =!= 0, l % r).otherwise(lit(Double.NaN)) // fmod(x, 0) = NaN
    case "^" => pow(l, r)
    case "==" => (l === r).cast("double")
    case "!=" => (l =!= r).cast("double")
    case ">"  => (l > r).cast("double")
    case ">=" => (l >= r).cast("double")
    case "<"  => (l < r).cast("double")
    case "<=" => (l <= r).cast("double")
    case other => throw new IllegalArgumentException(s"unknown binary op: $other")
  }

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
    val isComparison = Set("==", "!=", ">", ">=", "<", "<=").contains(op)
    if (isComparison)
      joined.filter(scalarOp(op, col(valueCol), col("__rv")) === 1.0).drop("__rv")
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
