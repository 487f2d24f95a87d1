package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-series aggregations at each step — the `sum by (labels) (...)`
  * family (SURVEY.md §2.5). The reference runs these as a three-phase
  * map/reduce/present over shards; in Spark that is exactly a partial +
  * final HashAggregate, which Catalyst plans automatically from a single
  * `groupBy().agg()` — map-side combine included, so the shuffle carries
  * pre-aggregated state, not raw points. topk/bottomk use a rank window
  * (per-step bounded heap equivalent); quantile uses exact percentile for
  * Prometheus parity (SURVEY.md §2.5 t-digest note).
  */
object SeriesAggs {

  /** groupBy(labels + step) with the given Prometheus aggregation. */
  def aggregate(df: DataFrame, op: String, byCols: Seq[String],
                stepCol: String = "step_ts", valueCol: String = "value",
                param: Double = Double.NaN): DataFrame = {
    val keys = (byCols :+ stepCol).map(col)
    val v = col(valueCol)
    op match {
      case "sum"    => df.groupBy(keys: _*).agg(sum(v).as(valueCol))
      case "min"    => df.groupBy(keys: _*).agg(min(v).as(valueCol))
      case "max"    => df.groupBy(keys: _*).agg(max(v).as(valueCol))
      case "count"  => df.groupBy(keys: _*).agg(count(v).cast("double").as(valueCol))
      case "avg"    => df.groupBy(keys: _*).agg(avg(v).as(valueCol))
      case "group"  => df.groupBy(keys: _*).agg(lit(1.0).as(valueCol))
      case "stddev" => df.groupBy(keys: _*).agg(coalesce(stddev_pop(v), lit(0.0)).as(valueCol))
      case "stdvar" => df.groupBy(keys: _*).agg(coalesce(var_pop(v), lit(0.0)).as(valueCol))
      case "quantile" =>
        df.groupBy(keys: _*).agg(percentile(v, lit(param)).as(valueCol))
      case other => throw new IllegalArgumentException(s"unknown aggregation: $other")
    }
  }

  /** topk/bottomk: keep k series per (group, step) ranked by value.
    * Deterministic tiebreak on the series columns. */
  def topk(df: DataFrame, k: Int, byCols: Seq[String], seriesCols: Seq[String],
           stepCol: String = "step_ts", valueCol: String = "value",
           bottom: Boolean = false): DataFrame = {
    val ord: Seq[Column] =
      (if (bottom) col(valueCol).asc else col(valueCol).desc) +: seriesCols.map(col(_).asc)
    val w = Window.partitionBy((byCols :+ stepCol).map(col): _*).orderBy(ord: _*)
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k).drop("__rk")
  }

  /** count_values: number of series having each distinct value per step;
    * the value is also exposed as a label column. */
  def countValues(df: DataFrame, label: String, byCols: Seq[String],
                  stepCol: String = "step_ts", valueCol: String = "value"): DataFrame =
    df.groupBy((byCols :+ stepCol).map(col) :+ col(valueCol).cast("string").as(label): _*)
      .agg(count(lit(1)).cast("double").as("count"))
}
