package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raw vs downsample query routing with range-function rewriting — the
  * reference's LongTimeRangePlanner + downsampleColsFromRangeFunction
  * semantics (SURVEY.md §1.3, §4): a query whose window functions can be
  * answered from the ds-gauge table (min/max/sum/count/avg per resolution)
  * reads the cold range from that table with the APPROPRIATE COLUMN, and
  * only the hot tail from raw samples.
  *
  * Column rewrite (reference RangeFunction.scala:249-278):
  *   min_over_time   → min     column (then min over window)
  *   max_over_time   → max     column (then max over window)
  *   sum_over_time   → sum     column (then sum over window)
  *   count_over_time → count   column (then SUM over window — counts add)
  *   avg_over_time   → needs sum AND count (sum(sum)/sum(count))
  *   last_over_time  → avg of the last resolution bucket (approximation
  *                     documented by the reference's ds-gauge schema)
  */
object DownsampleRouting {

  val Rewritable: Set[String] =
    Set("min_over_time", "max_over_time", "sum_over_time", "count_over_time")

  /** Project the downsample table to canonical (series cols..., ts, value)
    * for a given range function, or None if the fn cannot be served. */
  def dsValueFor(fn: String, ds: DataFrame, seriesCols: Seq[String]): Option[DataFrame] = {
    val base = seriesCols.map(col) :+ col("ts")
    fn match {
      case "min_over_time" => Some(ds.select(base :+ col("min").as("value"): _*))
      case "max_over_time" => Some(ds.select(base :+ col("max").as("value"): _*))
      case "sum_over_time" => Some(ds.select(base :+ col("sum").as("value"): _*))
      case "count_over_time" => Some(ds.select(base :+ col("count").as("value"): _*))
      case _ => None
    }
  }

  /** Union the rewritten cold tier with hot raw samples at the boundary.
    * The caller then applies the SAME range function over the union —
    * valid because min/max/sum/count all merge associatively across
    * resolution buckets (count merges by SUM, which count_over_time's
    * NaN-free sum over the count column provides). */
  /** Returns the routed union AND the effective range function to apply
    * over it: count_over_time becomes sum_over_time (hot samples map to
    * 1.0, cold rows already carry bucket counts — counts merge by sum). */
  def routed(raw: DataFrame, ds: DataFrame, boundaryMs: Long, fn: String,
             seriesCols: Seq[String]): (DataFrame, String) = {
    require(Rewritable.contains(fn), s"$fn cannot be served from the downsample tier")
    val hotValue = if (fn == "count_over_time") lit(1.0).as("value") else col("value")
    val hot = raw.select(seriesCols.map(col) :+ col("ts") :+ hotValue: _*)
      .filter(col("ts") > boundaryMs)
    val cold = dsValueFor(fn, ds, seriesCols).get.filter(col("ts") <= boundaryMs)
    val effective = if (fn == "count_over_time") "sum_over_time" else fn
    (cold.unionByName(hot), effective)
  }
}
