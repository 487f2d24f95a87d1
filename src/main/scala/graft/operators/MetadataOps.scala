package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Metadata queries — SURVEY.md §2.8: /api/v1/series, /labels,
  * /label/<l>/values, label + time-series cardinality. On the canonical
  * samples schema (metric, tags MAP, series_id, ts, value). All are
  * scan + distinct/approx-distinct; partition pruning on the metric/time
  * predicates keeps them cheap at scale, and HLL (`approx_count_distinct`)
  * replaces the reference's mergeable HLL sketches 1:1.
  */
object MetadataOps {

  /** Distinct series (metric + full label map) matching the given filter.
    * MapType cannot feed a set operation, so dedupe on a serialized
    * sorted-entries key. */
  def series(samples: DataFrame, fromMs: Long, toMs: Long): DataFrame =
    samples.filter(col("ts").between(fromMs, toMs))
      .select(col("metric"), col("tags"))
      .withColumn("__k", to_json(array_sort(map_entries(col("tags")))))
      .dropDuplicates("metric", "__k")
      .drop("__k")

  /** All label names present (tag keys + metric pseudo-label). */
  def labelNames(samples: DataFrame): DataFrame =
    samples.select(explode(map_keys(col("tags"))).as("label")).distinct()

  /** Distinct values of one label. */
  def labelValues(samples: DataFrame, label: String): DataFrame =
    samples.select(col("tags")(label).as("value"))
      .filter(col("value").isNotNull).distinct()

  /** Approximate distinct-value count per label (HLL). */
  def labelCardinality(samples: DataFrame, labels: Seq[String]): DataFrame = {
    val aggs = labels.map(l => approx_count_distinct(col("tags")(l)).as(l))
    samples.agg(aggs.head, aggs.tail: _*)
  }

  /** Time-series cardinality grouped by metric (active = in time range). */
  def tsCardinality(samples: DataFrame): DataFrame =
    samples.groupBy(col("metric"))
      .agg(approx_count_distinct(col("series_id")).as("card"))
}
