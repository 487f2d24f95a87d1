package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.TsTables
import graft.functions.Histograms

/** Histogram operator coverage: build cumulative-bucket histograms from the
  * events stream per (event_type, day), then quantile / fraction /
  * bucket-sum / explode-to-series. Oracles recompute the same Prometheus
  * interpolation in SQL over per-bucket counts.
  */
object HistQueries {

  private val S = TsTables.EventsStartMs
  private val D1 = TsTables.Day

  private val EV =
    s"SELECT event_type, (epoch_ns(ts)//1000000 - $S) // $D1 AS day, value FROM events"

  /** per-(event_type, day) cumulative bucket counts, as SQL columns */
  private val BUCKETS =
    s"""SELECT event_type, day,
        sum(CASE WHEN value <= 10 THEN 1.0 ELSE 0 END) AS c10,
        sum(CASE WHEN value <= 50 THEN 1.0 ELSE 0 END) AS c50,
        sum(CASE WHEN value <= 100 THEN 1.0 ELSE 0 END) AS c100,
        sum(CASE WHEN value <= 200 THEN 1.0 ELSE 0 END) AS c200,
        CAST(count(*) AS DOUBLE) AS ctot
        FROM ev GROUP BY 1,2"""

  private def histDF(s: SparkSession, dir: String): DataFrame = {
    val ev = TsTables.events(s, dir)
      .withColumn("day", ((col("ts_ms") - S) / D1).cast("long"))
    Histograms.fromValues(ev, Seq("event_type", "day"), "value")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q70_hist_quantile" -> ((s, dir) =>
      histDF(s, dir).select(col("event_type"), col("day"),
        round(Histograms.quantile(0.9, col("le"), col("values")), 6).as("q90"))
        .orderBy("event_type", "day")),

    "q71_hist_sum_buckets" -> ((s, dir) =>
      Histograms.sumBuckets(histDF(s, dir), Seq("day"))
        .select(col("day"), col("values"))
        .orderBy("day")),

    "q72_hist_fraction" -> ((s, dir) =>
      histDF(s, dir).select(col("event_type"), col("day"),
        round(Histograms.fraction(25, 150, col("le"), col("values")), 6).as("frac"))
        .orderBy("event_type", "day")),

    "q73_hist_to_prom" -> ((s, dir) =>
      Histograms.toPromVectors(histDF(s, dir), Seq("event_type", "day"))
        .orderBy("event_type", "day", "le"))
  )

  def oracles: Map[String, String] = Map(

    "q70_hist_quantile" ->
      s"""WITH ev AS ($EV), b AS ($BUCKETS)
          SELECT event_type, day,
            round(CASE
              WHEN c10 >= 0.9*ctot THEN 0.0 + (10.0 - 0.0) * (0.9*ctot - 0.0) / (c10 - 0.0)
              WHEN c50 >= 0.9*ctot THEN 10.0 + (50.0 - 10.0) * (0.9*ctot - c10) / (c50 - c10)
              WHEN c100 >= 0.9*ctot THEN 50.0 + (100.0 - 50.0) * (0.9*ctot - c50) / (c100 - c50)
              WHEN c200 >= 0.9*ctot THEN 100.0 + (200.0 - 100.0) * (0.9*ctot - c100) / (c200 - c100)
              ELSE 200.0 END, 6) AS q90
          FROM b ORDER BY 1,2""",

    "q71_hist_sum_buckets" ->
      s"""WITH ev AS ($EV)
          SELECT day, list_value(
            sum(CASE WHEN value <= 10 THEN 1.0 ELSE 0 END),
            sum(CASE WHEN value <= 50 THEN 1.0 ELSE 0 END),
            sum(CASE WHEN value <= 100 THEN 1.0 ELSE 0 END),
            sum(CASE WHEN value <= 200 THEN 1.0 ELSE 0 END),
            CAST(count(*) AS DOUBLE)) AS "values"
          FROM ev GROUP BY 1 ORDER BY 1""",

    "q72_hist_fraction" ->
      s"""WITH ev AS ($EV), b AS ($BUCKETS)
          SELECT event_type, day,
            round(((c100 + (c200 - c100) * (150.0 - 100.0) / (200.0 - 100.0))
                 - (c10 + (c50 - c10) * (25.0 - 10.0) / (50.0 - 10.0))) / ctot, 6) AS frac
          FROM b ORDER BY 1,2""",

    "q73_hist_to_prom" ->
      s"""WITH ev AS ($EV), b AS ($BUCKETS),
          pos(le, ord) AS (VALUES ('10.0', 1), ('50.0', 2), ('100.0', 3), ('200.0', 4), ('Infinity', 5))
          SELECT b.event_type, b.day, pos.le,
                 CASE pos.ord WHEN 1 THEN c10 WHEN 2 THEN c50 WHEN 3 THEN c100
                              WHEN 4 THEN c200 ELSE ctot END AS bucket_count
          FROM b CROSS JOIN pos ORDER BY event_type, day, le"""
  )
}
