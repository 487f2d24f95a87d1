package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.streaming.Ingest

/** Batch downsample job — the reference's spark-jobs downsampler
  * (`spark-jobs/.../DownsamplerMain.scala:57-131`, itself a Spark batch
  * over raw chunks) re-expressed directly: read a raw samples table, emit
  * one ds-gauge table per configured resolution. Buckets are the
  * reference's (k·res, (k+1)·res] periods so the query-time routing
  * (`DownsampleRouting` / cold-tier planner) reads them unchanged.
  *
  * Usage: DownsampleJob <rawDir> <outDir> [res1,res2,...]
  * Series identity = every column except ts/value (the long-table model:
  * anything that isn't the sample is the key).
  */
object DownsampleJob {

  def run(spark: SparkSession, rawDir: String, outDir: String,
          resolutions: Seq[String]): Unit = {
    val raw = spark.read.parquet(rawDir)
    val seriesCols = raw.columns.filterNot(Set("ts", "value", "__tie")).toSeq
    resolutions.foreach { res =>
      Ingest.downsample(raw, res, bucketOffset = "1 millisecond",
          seriesCols = seriesCols)
        .write.mode("overwrite")
        .parquet(s"$outDir/ds_${res.trim.replace(" ", "_")}")
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(rawDir, outDir) = args.take(2)
    val resolutions =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim)
      else Seq("5 minutes", "1 hour")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, rawDir, outDir, resolutions)
    spark.stop()
  }
}
