package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.operators.MetadataOps

/** Part-key index COMPACTION job — the LSM maintenance step the
  * streaming ingest's append-only delta directory assumes (reference:
  * Lucene segment merging inside its part-key index; here the deltas
  * Ingest.startIngestWithIndex / startIngestWithQuota write per
  * microbatch). Readers fold deltas merge-on-read with
  * [[MetadataOps.mergeSeriesIndex]]; this job makes the fold durable —
  * read every delta, fold to one row per series with widened time
  * bounds, rewrite the directory as ONE segment — so read amplification
  * resets and the next fold starts small.
  *
  * Crash safety: the folded segment writes to `<dir>.compact.tmp` first
  * and swaps in via two renames (old → `.old`, tmp → dir, delete old).
  * A crash before the first rename leaves the original intact; between
  * renames the `.old` directory still holds every delta — recovery =
  * rename it back. Concurrent INGEST writers must be quiesced during
  * the swap (the reference pauses compaction per shard the same way);
  * batch-id partitioning means a compacted segment and fresh deltas
  * never collide afterwards (the segment keeps batch_id=-1).
  *
  * Usage: CompactIndexJob <indexDir>
  */
object CompactIndexJob {

  def run(spark: SparkSession, indexDir: String): Unit = {
    val folded = MetadataOps.mergeSeriesIndex(spark.read.parquet(indexDir))
    val tmp = s"$indexDir.compact.tmp"
    folded.write.mode("overwrite").partitionBy("metric")
      .parquet(s"$tmp/batch_id=-1")
    val dir = new Path(indexDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$indexDir.old")
    fs.delete(old, true)
    require(fs.rename(dir, old), s"could not move $indexDir aside")
    require(fs.rename(new Path(tmp), dir), s"could not activate $tmp")
    fs.delete(old, true)
  }

  def main(args: Array[String]): Unit = {
    val Array(indexDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, indexDir)
    spark.stop()
  }
}
