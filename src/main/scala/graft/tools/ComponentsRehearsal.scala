package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.Components

/** Incremental-components scale rehearsal: fold cost vs TOUCHED-COMPONENT
  * SIZE (closes the measurement gap behind r10's contract-first rewrite).
  *
  * A fixed 1M-row standing assignment is partitioned into components of
  * `csize` members; a 10-edge batch merges ten adjacent component pairs.
  * Pre-r10 the fold re-expanded every member of a touched component into
  * the star-forest loop (cost ∝ csize); the contraction-first fold runs
  * the loop over one node per touched component, so the line should be
  * FLAT from 10-member to 100k-member components. A second, intra-
  * component batch measures the steady-state fast path (contracts to
  * self-loops — zero iteration rounds).
  */
object ComponentsRehearsal {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 1000000L

    println(f"${"comp size"}%10s ${"members touched"}%16s ${"fold(s)"}%8s " +
      f"${"noop batch(s)"}%14s ${"components after"}%17s")

    for (csize <- Seq(10L, 1000L, 100000L)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cc-$csize").toString
      spark.range(n)
        .select(col("id"), (col("id") / csize).cast("long").multiply(csize).as("component"))
        .write.mode("overwrite").parquet(dir)
      val assign = spark.read.parquet(dir)
      // merging edges: least member of component 2k joined to least of
      // 2k+1 — as many pairs as the component count allows, up to ten
      val nMerges = math.min(10L, n / csize / 2).toInt
      val merges = (0 until nMerges).map(k => (2L * k * csize, (2L * k + 1) * csize))
        .toDF("id1", "id2")
      val t0 = System.nanoTime()
      val folded = Components.incrementalComponents(assign, merges)
      val comps = folded.select(col("component")).distinct().count()
      val foldSec = (System.nanoTime() - t0) / 1e9
      // steady state: edges entirely inside existing components
      val noop = (0 until nMerges).map(k => (k * csize, k * csize + 1)).toDF("id1", "id2")
      val t1 = System.nanoTime()
      Components.incrementalComponents(assign, noop).select(col("component")).distinct().count()
      val noopSec = (System.nanoTime() - t1) / 1e9
      println(f"$csize%10d ${nMerges * 2 * csize}%16d $foldSec%8.2f $noopSec%14.2f $comps%17d")
    }
    spark.stop()
  }
}
