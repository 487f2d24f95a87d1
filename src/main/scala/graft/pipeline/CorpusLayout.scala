package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of the corpus-side incremental state at scale — the
  * pipeline analogue of [[graft.model.TsLayout.writeBucketed]].
  *
  * [[Dedup.dropAgainstCorpus]] reduces the historical corpus to a DISTINCT
  * fingerprint set per ingest batch; at 100 TB that reduction re-reads and
  * re-shuffles corpus-scale data on EVERY batch. This layout persists the
  * fingerprint set once, as a managed table bucketed by `fp`: the
  * per-batch anti-join then reads the bucket files as pre-shuffled input —
  * only the (batch-sized) probe side moves, the index side plans with zero
  * exchange no matter how large it grows. The shuffle over corpus-scale
  * data is paid exactly once, at index build; each ingest batch appends its
  * own (already co-bucketed) survivors.
  */
object CorpusLayout {

  /** Build (or append to) the fingerprint index: one row per distinct
    * normalized-text fingerprint in `docs`, keeping the lowest id as the
    * canonical document. Bucketed + sorted by `fp`; `repartition` on the
    * same key first so each task writes exactly one bucket file (the
    * P×nBuckets small-files trap — see TsLayout.writeBucketed). */
  def writeFingerprintIndex(docs: DataFrame, table: String, nBuckets: Int = 32,
                            textCol: String = "text", idCol: String = "doc_id",
                            mode: SaveMode = SaveMode.Overwrite): Unit =
    docs
      .select(TextAnalysis.fingerprint(col(textCol)).as("fp"), col(idCol).as("doc_id"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .repartition(nBuckets, col("fp"))
      .write
      .bucketBy(nBuckets, "fp")
      .sortBy("fp")
      .mode(mode)
      .format("parquet")
      .saveAsTable(table)

  /** Incremental-ingest dedup against the persisted index: semantics of
    * [[Dedup.dropAgainstCorpus]] (drop batch rows whose fingerprint is
    * already indexed, dedupe within the batch, lowest id wins) but the
    * corpus side is the bucketed index — its scan plans no exchange. */
  def dropAgainstIndex(spark: SparkSession, newDocs: DataFrame, table: String,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val seen = spark.table(table).select(col("fp").as("__fp"))
    Dedup.dropExactDuplicates(newDocs, textCol, idCol)
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(seen, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Fold a deduplicated batch into the index (call with the OUTPUT of
    * [[dropAgainstIndex]] so appended fingerprints are genuinely new).
    * Spark verifies the bucket spec matches the existing table. */
  def appendToIndex(survivors: DataFrame, table: String, nBuckets: Int = 32,
                    textCol: String = "text", idCol: String = "doc_id"): Unit =
    writeFingerprintIndex(survivors, table, nBuckets, textCol, idCol, SaveMode.Append)
}
