package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Quality, TextAnalysis}

/** Streaming corpus ingest for training-data pipelines: documents arrive
  * continuously; each micro-batch is fingerprinted, EXACT-deduped against
  * everything seen inside the watermark horizon, and gated on the
  * expression-only quality signals — all before hitting the sink, so the
  * stored corpus is already clean.
  *
  * Scale notes:
  *  - dropDuplicatesWithinWatermark keys state on the 32-byte md5
  *    fingerprint, not the text, and the watermark bounds state size —
  *    an unbounded-state dedup would be the 100 TB killer.
  *  - The quality gate uses only zero-shuffle signals (word count, mean
  *    word length, duplicate-word fraction, symbol ratio). The top-n-gram
  *    repetition signals need a per-(doc, gram) aggregation, which is a
  *    batch-side job (Quality.gopherSignals) over the already-deduped
  *    sink — same split the reference keeps between ingest-time and
  *    compaction-time work.
  */
object DocIngest {

  /** The raw document schema every doc source produces; `ingest_ts` is
    * epoch-millis event time. */
  val DocsSchema = "doc_id LONG, text STRING, lang STRING, source STRING, ingest_ts LONG"

  /** normalize → fingerprint → watermark-bounded exact dedup → quality
    * gate. Works on any events-shaped stream (or batch frame for tests —
    * batch callers get plain dropDuplicates semantics). */
  def docPipeline(docs: DataFrame, lateness: String = "10 minutes",
                  minWords: Int = 10, maxSymbolRatio: Double = 0.1,
                  maxDupWordFrac: Double = 0.9): DataFrame = {
    val fp = docs
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("et", timestamp_millis(col("ingest_ts")))
    val deduped =
      if (docs.isStreaming)
        fp.withWatermark("et", lateness).dropDuplicatesWithinWatermark("fp")
      else fp.dropDuplicates("fp")
    deduped
      .withColumn("word_count", Quality.wordCount(col("text")))
      .withColumn("mean_word_len", Quality.meanWordLength(col("text")))
      .withColumn("dup_word_frac", Quality.duplicateWordFraction(col("text")))
      .withColumn("symbol_ratio", Quality.symbolToWordRatio(col("text")))
      .filter(col("word_count") >= minWords &&
        col("mean_word_len").between(1.0, 20.0) &&
        col("symbol_ratio") < maxSymbolRatio &&
        col("dup_word_frac") < maxDupWordFrac)
      .drop("et")
  }

  /** Append the cleaned stream to a parquet corpus partitioned by source
    * (pruning for per-source reprocessing). */
  def startDocIngest(docs: DataFrame, sinkDir: String,
                     checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docPipeline(docs).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("source")
      .start()
}
