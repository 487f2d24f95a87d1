package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share verbatim
  * token n-grams with an evaluation/benchmark set (the GPT-3 appendix-C /
  * PaLM "13-gram overlap" procedure, scaled to this corpus' short docs).
  *
  * Scale shape: the benchmark side is SMALL by construction (eval sets are
  * thousands of items, not billions) — its distinct grams are broadcast,
  * so the 100 TB corpus side never shuffles its grams for the probe; only
  * the (rare) matched rows reach the per-doc count aggregation. The corpus
  * gram expansion is a pure map-side projection (staged tokens, see
  * Dedup.shinglesFromToks for the inlining pitfall).
  */
object Decontam {

  /** Distinct n-gram strings per row: (idCol, gram). */
  private def grams(df: DataFrame, n: Int, textCol: String, idCol: String,
                    outId: String): DataFrame =
    df.select(col(idCol).as(outId), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .where(size(col("__toks")) >= n)
      .select(col(outId),
        explode(array_distinct(Quality.wordGramsFromToks(col("__toks"), n))).as("gram"))

  /** Per-corpus-doc contamination report against `benchmarks`:
    * (idCol, n_hit_grams = distinct corpus grams that appear in any
    * benchmark item, n_benchmarks = distinct benchmark items hit).
    * Clean documents are absent from the result. */
  def flagContaminated(corpus: DataFrame, benchmarks: DataFrame, n: Int = 8,
                       textCol: String = "text", idCol: String = "doc_id",
                       benchTextCol: String = "text", benchIdCol: String = "bench_id"): DataFrame = {
    val corpusGrams = grams(corpus, n, textCol, idCol, idCol)
    val benchGrams = grams(benchmarks, n, benchTextCol, benchIdCol, "__bench_id")
    corpusGrams
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_hit_grams"),
           countDistinct(col("__bench_id")).as("n_benchmarks"))
  }

  /** [[flagContaminated]] with a BLOOM-FILTER prefilter — the two-phase
    * shape for a LARGE benchmark side (a full eval-suite union is
    * millions of grams: its broadcast hash table costs ~16+ bytes/gram,
    * while a 1%-FPP Bloom costs ~10 BITS/gram, a ~13x smaller broadcast).
    * Phase 1 fits one Bloom over the benchmark gram hashes
    * (`df.stat.bloomFilter` — Spark's public sketch; one pass over the
    * small side) and drops ~99% of the corpus gram stream map-side
    * against the broadcast bits. Phase 2 exact-confirms survivors with
    * the same broadcast join as [[flagContaminated]] — Bloom false
    * positives die there and Bloom has no false negatives, so results
    * are EXACTLY flagContaminated's (the q167 gate runs both engines on
    * that contract). The probe is a per-partition pass over hashed grams
    * (one primitive mightContainLong per gram) — row-at-a-time, but so
    * cheap the scan dominates; everything downstream of the prefilter is
    * back in codegen. */
  def flagContaminatedBloom(corpus: DataFrame, benchmarks: DataFrame, n: Int = 8,
                            textCol: String = "text", idCol: String = "doc_id",
                            benchTextCol: String = "text", benchIdCol: String = "bench_id",
                            fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.Encoders
    // three consumers (count, bloom fit, confirm join) — checkpoint the
    // small side once instead of re-deriving the gram expansion per use
    val benchGrams = grams(benchmarks, n, benchTextCol, benchIdCol, "__bench_id")
      .localCheckpoint(false)
    val benchHashes = benchGrams.select(xxhash64(col("gram")).as("__h"))
    val nBench = math.max(benchHashes.count(), 1L)
    val bf = benchHashes.stat.bloomFilter("__h", nBench, fpp)
    val bcast = corpus.sparkSession.sparkContext.broadcast(bf)
    val corpusGrams = grams(corpus, n, textCol, idCol, idCol)
      .select(col(idCol), col("gram"), xxhash64(col("gram")).as("__h"))
    val rowEnc = Encoders.row(corpusGrams.schema)
    val survivors = corpusGrams.mapPartitions { rows =>
      val filter = bcast.value
      rows.filter(r => filter.mightContainLong(r.getLong(2)))
    }(rowEnc)
    survivors
      .join(broadcast(benchGrams), "gram") // exact confirm: FPs die here
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_hit_grams"),
           countDistinct(col("__bench_id")).as("n_benchmarks"))
  }

  /** Decontaminated corpus: drop every document flagged against the
    * benchmark set (left_anti on the flag set). */
  def removeContaminated(corpus: DataFrame, benchmarks: DataFrame, n: Int = 8,
                         textCol: String = "text", idCol: String = "doc_id",
                         benchTextCol: String = "text", benchIdCol: String = "bench_id"): DataFrame =
    corpus.join(
      flagContaminated(corpus, benchmarks, n, textCol, idCol, benchTextCol, benchIdCol)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** SEMANTIC contamination against a benchmark's EMBEDDINGS: corpus
    * docs whose embedding cosine against any benchmark item reaches
    * `threshold` — the leak n-gram overlap structurally misses
    * (paraphrases, translations, templated rewordings of eval items;
    * the same motivation as SemDeDup's semantic near-dups, pointed at
    * decontamination). Complements [[flagContaminated]]: run both, union
    * the flags.
    *
    * Scale shape: eval sets are small by construction, so the benchmark
    * embeddings BROADCAST and the corpus side is one map-side scan —
    * no corpus shuffle at any size (the q65 brute-force contract, which
    * is exactly right when one side is query-scale). Cosines evaluate
    * through the codegen'd vector_dot kernel and round once to integer
    * micro-units (the exact-hash determinism contract).
    * `corpus`: (idCol, vecCol); `bench`: (benchIdCol, vecCol).
    * Output: (idCol, benchIdCol, sim_micro), one row per flagged pair. */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            threshold: Double,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            benchIdCol: String = "bench_id"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", Similarity.norm(col("__cv")))
    val b = broadcast(bench
      .select(col(benchIdCol), col(vecCol).cast("array<double>").as("__bv"))
      .withColumn("__bn", Similarity.norm(col("__bv"))))
    c.crossJoin(b)
      .withColumn("sim_micro",
        round(Similarity.dot(col("__cv"), col("__bv")) / (col("__cn") * col("__bn")) * 1e6)
          .cast("long"))
      .filter(col("sim_micro") >= math.round(threshold * 1e6))
      .select(col(idCol), col(benchIdCol), col("sim_micro"))
  }

  /** Contamination-safe train/eval split: assign every doc its
    * md5-deterministic [[Sampling.hashSplit]] label, then QUARANTINE any
    * train doc sharing a verbatim token n-gram with ANY doc of the eval
    * splits (the decontamination step a real pretrain/eval split needs —
    * without it, eval examples leak into training through near-copies the
    * split hash distributed across both sides).
    *
    * Scale shape: unlike [[flagContaminated]] (whose benchmark side is
    * small and broadcast), the eval side here is a FRACTION OF THE CORPUS
    * — so the gram probe is a hash-first shuffle join: both sides shuffle
    * xxhash64(gram) longs, never gram strings (collision odds ~n²/2⁶⁴;
    * the oracle joins the strings themselves). Quarantined docs stay in
    * the output, relabeled, so the caller sees what decontamination cost.
    * Output: (idCol, split) with split ∈ splits' labels + "quarantined". */
  def contaminationSafeSplit(docs: DataFrame,
                             splits: Seq[(String, Double)],
                             trainSplit: String = "train", n: Int = 8,
                             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(splits.exists(_._1 == trainSplit), s"splits must include '$trainSplit': $splits")
    val labeled = docs.select(col(idCol), col(textCol),
      Sampling.hashSplit(col(idCol), splits).as("split"))
    // the shared gram expansion, hashed (one more projection on top of
    // the same helper flagContaminated uses — no second copy to drift)
    def hashedGrams(df: DataFrame): DataFrame =
      grams(df, n, textCol, idCol, idCol)
        .select(col(idCol), xxhash64(col("gram")).as("__h"))
    val trainGrams = hashedGrams(labeled.where(col("split") === trainSplit))
    val evalGrams = hashedGrams(labeled.where(col("split") =!= trainSplit))
      .select(col("__h")).distinct()
    val hit = trainGrams.join(evalGrams, "__h")
      .select(col(idCol)).distinct().withColumn("__hit", lit(true))
    labeled.join(hit, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__hit").isNotNull, lit("quarantined")).otherwise(col("split")).as("split"))
  }
}
