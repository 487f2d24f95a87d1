package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §7.2
  * step 10). Four families:
  *   - exact: hash-groupBy on a normalized fingerprint (one shuffle)
  *   - MinHash + LSH: shingle → k minhashes → band buckets → candidate
  *     pairs only within buckets (avoids the O(n²) cross join; the LSH
  *     band join is the 100 TB-scale path)
  *   - SimHash: 64-bit sign-of-weighted-bits sketch, near-dups = small
  *     Hamming distance within same bucket prefix
  *   - n-gram Jaccard: exact verify step on LSH candidates
  * All built from codegen'd expressions + joins; no driver-side loops.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint. */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** Keep one representative per exact-duplicate group. */
  def dropExactDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val keep = exactGroups(docs, textCol, idCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Word k-shingles of the normalized text. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    // sliding window join of k consecutive tokens
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** MinHash signatures: numHashes per doc, hash_i = min over shingles of
    * an i-th universal hash of the shingle. The shingle string is hashed
    * ONCE (xxhash64 — the expensive per-row step at corpus scale) and the
    * i-th permutation is a multiply-xorshift mix of that 64-bit base with
    * per-i odd constants — standard universal-hashing practice, 16x less
    * string hashing than hashing (i, shingle) per permutation.
    * Returns (idCol, sig ARRAY<LONG>). */
  def minHashSignatures(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                        numHashes: Int = 32, shingleK: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), explode(shingles(col(textCol), shingleK)).as("sh"))
      .withColumn("__h", xxhash64(col("sh")))
    def mix(i: Int): Column = {
      val m = col("__h") * lit(0x9E3779B97F4A7C15L + 2L * i) // odd multiplier
      m.bitwiseXOR(shiftrightunsigned(m, 29))
    }
    val aggs = (0 until numHashes).map(i => min(mix(i)).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: split the signature into bands of `rowsPerBand`,
    * bucket-join docs sharing any band hash. Pair count is bounded by
    * bucket sizes, never O(n²) — and `maxBucketSize` drops degenerate
    * buckets (boilerplate-heavy corpora put thousands of docs behind one
    * band hash, whose self-join would be quadratic at 100 TB). Members of
    * a dropped bucket still pair through their other bands; truly
    * identical docs are exact-dedup's job, not LSH's. */
  def lshCandidatePairs(sigs: DataFrame, idCol: String = "doc_id",
                        rowsPerBand: Int = 4, maxBucketSize: Int = 256): DataFrame = {
    val banded = sigs.select(col(idCol), posexplode(bandHashes(col("sig"), rowsPerBand)))
      .select(col(idCol), col("pos").as("band"), col("col").as("bh"))
    val capped = capBuckets(banded, Seq("band", "bh"), maxBucketSize)
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()
  }

  /** Keep only rows whose bucket has at most `maxBucketSize` members —
    * one partial-aggregated count + a semi-join, both on the bucket key. */
  private[pipeline] def capBuckets(df: DataFrame, bucketCols: Seq[String],
                                   maxBucketSize: Int): DataFrame = {
    val ok = df.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucketSize)
      .select(bucketCols.map(col): _*)
    df.join(ok, bucketCols, "left_semi")
  }

  private def bandHashes(sig: Column, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), (size(sig) / rowsPerBand).cast("int") - 1),
      b => xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** Estimated Jaccard similarity from MinHash signatures for candidate
    * pairs; then exact-verify with true shingle Jaccard >= threshold. */
  def minHashDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                        numHashes: Int = 32, shingleK: Int = 3, rowsPerBand: Int = 4,
                        threshold: Double = 0.7, maxBucketSize: Int = 256): DataFrame = {
    val sigs = minHashSignatures(docs, textCol, idCol, numHashes, shingleK)
    val cands = lshCandidatePairs(sigs, idCol, rowsPerBand, maxBucketSize)
    val withText = docs.select(col(idCol), shingles(col(textCol), shingleK).as("sh"))
    cands
      .join(withText.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
      .join(withText.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
      // |A∪B| = |A|+|B|-|A∩B| (shingles are distinct): one set op, not two
      .withColumn("__i", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("__i") /
        (size(col("sh1")) + size(col("sh2")) - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: bit j of the sketch is the
    * sign of sum over tokens of (+1/-1 by bit j of xxhash64(token)). */
  def simHash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol), explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Near-duplicate pairs by SimHash: same high-prefix bucket, Hamming
    * distance <= maxDist (bit_count of xor). */
  def simHashDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                        prefixBits: Int = 16, maxDist: Int = 8,
                        maxBucketSize: Int = 1024): DataFrame = {
    val s0 = simHash(docs, textCol, idCol)
      .withColumn("bucket", shiftright(col("simhash"), 64 - prefixBits))
    val s = capBuckets(s0, Seq("bucket"), maxBucketSize)
    val a = s.as("a"); val b = s.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("dist", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("dist") <= maxDist)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"), col("dist"))
  }
}
