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

  /** Incremental-ingest dedup: drop rows of `newDocs` whose normalized
    * fingerprint already exists in the historical corpus. The corpus side
    * reduces to DISTINCT md5 keys before the anti-join — at 100 TB that is
    * the fingerprint index, not the text; store it as its own table and
    * this is one semi-structured anti-join per ingest batch (the batch
    * analogue of DocIngest's dropDuplicatesWithinWatermark state). Also
    * dedupes WITHIN the new batch (lowest id wins), so appending the
    * result keeps the corpus exact-duplicate-free. */
  def dropAgainstCorpus(newDocs: DataFrame, corpus: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val seen = corpus.select(TextAnalysis.fingerprint(col(textCol)).as("__fp")).distinct()
    dropExactDuplicates(newDocs, textCol, idCol)
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(seen, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Word k-shingles from an already-projected token array column. Tokens
    * must be STAGED as their own projection first: inlining the split
    * inside the transform/slice lambda makes Catalyst re-run the regex
    * split per array element — O(words^2) per doc (the winnowing pitfall,
    * see TextAnalysis.winnowingFingerprints). */
  def shinglesFromToks(toks: Column, k: Int = 3): Column =
    // sliding window join of k consecutive tokens
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** (idCol, shingles) with the token stage materialized. */
  private def withShingles(docs: DataFrame, textCol: String, idCol: String,
                           k: Int, out: String): DataFrame =
    docs.select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), shinglesFromToks(col("__toks"), k).as(out))

  /** MinHash signatures: numHashes per doc, hash_i = min over shingles of
    * an i-th universal hash of the shingle. The shingle string is hashed
    * ONCE (xxhash64 — the expensive per-row step at corpus scale) and the
    * i-th permutation is a multiply-xorshift mix of that 64-bit base with
    * per-i odd constants — standard universal-hashing practice, 16x less
    * string hashing than hashing (i, shingle) per permutation.
    *
    * Formulated as pure per-row expressions — NO explode, NO aggregation:
    * array_min over the mixed hash array per permutation. Zero shuffle for
    * the whole signature stage (an explode + 16-min groupBy computes the
    * same thing but re-evaluates the shingle array per exploded element —
    * measured O(words^2) per doc — and shuffles 50x more rows).
    * Returns (idCol, sig ARRAY<LONG>). */
  def minHashSignatures(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                        numHashes: Int = 32, shingleK: Int = 3): DataFrame = {
    val hashed = withShingles(docs, textCol, idCol, shingleK, "__sh")
      .select(col(idCol), transform(col("__sh"), s => xxhash64(s)).as("__h"))
    def mix(h: Column, i: Int): Column = {
      val m = h * lit(0x9E3779B97F4A7C15L + 2L * i) // odd multiplier
      m.bitwiseXOR(shiftrightunsigned(m, 29))
    }
    hashed.select(col(idCol),
      array((0 until numHashes).map(i =>
        array_min(transform(col("__h"), h => mix(h, i)))): _*).as("sig"))
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
    // repartition materializes the signature arrays at an exchange before
    // the posexplode — without the barrier the generator re-evaluates the
    // whole upstream signature expression per emitted band (sigs are
    // id + numHashes longs: a tiny, data-independent shuffle)
    val banded = sigs.repartition(col(idCol))
      .select(col(idCol), posexplode(bandHashes(col("sig"), rowsPerBand)))
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

  private[pipeline] def bandHashes(sig: Column, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), (size(sig) / rowsPerBand).cast("int") - 1),
      b => xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** Estimated Jaccard similarity from MinHash signatures for candidate
    * pairs; then exact-verify with true shingle Jaccard >= threshold. */
  def minHashDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                        numHashes: Int = 32, shingleK: Int = 3, rowsPerBand: Int = 4,
                        threshold: Double = 0.7, maxBucketSize: Int = 256,
                        precomputedSigs: Option[DataFrame] = None): DataFrame = {
    // signatures are (id + numHashes longs): checkpointed so the band
    // join's bucket-cap count and semi-join don't each re-derive the
    // shingle+hash computation from the corpus (6 scans measured without).
    // Callers that already hold this batch's signatures (the standing-
    // index ingest probes the index with the SAME sigs before in-batch
    // dedup) pass them in instead of paying the shingle+hash pass twice.
    val sigs = precomputedSigs.getOrElse(
      minHashSignatures(docs, textCol, idCol, numHashes, shingleK)
        .localCheckpoint(false))
    val cands = lshCandidatePairs(sigs, idCol, rowsPerBand, maxBucketSize)
    // the shingle arrays feed both sides of the verify join; a
    // localCheckpoint here was TRIED (r17) and measured neutral at best:
    // the materialized shingle strings are ~k x the corpus bytes, and
    // writing+reading them costs about what the second map-side
    // scan+shingle pass does (the gopherSignals lesson — materialize
    // only when the re-derivation includes a shuffle or an expensive
    // upstream, not for pure map-side re-compute)
    val withText = withShingles(docs, textCol, idCol, shingleK, "sh")
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

  /** EXACT Jaccard self-join with prefix filtering — the published
    * all-pairs scale path (Bayardo et al., WWW'07 "Scaling Up All Pairs
    * Similarity Search"; Xiao et al., PPJoin). Two distinct-token sets can
    * reach J >= t only if they share a token inside each one's PREFIX of
    * length |s| - ceil(t*|s|) + 1 under any one global token order; with
    * rarest-first ordering (ascending document frequency) the prefix
    * tokens are the rare ones, so the inverted-index join over prefixes
    * generates a small fraction of the blocked-pair candidates while
    * missing none. Results are identical to the naive blocked pair join.
    *
    * At 100 TB: one df-count aggregation, one per-doc re-sort (both linear
    * shuffles), and a candidate join whose fan-out is governed by rare
    * tokens — no quadratic block self-join, no caps, no approximation.
    *
    * `blockCols` (e.g. language, length bucket) become additional equality
    * keys a pair must share — the same blocking semantics as the pair
    * join it replaces. Input: (idCol, blockCols..., toksCol ARRAY<STRING>
    * of DISTINCT tokens). Output: (id1, id2, jaccard) with id1 < id2. */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   idCol: String = "doc_id", toksCol: String = "toks",
                   blockCols: Seq[String] = Nil,
                   rareFirst: Boolean = false): DataFrame = {
    val base = docs.select(col(idCol) +: blockCols.map(col) :+ col(toksCol).as("__toks"): _*)
    // Canonical order: ANY single consistent global order keeps the filter
    // exact. Default is hash order — a pure per-row expression, zero extra
    // shuffles, statistically spreads hot tokens out of prefixes.
    // rareFirst=true pays two linear shuffles (token df + per-doc
    // re-collect) for the classic ascending-document-frequency order —
    // worth it when a corpus is dominated by a small hot vocabulary.
    val resorted0 =
      if (!rareFirst)
        base.withColumn("__stoks",
          array_sort(transform(col("__toks"),
            t => struct(xxhash64(t).as("h"), t.as("t")))).getField("t"))
      else {
        val dfreq = base.select(explode(col("__toks")).as("__t"))
          .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
        base.select(col(idCol) +: blockCols.map(col) :+ explode(col("__toks")).as("__t"): _*)
          .join(dfreq, "__t") // AQE broadcasts dfreq when small
          .groupBy(col(idCol) +: blockCols.map(col): _*)
          .agg(array_sort(collect_list(struct(col("__df"), col("__t"))))
            .getField("__t").as("__stoks"))
      }
    // resorted is consumed THREE times (the prefix explode and both
    // sides of the verify join): checkpoint so the per-doc canonical
    // re-sort — an array_sort of (hash, token) structs over every token
    // of every doc — runs once, not three times (r17; guide §1.2 step 1)
    val resorted = resorted0
      .withColumn("__sz", size(col("__stoks")))
      .withColumn("__plen",
        (col("__sz") - ceil(lit(threshold) * col("__sz")) + 1).cast("int"))
      .localCheckpoint(false)
    val prefixes = resorted.select(
      col(idCol) +: blockCols.map(col) :+ col("__sz") :+
        explode(slice(col("__stoks"), lit(1), col("__plen"))).as("__t"): _*)
    val a = prefixes.as("a"); val b = prefixes.as("b")
    // size-ratio bound implied by J >= t (|min| >= t*|max|); the 1e-9
    // keeps exact-boundary pairs that double rounding could lose
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.__t") === col("b.__t") && col(s"a.$idCol") < col(s"b.$idCol") &&
        col("a.__sz") + lit(1e-9) >= lit(threshold) * col("b.__sz") &&
        col("b.__sz") + lit(1e-9) >= lit(threshold) * col("a.__sz"))(_ && _)
    val cands = a.join(b, cond)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2")).distinct()
    cands
      .join(resorted.select(col(idCol).as("id1"), col("__stoks").as("__t1")), "id1")
      .join(resorted.select(col(idCol).as("id2"), col("__stoks").as("__t2")), "id2")
      // |A∪B| = |A|+|B|-|A∩B| (tokens are distinct): one set op, not two
      .withColumn("__i", size(array_intersect(col("__t1"), col("__t2"))))
      .withColumn("jaccard", col("__i") /
        (size(col("__t1")) + size(col("__t2")) - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: bit j of the sketch is the
    * sign of sum over tokens of (+1/-1 by bit j of xxhash64(token)).
    *
    * The token-hash array is shuffled by doc BEFORE the explode: the
    * exchange materializes the array, so the explode's generator reads an
    * attribute instead of re-evaluating the split per exploded element
    * (measured O(words^2) per doc without the barrier), and the groupBy
    * reuses the exchange's partitioning — the 64 codegen'd bit-sums cost
    * no second shuffle. (A per-row filter()-per-bit formulation avoids the
    * shuffle entirely but runs 64 interpreted lambdas per row — measured
    * 9x slower than this plan.) */
  def simHash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val hashed = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), transform(col("__toks"), t => xxhash64(t)).as("__h"))
    val tok = hashed.repartition(col(idCol))
      .select(col(idCol), explode(col("__h")).as("h"))
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
    // (id, simhash, bucket) is ~24 bytes/row and its re-derivation
    // includes the corpus tokenize + per-token hashing + the 64-bit-sum
    // shuffle — the r17 materialization rule's clearest YES: capBuckets'
    // count, its semi-join and both self-join sides all read it
    val s0 = simHash(docs, textCol, idCol)
      .withColumn("bucket", shiftright(col("simhash"), 64 - prefixBits))
      .localCheckpoint(false)
    val s = capBuckets(s0, Seq("bucket"), maxBucketSize)
    val a = s.as("a"); val b = s.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("dist", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("dist") <= maxDist)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"), col("dist"))
  }

  /** Exact duplicate-SPAN removal across the corpus (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * ExactSubstr procedure at fixed token-window granularity instead of
    * suffix arrays): every w-token window whose (normalized) text occurs
    * at least `minOccurrences` times corpus-wide (within-doc repeats
    * count) is removed everywhere EXCEPT its canonical first occurrence
    * (min (doc_id, pos) over all occurrences), and each doc's surviving
    * tokens are re-joined into clean text.
    *
    * Scale shape: the occurrence-count shuffle carries xxhash64 longs per
    * window, never the w-token strings (the hash-first contract — see
    * Quality.topNgramCharFraction); covered positions return per doc as
    * ONE array of window starts in a narrow join (expanded to token
    * positions map-side after the groupBy), and the final token filter is
    * a pure map-side expression over the staged token array. 64-bit
    * hashing makes a within-corpus window collision ~2^-64 per pair.
    *
    * Output: (idCol, clean_text, removed_frac) — one row per input doc,
    * removed_frac = removed tokens / total tokens. Text is compared and
    * rebuilt lowercase (dedup normalization). */
  def removeDuplicateSpans(docs: DataFrame, w: Int = 8, textCol: String = "text",
                           idCol: String = "doc_id",
                           minOccurrences: Int = 2): DataFrame = {
    // base feeds spanCoverage's window pass AND the text-rebuild join, and
    // its upstream may be a whole curation composition (q118 pipes the
    // Gopher gate join in as `docs`): checkpoint so the scan + tokenize +
    // upstream execute once, not once per consumer
    val base = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .localCheckpoint(false)
    val cov = spanCoverage(base, w, idCol, minOccurrences)
    base.join(cov, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__cov").isNull, concat_ws(" ", col("__toks")))
          .otherwise(concat_ws(" ",
            filter(
              transform(sequence(lit(0), size(col("__toks")) - 1),
                i => when(array_contains(col("__cov"), i), lit(null))
                  .otherwise(element_at(col("__toks"), i + 1))),
              x => x.isNotNull)))
          .as("clean_text"),
        when(col("__cov").isNull, lit(0.0))
          .otherwise(round(size(col("__cov")) / size(col("__toks")).cast("double"), 6))
          .as("removed_frac"))
  }

  /** Duplicated-token coverage per doc: the sorted distinct positions
    * covered by NON-CANONICAL duplicated w-windows (canonical = the
    * (doc, pos)-least occurrence of each window hash, which keeps its
    * copy). Shared by [[removeDuplicateSpans]] (rebuilds text minus the
    * covered positions) and [[duplicateSpanReport]] (merges them into
    * maximal spans). Input must carry (idCol, __toks).
    *
    * Windows exist only where the doc has >= w tokens; pos is 0-based
    * fixed-width (id, pos, hash) rows, checkpointed so the duplicate
    * stats and the coverage join share one derivation (the corpus then
    * scans twice: window pass + text rebuild). Duplicated = occurs >=
    * minOccurrences CORPUS-WIDE, including repeats within one document
    * (boilerplate/spam is the archetypal ExactSubstr target and usually
    * repeats inside a single page). Raise minOccurrences for a C4-style
    * "only very common spans" policy. */
  private def spanCoverage(base: DataFrame, w: Int, idCol: String,
                           minOccurrences: Int): DataFrame = {
    val wins = base
      .where(size(col("__toks")) >= w)
      .select(col(idCol),
        posexplode(TextAnalysis.gramsFromTokens(col("__toks"), w)).as(Seq("__pos", "__h")))
      .localCheckpoint(false)
    val dupStats = wins
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__nocc"),
           min(struct(col(idCol), col("__pos"))).as("__canon"))
      .where(col("__nocc") >= minOccurrences)
    wins.join(dupStats, "__h")
      .where(!(col(idCol) === col("__canon").getField(idCol) &&
               col("__pos") === col("__canon").getField("__pos")))
      .groupBy(col(idCol))
      .agg(collect_set(col("__pos")).as("__ps"))
      .select(col(idCol),
        array_distinct(flatten(transform(col("__ps"), p => sequence(p, p + w - 1))))
          .as("__cov"))
  }

  /** ARBITRARY-LENGTH duplicated spans (Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better", the ExactSubstr unit):
    * one row per MAXIMAL duplicated passage — (idCol, span_start,
    * span_len) — instead of [[removeDuplicateSpans]]'s implicit w-token
    * granularity. A passage of L >= w duplicated tokens seeds L-w+1
    * overlapping duplicated windows whose union covers all L positions,
    * so merging contiguous covered positions recovers the full passage
    * as ONE span of length L — the suffix-array result for spans >= w,
    * from hash-only shuffles (Lee et al.'s own Bloom-filter variant makes
    * the same >= w approximation).
    *
    * Scale shape: the coverage derivation is [[spanCoverage]] (two
    * corpus scans, fixed-width hash rows); the contiguous-run merge is a
    * single map-side fold over each doc's sorted coverage array — no
    * additional shuffle, no per-span explode until the final output. */
  def duplicateSpanReport(docs: DataFrame, w: Int = 8, textCol: String = "text",
                          idCol: String = "doc_id",
                          minOccurrences: Int = 2): DataFrame = {
    // no checkpoint here: unlike removeDuplicateSpans there is no rebuild
    // join — spanCoverage's wins checkpoint is the only consumer of base,
    // so the tokenize already runs exactly once
    val base = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
    val s = array_sort(col("__cov"))
    // fold positions into maximal runs: extend the last (start, len) when
    // the next position is adjacent, else open a new run
    val runs = aggregate(s, typedLit(Seq.empty[(Int, Int)]),
      (acc, p) => {
        val last = element_at(acc, -1)
        when(size(acc) > 0 && last.getField("_1") + last.getField("_2") === p,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(last.getField("_1").as("_1"),
              (last.getField("_2") + lit(1)).as("_2")))))
          .otherwise(concat(acc, array(struct(p.as("_1"), lit(1).as("_2")))))
      })
    spanCoverage(base, w, idCol, minOccurrences)
      .select(col(idCol), explode(runs).as("__run"))
      .select(col(idCol), col("__run._1").as("span_start"), col("__run._2").as("span_len"))
  }

  /** Directional CONTAINMENT detection (Broder's containment coefficient
    * over winnowing fingerprint sets): |fp(A) ∩ fp(B)| / |fp(A)| >=
    * threshold flags A as (near-)contained in B — quotes, scraped
    * aggregates, boilerplate-wrapped copies: the case symmetric Jaccard
    * misses (a short doc embedded in a long one has low Jaccard but
    * containment ~1). A verbatim embedded copy scores exactly 1.0: every
    * interior winnowing window of the copy exists identically in the
    * container.
    *
    * Scale shape: fingerprints shuffle as (doc, fp) longs (winnowing
    * projections materialized per the quadratic-re-evaluation pitfall);
    * per-doc sketch sizes are a doc-cardinality aggregate; candidate
    * pairs form through the shared-fp inverted index with degenerate-fp
    * capping (a fingerprint shared by hundreds of docs is boilerplate —
    * capped members still pair through their other fps). Scores are
    * exact integer micro fractions.
    * Output: (contained_id, container_id, shared_fps, containment_micro),
    * ORDERED pairs (A-in-B and B-in-A are different rows). */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.8,
                       shingleK: Int = 4, winnowW: Int = 5,
                       maxBucketSize: Int = 256,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fps = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), TextAnalysis.gramsFromTokens(col("__toks"), shingleK).as("__g"))
      .repartition(col(idCol))
      .select(col(idCol),
        explode(TextAnalysis.fingerprintsFromGrams(col("__g"), winnowW)).as("fp"))
      .localCheckpoint(false)
    val capped = capBuckets(fps, Seq("fp"), maxBucketSize)
    // denominator over the CAPPED sketch, not the raw one: shared_fps can
    // only count capped fingerprints, so a boilerplate-heavy doc (most of
    // its fps in degenerate buckets) is scored over its effective sketch
    // instead of being silently under-scored to the point of missing the
    // threshold entirely — numerator and denominator see the same set
    val sizes = capped.groupBy(col(idCol)).agg(count(lit(1)).as("__sz"))
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b, col("a.fp") === col("b.fp") && col(s"a.$idCol") =!= col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("contained_id"), col(s"b.$idCol").as("container_id"))
      .agg(count(lit(1)).as("shared_fps"))
      .join(sizes.select(col(idCol).as("contained_id"), col("__sz")), "contained_id")
      .withColumn("containment_micro", expr("shared_fps * 1000000 div __sz"))
      .filter(col("containment_micro") >= math.round(threshold * 1e6))
      .select(col("contained_id"), col("container_id"),
        col("shared_fps"), col("containment_micro"))
  }

  /** CCNet-style corpus-level LINE deduplication (Wenzek et al. 2020): drop
    * every non-canonical occurrence of a line whose normalized form
    * (trim + lowercase) appears >= minOccurrences times corpus-wide,
    * including repeats inside one document. The canonical occurrence — the
    * (doc, position)-least — keeps its copy, so boilerplate (cookie
    * banners, "subscribe…" footers) survives exactly once in the corpus.
    * Complements [[removeDuplicateSpans]]: lines are the unit crawls
    * actually repeat at; spans catch verbatim passages that cross line
    * structure.
    *
    * Scale shape (the hash-first contract, see Quality.topNgramCharFraction):
    * occurrences shuffle (idCol, pos, xxhash64(norm_line)) — fixed-width
    * longs, never line text; the duplicate-stats aggregate and the removal
    * join reuse that key space; text is rebuilt map-side from the staged
    * line array. Blank lines are neither dedup keys nor output.
    *
    * Output: (idCol, clean_text, removed_line_frac) — one row per input
    * doc; the fraction is over the doc's non-blank lines. */
  def removeDuplicateLines(docs: DataFrame, textCol: String = "text",
                           idCol: String = "doc_id",
                           minOccurrences: Int = 2): DataFrame = {
    val base = docs.select(col(idCol), split(col(textCol), "\n").as("__lines"))
    // line-hash occurrences (fixed-width rows, no text): checkpointed so
    // the duplicate-stats aggregate and the removal join share one pass —
    // the corpus then scans exactly twice (hash pass + text rebuild),
    // the operator's honest minimum
    val occ = base
      .select(col(idCol), posexplode(col("__lines")).as(Seq("__pos", "__line")))
      .where(trim(col("__line")) =!= "")
      .select(col(idCol), col("__pos"), xxhash64(trim(lower(col("__line")))).as("__h"))
      .localCheckpoint(false)
    val dupStats = occ
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__nocc"),
           min(struct(col(idCol), col("__pos"))).as("__canon"))
      .where(col("__nocc") >= minOccurrences)
    val rm = occ.join(dupStats, "__h")
      .where(!(col(idCol) === col("__canon").getField(idCol) &&
               col("__pos") === col("__canon").getField("__pos")))
      .groupBy(col(idCol))
      .agg(collect_set(col("__pos")).as("__rm"))
    base.join(rm, Seq(idCol), "left")
      .select(col(idCol),
        concat_ws("\n",
          filter(
            transform(sequence(lit(0), size(col("__lines")) - 1),
              i => when((col("__rm").isNotNull && array_contains(col("__rm"), i)) ||
                        trim(element_at(col("__lines"), i + 1)) === "", lit(null))
                .otherwise(element_at(col("__lines"), i + 1))),
            x => x.isNotNull)).as("clean_text"),
        round(when(col("__rm").isNull, lit(0)).otherwise(size(col("__rm"))) /
            greatest(size(filter(col("__lines"), l => trim(l) =!= "")), lit(1)).cast("double"),
          6).as("removed_line_frac"))
  }
}
