package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / sharding for training pipelines.
  *
  * Everything keys off md5 of the document id — not Spark-internal hashing
  * — so the SAME document lands in the SAME split on any engine (the
  * DuckDB oracle reproduces the assignment bit-for-bit), across reruns,
  * repartitions, and cluster sizes. That stability is the point: a
  * train/val split that moves when the cluster topology changes silently
  * contaminates evaluation sets.
  */
object Sampling {

  /** Uniform [0, 1) hash point for an id: first 4 hex digits of md5. */
  def hashPoint(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("double") / 65536.0

  /** Stable split label from cumulative weight thresholds, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). */
  def hashSplit(id: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val u = hashPoint(id)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), rest) => when(u < hi, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic Bernoulli sample: keep ids whose hash point < rate. */
  def hashSample(df: DataFrame, rate: Double, idCol: String = "doc_id"): DataFrame =
    df.where(hashPoint(col(idCol)) < rate)

  /** Pack documents into token-budgeted shards for sequence-packed
    * training. Docs are spread across `nBuckets` independent packing
    * streams by id hash (buckets pack in parallel — the 100 TB path: one
    * window per bucket, never a global sort), then greedily accumulated
    * in id order until each shard reaches `budgetTokens`.
    * Output: (idCol, bucket, shard, n_tokens) — shard is unique within
    * bucket. */
  def packIntoShards(docs: DataFrame, budgetTokens: Long, nBuckets: Int,
                     tokenCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    val bucket = (conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int") % nBuckets).as("bucket")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), bucket, col(tokenCol))
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .select(col(idCol), col("bucket"),
        floor((col("__cum") - col(tokenCol)) / budgetTokens).as("shard"),
        col(tokenCol))
  }

  /** Cap the number of documents kept per group (host/source/domain) —
    * the CommonCrawl-style guard against a single host dominating the
    * corpus. Selection inside a group is by md5 hash point (id as the
    * tiebreak), NOT arrival order, so the kept set is deterministic
    * across engines, reruns, and topologies, and is an unbiased sample
    * of the group rather than its first-crawled prefix.
    *
    * Scale shape: one window per group key — the same single shuffle a
    * groupBy would cost; no global sort, no driver state. Skewed hosts
    * are exactly the rows AQE's skew handling splits.
    * Output: the kept rows of `docs` (all original columns). */
  def capPerGroup(docs: DataFrame, maxPerGroup: Int,
                  groupCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive: $maxPerGroup")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashPoint(col(idCol)).asc, col(idCol).asc)
    docs.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= maxPerGroup)
      .drop("__rk")
  }

  /** Temperature-weighted domain sampling — the multilingual/data-mixing
    * standard (mT5, Xue et al. 2021: p_s ∝ |s|^alpha): draw ~targetRows
    * docs with per-domain keep rate
    *   r_s = min(1, targetRows * n_s^alpha / (sum_t n_t^alpha) / n_s),
    * each doc kept iff its md5 hash point < r_s. alpha < 1 flattens the
    * domain distribution (upsamples small domains relative to their share);
    * alpha = 1 is proportional sampling. Deterministic across engines,
    * reruns, and topologies (same md5-keyed points as hashSplit).
    *
    * Scale shape: domain stats are a tiny aggregate (one row per domain)
    * broadcast back to the corpus scan — the corpus itself never shuffles;
    * the keep decision is a map-side expression.
    * Output: kept (idCol, domainCol) rows. */
  def temperatureSample(docs: DataFrame, alpha: Double, targetRows: Long,
                        domainCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val stats = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), alpha))
    val z = stats.agg(sum(col("__w")).as("__z"))
    val rates = stats.crossJoin(broadcast(z))
      .select(col(domainCol),
        least(lit(1.0), lit(targetRows.toDouble) * col("__w") / col("__z") / col("__n"))
          .as("__rate"))
    docs.join(broadcast(rates), domainCol)
      .where(hashPoint(col(idCol)) < col("__rate"))
      .select(col(idCol), col(domainCol))
  }

  /** Assemble a training mix from EXPLICIT source weights and a total
    * token budget (The Pile / DoReMi-style "data recipe" step after
    * curation): each in-mix source s gets keep rate
    * r_s = min(1, budget·w_s / tokens_s); docs keep via the md5 hash
    * point, so the mix is deterministic across engines, topologies and
    * reruns, and a re-run with a bigger budget only ADDS documents
    * (hash-point keeps nest). Sources absent from `weights` drop out;
    * sources smaller than their target are fully kept — upsampling via
    * repeated epochs is a trainer concern, not a corpus transform.
    *
    * Scale shape: per-source token totals are one aggregate row per
    * source, joined back as a broadcast; the corpus never shuffles and
    * the keep decision is a map-side expression.
    * Output: kept (idCol, sourceCol, rate rounded to 6dp). */
  def mixSources(docs: DataFrame, weights: Map[String, Double], budgetTokens: Long,
                 sourceCol: String = "source", textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"mix weights must be positive: $weights")
    val wsum = weights.values.sum
    val wmap = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (s, w) => Seq(lit(s), lit(w / wsum)) }: _*)
    val rates = docs
      .select(col(sourceCol), TextAnalysis.tokenCount(col(textCol)).as("__nt"))
      .groupBy(col(sourceCol)).agg(sum(col("__nt")).as("__ns"))
      .withColumn("__w", element_at(wmap, col(sourceCol)))
      .where(col("__w").isNotNull)
      .select(col(sourceCol),
        least(lit(1.0), lit(budgetTokens.toDouble) * col("__w") / col("__ns"))
          .as("__rate"))
    docs.join(broadcast(rates), sourceCol)
      .where(hashPoint(col(idCol)) < col("__rate"))
      .select(col(idCol), col(sourceCol), round(col("__rate"), 6).as("rate"))
  }

  /** Training-mix assembly WITH upsampling: like [[mixSources]] but a
    * source whose weighted token share exceeds its corpus size repeats —
    * every doc appears floor(rate) times and the fractional remainder is
    * an md5-decided extra copy, so a rate of 2.3 means "2 epochs plus a
    * deterministic 30% third epoch" (the Wikipedia-×-N convention real
    * mixes use; mixSources' cap at 1 only ever downsamples). Output has
    * one row per (doc, epoch); epochs number from 1 so downstream
    * sequence packing can key on (idCol, epoch). The epoch expansion is a
    * map-side sequence explode — the corpus never shuffles. */
  def mixSourcesEpochs(docs: DataFrame, weights: Map[String, Double], budgetTokens: Long,
                       maxEpochs: Int = 16, sourceCol: String = "source",
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"mix weights must be positive: $weights")
    val wsum = weights.values.sum
    val wmap = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (s, w) => Seq(lit(s), lit(w / wsum)) }: _*)
    val rates = docs
      .select(col(sourceCol), TextAnalysis.tokenCount(col(textCol)).as("__nt"))
      .groupBy(col(sourceCol)).agg(sum(col("__nt")).as("__ns"))
      .withColumn("__w", element_at(wmap, col(sourceCol)))
      .where(col("__w").isNotNull)
      .select(col(sourceCol),
        least(lit(maxEpochs.toDouble),
          lit(budgetTokens.toDouble) * col("__w") / col("__ns")).as("__rate"))
    val whole = floor(col("__rate")).cast("int")
    val frac = col("__rate") - floor(col("__rate"))
    docs.join(broadcast(rates), sourceCol)
      .withColumn("__n", whole + when(hashPoint(col(idCol)) < frac, 1).otherwise(0))
      .where(col("__n") > 0)
      .select(col(idCol), col(sourceCol), round(col("__rate"), 6).as("rate"),
        explode(sequence(lit(1), col("__n"))).as("epoch"))
  }

  /** DCLM/FineWeb-style quality-stratified sampling: bin rows into
    * `keepRates.length` quantile strata of `scoreCol` (ascending — bin 1
    * holds the best/lowest scores for an NLL-style signal) and keep each
    * stratum at its own md5-deterministic rate. The usual ntile() build
    * of this is a GLOBAL sort through one partition; here the stratum
    * boundaries come from a deterministic bounded sample
    * (orderBy(id).limit — distributed top-k, same contract as the
    * IVF/PQ fits) whose k-1 threshold keys embed as literals, so binning
    * AND the keep decision are pure map-side expressions over the
    * corpus. Ties split by id so the binning is a total order.
    * Score contract: pass an ENGINE-STABLE score (e.g. crossLogLoss's
    * rounded mean_nll) — thresholds are compared exactly.
    * Output: input columns + (bin, keep_rate, keep). */
  def stratifiedSampleByScore(scored: DataFrame, scoreCol: String,
                              keepRates: Seq[Double], fitSampleRows: Int = 65536,
                              idCol: String = "doc_id"): DataFrame = {
    val k = keepRates.length
    require(k >= 1 && keepRates.forall(r => r >= 0 && r <= 1),
      s"keep rates must be in [0,1]: $keepRates")
    val sample = scored.select(col(scoreCol), col(idCol))
      .orderBy(col(idCol)).limit(fitSampleRows)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sorted
    require(sample.length >= k,
      s"need at least $k scored rows to place ${k - 1} thresholds, got ${sample.length}")
    // threshold j = the floor(j*m/k)-th smallest (score, id) of the sample
    val thr = (1 until k).map(j => sample((j.toLong * sample.length / k).toInt))
    val bin = thr.foldLeft(lit(1)) { case (acc, (ts, ti)) =>
      acc + when(col(scoreCol) > ts ||
                 (col(scoreCol) === ts && col(idCol) >= ti), 1).otherwise(0)
    }
    scored.withColumn("bin", bin)
      .withColumn("keep_rate", element_at(lit(keepRates.toArray), col("bin")))
      .withColumn("keep", hashPoint(col(idCol)) < col("keep_rate"))
  }

  /** Hashed-feature bucket for a gram: the md5 hash point scaled to
    * `nBuckets` (same determinism contract as [[hashPoint]]). */
  def featureBucket(gram: Column, nBuckets: Int): Column =
    floor(hashPoint(gram) * nBuckets).cast("int")

  /** Per-doc hashed n-gram features: unigrams plus space-joined bigrams
    * (the DSIR feature space — Xie et al. 2023 §3.1). Bigrams come from a
    * zip of shifted slices, NOT `element_at(toks, i)` inside the lambda —
    * a lambda that references the un-staged token EXPRESSION re-derives
    * the whole tokenize chain per array element, turning the projection
    * O(len²) per doc (measured 10 s vs 0.3 s at sf0.1; same pitfall
    * bigramLogLoss documents). */
  def hashedGrams(text: Column): Column = {
    val toks = filter(TextAnalysis.tokens(lower(text)), t => length(t) > 0)
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = transform(
      arrays_zip(slice(toks, lit(1), n1).as("a"), slice(toks, lit(2), n1).as("b")),
      p => concat(p.getField("a"), lit(" "), p.getField("b")))
    concat(toks, bigrams)
  }

  /** DSIR data selection (Xie et al., NeurIPS 2023: "Data Selection for
    * Language Models via Importance Resampling"): rank raw-corpus docs by
    * their importance weight under hashed-n-gram bucket unigram models of
    * a TARGET domain vs the raw corpus, and keep the top `keep`:
    *
    *   log w(x) = sum over features f of [ln p_target(b(f)) - ln p_raw(b(f))]
    *
    * with add-1-smoothed bucket probabilities over `nBuckets` buckets.
    * (The paper resamples with Gumbel noise to avoid near-duplicate bias;
    * the engine's contract is the deterministic top-k by weight, the same
    * determinism trade the other md5-keyed Sampling operators make.)
    *
    * Engine-stability: the per-bucket log-ratios are rounded ONCE (on the
    * driver) to integer micro-nats, so the per-doc score is an exact
    * integer sum — order-independent and bit-identical across engines
    * (the q117 lesson: never hash-compare a float accumulated in
    * engine-specific order).
    *
    * Scale shape: both bucket-count tables are fixed-width (<= nBuckets
    * rows) aggregates; the log-ratio table comes back as ONE array
    * literal, so scoring is a pure map-side expression over the raw
    * corpus — zero shuffle — and selection is one distributed top-k.
    * Output: (idCol, n_feats, logw_micro, keep). */
  def dsirSelect(raw: DataFrame, target: DataFrame, keep: Int,
                 nBuckets: Int = 1024, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(keep >= 1 && nBuckets >= 2, s"bad keep=$keep / nBuckets=$nBuckets")
    // Per-doc feature-BUCKET arrays, derived once and checkpointed: the
    // raw corpus otherwise pays the tokenize + per-gram md5 twice — once
    // for its bucket histogram and once inside the scoring fold (the md5
    // hash point is the dominant per-row cost at corpus scale). Buckets
    // are ints, so the checkpoint holds (id, ARRAY<INT>) — smaller than
    // the gram strings it replaces in the old scored derivation.
    val rawBuckets = raw.select(col(idCol),
        transform(hashedGrams(col(textCol)),
          g => featureBucket(g, nBuckets)).as("__bs"))
      .localCheckpoint(false)
    def bucketCounts(df: DataFrame): Array[Long] = {
      val rows = df
        .select(explode(hashedGrams(col(textCol))).as("__g"))
        .select(featureBucket(col("__g"), nBuckets).as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__n"))
        .collect()
      val arr = Array.fill(nBuckets)(0L)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr
    }
    def bucketCountsFromArrays(buckets: DataFrame): Array[Long] = {
      val rows = buckets.select(explode(col("__bs")).as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__n"))
        .collect()
      val arr = Array.fill(nBuckets)(0L)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr
    }
    val tc = bucketCounts(target)
    val rc = bucketCountsFromArrays(rawBuckets)
    val tn = tc.sum.toDouble + nBuckets
    val rn = rc.sum.toDouble + nBuckets
    // integer micro-nat log-ratio per bucket, rounded exactly once
    val ratio = Array.tabulate(nBuckets) { b =>
      math.round((math.log((tc(b) + 1) / tn) - math.log((rc(b) + 1) / rn)) * 1e6)
    }
    // scoring is a pure array-literal lookup over the staged buckets —
    // no md5 re-run; still checkpointed (three narrow columns) so the
    // threshold pass and the final projection share one fold
    val scored = rawBuckets
      .select(col(idCol), size(col("__bs")).as("n_feats"),
        aggregate(col("__bs"), lit(0L),
          (acc, b) => acc + element_at(lit(ratio), b + 1))
          .as("logw_micro"))
      .localCheckpoint(false)
    // global top-k WITHOUT a global sort: (negated-weight, id) struct
    // ordering makes limit(keep) a distributed TakeOrdered; the k-th key
    // broadcasts back as the keep threshold
    def key(df: DataFrame) =
      struct((-col("logw_micro")).as("nw"), col(idCol).as("i"))
    val thr = scored.select(key(scored).as("__s"))
      .orderBy(col("__s")).limit(keep)
      .agg(max(col("__s")).as("__thr"))
    scored.crossJoin(broadcast(thr))
      .withColumn("keep", key(scored) <= col("__thr"))
      .drop("__thr")
  }
}
