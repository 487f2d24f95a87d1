package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: tokenization, quality scoring, language ID,
  * fingerprinting. All pure Catalyst expressions (codegen'd, no UDFs) so
  * they stream through a 100 TB scan with zero shuffle.
  */
object TextAnalysis {

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "for", "on", "with")

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Regex "BPE-ish" tokens: letter runs, digit runs, single punctuation. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Stopword fraction of whitespace tokens. */
  def stopwordRatio(text: Column): Column = {
    val sw = Stopwords.map(s => s"'$s'").mkString(", ")
    size(filter(tokens(text), t => t.isin(Stopwords: _*))) /
      size(tokens(text)).cast("double")
  }

  /** Simple quality score: mean word length + stopword signal - punct noise.
    * Deterministic, SQL-expressible (mirrored in the DuckDB oracle). */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    val meanWordLen = length(regexp_replace(trim(text), "\\s+", "")) / nTok
    val punct = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val punctRatio = punct / length(text).cast("double")
    meanWordLen + stopwordRatio(text) * lit(2.0) - punctRatio * lit(5.0)
  }

  /** n-gram-heuristic language ID: score membership of tokens against
    * per-language stopword lists; emit best language or "und". The
    * container has no real langid model — the heuristic is the real
    * operator (reference-class engines embed similar frequency tables). */
  def langId(text: Column): Column = {
    val enHits = size(filter(tokens(lower(text)), t => t.isin(Stopwords: _*)))
    when(enHits >= 1, lit("en")).otherwise(lit("und"))
  }

  /** Per-language stopword marker sets for [[langIdMulti]] (CLD/fastText's
    * coarse first tier is exactly high-frequency function words; no
    * accents so the ASCII tokenizer applies uniformly). Code-ascending
    * order is load-bearing: the argmax keeps the EARLIEST code on ties. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "mit", "von", "den", "dem", "sich", "auch"),
    "en" -> Stopwords,
    "es" -> Seq("el", "los", "las", "es", "una", "del", "por", "con",
      "para", "como", "pero", "mas", "este", "esta", "ser"),
    "fr" -> Seq("le", "les", "et", "est", "pas", "une", "des", "dans",
      "pour", "qui", "sur", "ne", "ce", "vous", "nous"))

  /** Multi-language ID: argmax of per-language stopword hit counts,
    * "und" when nothing matches; ties keep the lexicographically first
    * code (deterministic, mirrored in the oracle's >= chain). One more
    * tier than [[langId]]'s en/und gate — langId stays as the curation
    * pipelines' pinned semantics. Pure zero-shuffle expressions. */
  def langIdMulti(text: Column): Column = {
    val toks = tokens(lower(text))
    val hits = LangStopwords.map { case (code, sw) =>
      code -> size(filter(toks, t => t.isin(sw: _*)))
    }
    hits.foldLeft((lit(0), lit("und"))) {
      case ((bh, bc), (code, h)) =>
        (when(h > bh, h).otherwise(bh), when(h > bh, lit(code)).otherwise(bc))
    }._2
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, collapsed
    * whitespace) — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Corpus vocabulary: the top `vocabSize` regex tokens by document
    * frequency-weighted count with a minimum-count floor — the seed
    * vocabulary a tokenizer-training run starts from (WordPiece/BPE both
    * begin with exactly this corpus-wide count table). Ties break on the
    * token string ascending so the vocabulary is deterministic.
    *
    * Scale shape: tokens shuffle once for the count (partial aggregation
    * map-side — the wide explode never crosses the network un-combined),
    * then a distributed top-k (orderBy+limit plans as
    * TakeOrderedAndProject: per-partition heaps, no global sort).
    * Output: (token, n) with rank implied by (n desc, token asc). */
  def buildVocab(docs: DataFrame, vocabSize: Int, minCount: Long = 2L,
                 textCol: String = "text"): DataFrame =
    docs.select(explode(regexTokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("token").asc)
      .limit(vocabSize)

  /** Winnowing fingerprints (rolling-hash document sketch): hash every
    * k-shingle, slide a window of `w` consecutive hashes, keep each
    * window's minimum, dedupe. Two documents sharing content share
    * fingerprints regardless of position — the classic local fingerprint
    * for plagiarism/near-dup detection.
    *
    * NOTE: compose via winnowingStage (materialized projections) — inlining
    * the token split inside the nested lambdas makes Catalyst re-evaluate
    * the split per array element (quadratic per document). */
  def winnowingFingerprints(text: Column, k: Int = 4, w: Int = 5): Column =
    fingerprintsFromGrams(gramsFromTokens(tokens(lower(text)), k), w)

  def gramsFromTokens(toks: Column, k: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k)))))

  def fingerprintsFromGrams(grams: Column, w: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(grams) - w, lit(0))),
      i => array_min(slice(grams, i + 1, lit(w)))))

  /** Overlapping fixed-size token chunks — the retrieval/embedding
    * chunking operator (every RAG pipeline's first step). Chunk i covers
    * tokens [i*(size-overlap), i*(size-overlap)+size); the last chunk may
    * be short; docs shorter than `size` yield one chunk. Pure map-side
    * expressions over staged tokens — zero shuffle, the corpus streams.
    * Output: (idCol, chunk_idx, chunk_text, n_tokens). */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64, overlapTokens: Int = 16,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(overlapTokens < chunkTokens, "overlap must be smaller than the chunk size")
    val step = chunkTokens - overlapTokens
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    // number of chunks: 1 + floor(max(len - size, 0) / step), then one
    // more if a tail remains past the last full window
    val len = size(col("__toks"))
    val nChunks = (greatest(len - overlapTokens - 1, lit(0)) / step).cast("int") + 1
    base.select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("__toks"), i * step + 1, lit(chunkTokens)))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).as("n_tokens"))
  }

  /** RAG-index hygiene: chunks whose normalized text appears more than
    * once corpus-wide (chunk-granular exact dedup — retrieval indexes
    * dedupe at the CHUNK level, not the document level, or near-copies
    * crowd every top-k). One row per duplicated fingerprint with the
    * canonical (lowest doc, lowest idx) occurrence to keep.
    *
    * Scale shape: one md5-fingerprint groupBy (fixed-width keys — chunk
    * text never shuffles); the canonical pick is a min(struct) inside
    * the same aggregation, no window. Output: (fp, n_dups, n_docs,
    * keep_doc_id, keep_chunk_idx). */
  def chunkDedupReport(docs: DataFrame, chunkTokens: Int = 64, overlapTokens: Int = 16,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    chunkDocuments(docs, chunkTokens, overlapTokens, textCol, idCol)
      .select(md5(lower(col("chunk_text"))).as("fp"), col(idCol), col("chunk_idx"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_dups"),
        countDistinct(col(idCol)).as("n_docs"),
        min(struct(col(idCol), col("chunk_idx"))).as("__keep"))
      .where(col("n_dups") > 1)
      .select(col("fp"), col("n_dups"), col("n_docs"),
        col(s"__keep.$idCol").as("keep_doc_id"),
        col("__keep.chunk_idx").as("keep_chunk_idx"))

  /** PII detection/redaction patterns. Restricted to the RE2-compatible
    * regex subset (no lookaround, no backrefs) so the DuckDB oracle can
    * apply the IDENTICAL pattern strings — and so the operator stays
    * portable to RE2-based scan engines. \b is the ASCII word boundary,
    * supported by both Java regex and RE2. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe: String = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** Count of PII matches of one pattern in the original text. */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Text with emails, IPv4 addresses, and phone numbers replaced by
    * typed placeholder tokens. Replacement order (email -> ip -> phone) is
    * fixed and mirrored in the oracle; counts are taken on the ORIGINAL
    * text so earlier replacements cannot mask later counts. Pure
    * codegen'd expressions — zero shuffle over a corpus scan. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
