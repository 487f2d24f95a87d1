package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.TsTables
import graft.pipeline._

/** Training-data-pipeline operator coverage over `documents` and
  * `embeddings`: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding cosine), similarity search (brute force + LSH), and text
  * analysis. DuckDB oracles where the operator is SQL-expressible with
  * bit-identical hashes (md5) or pure arithmetic; hash-sketch operators
  * (xxhash64-based MinHash/SimHash/LSH) get rows-only checks + ScalaTest
  * specs instead.
  */
object PipelineQueries {

  private val SW = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** q127 training-mix recipe — single source of truth for BOTH engines
    * (the oracle SQL embeds these as literals). Budget sized so src0 is
    * rate-capped at 1.0 at sf0.01 while the rest downsample. */
  private val MixWeights = Seq("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0)
  private val MixBudget = 3000L

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q60_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(TsTables.documents(s, dir))
        .filter(col("n_dups") > 1)
        .orderBy(col("fp"))),

    "q61_token_count" -> ((s, dir) =>
      TsTables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        size(TextAnalysis.regexTokens(col("text"))).as("n_regex_tokens"))
        .orderBy(col("doc_id"))),

    "q62_quality_score" -> ((s, dir) =>
      TsTables.documents(s, dir).select(
        col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
        .orderBy(col("doc_id"))),

    "q63_langid" -> ((s, dir) =>
      TsTables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy(col("doc_id"))),

    "q64_ngram_jaccard" -> ((s, dir) => {
      // prefix-filtered exact all-pairs join (Dedup.jaccardPairs): same
      // result set as the blocked pair join it replaced, candidates from
      // an inverted index over rare-first token prefixes only
      val d = TsTables.documents(s, dir).select(
        col("doc_id"), col("lang"), (col("n_chars") / 50).cast("long").as("len_bucket"),
        array_distinct(TextAnalysis.tokens(lower(col("text")))).as("toks"))
      Dedup.jaccardPairs(d, 0.8, blockCols = Seq("lang", "len_bucket"))
        .orderBy(col("id1"), col("id2"))
    }),

    "q65_knn_bruteforce" -> ((s, dir) => {
      val e = TsTables.embeddings(s, dir)
      Similarity.bruteForceKnn(e.filter(col("vec_id") < 10), e, 5)
        .orderBy(col("query_id"), col("rk"))
    }),

    // q66-q69, q76, q77: golden-fixture gate — xxhash/KMeans sketches are
    // not reproducible in DuckDB SQL, so these run the REAL operators over
    // PipelineFixtures' planted corpora and compare against the exact
    // expected pair/neighbor sets (inline VALUES oracles). The same
    // operators run on the full documents/embeddings corpus on the bench
    // path (benchDefs) every round.
    "q66_minhash_dups" -> ((s, _) =>
      Dedup.minHashDuplicates(PipelineFixtures.docs(s), numHashes = 16, threshold = 0.5)
        .orderBy(col("id1"), col("id2"))),

    "q67_simhash" -> ((s, _) =>
      Dedup.simHashDuplicates(PipelineFixtures.docs(s), prefixBits = 8, maxDist = 12)
        .orderBy(col("id1"), col("id2"))),

    "q68_knn_lsh" -> ((s, _) => {
      val e = PipelineFixtures.embs(s)
      Similarity.lshKnn(e.filter(col("vec_id") < 3), e, 5, nPlanes = 4)
        .orderBy(col("query_id"), col("rk"))
    }),

    "q69_cosine_dups" -> ((s, _) =>
      Similarity.cosineDuplicates(PipelineFixtures.embs(s), threshold = 0.8, nPlanes = 4)
        .orderBy(col("id1"), col("id2"))),

    "q74_multimodal_decode" -> ((s, dir) =>
      Multimodal.decodeFeatures(Multimodal.synthesizeMedia(TsTables.documents(s, dir)))
        .select(col("doc_id"), col("kind"), col("n_bytes"), col("sig"))
        .orderBy(col("doc_id"))),

    "q76_ivf_knn" -> ((s, _) => {
      val e = PipelineFixtures.embs(s)
      Similarity.ivfKnn(e.filter(col("vec_id") < 3), e, 5, nCentroids = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rk"))
    }),

    "q77_winnowing_candidates" -> ((s, _) =>
      winnowingCandidates(PipelineFixtures.docs(s))),

    "q75_frame_sampling" -> ((s, dir) => // rows-only (byte-slice stub)
      Multimodal.sampleFrames(Multimodal.synthesizeMedia(TsTables.documents(s, dir)), everyN = 7)
        .select(col("doc_id"), col("frame_idx"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    "q99_connected_components" -> ((s, _) =>
      Components.connectedComponents(PipelineFixtures.edges(s))
        .orderBy(col("id"))),

    // INCREMENTAL components under the oracle gate: fold a batch of new
    // edges (component merge + new nodes + redundant intra-component
    // edge) into the q99 assignment; DuckDB recomputes the closure over
    // the COMBINED edge set — the fold must equal the full recompute
    "q164_incremental_components" -> ((s, _) =>
      Components.incrementalComponents(
          // the fold consumes the assignment three times (two endpoint
          // lookups + the relabel); a real caller folds into a STORED
          // assignment, so materialize the q99 recompute once instead of
          // re-running its labeling stage per consumer
          Components.connectedComponents(PipelineFixtures.edges(s))
            .localCheckpoint(false),
          PipelineFixtures.newEdges(s))
        .orderBy(col("id"))),

    "q100_gopher_signals" -> ((s, dir) =>
      Quality.gopherSignals(TsTables.documents(s, dir))
        .orderBy(col("doc_id"))),

    "q101_hash_split" -> ((s, dir) =>
      TsTables.documents(s, dir).select(
        col("doc_id"),
        Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .as("split"))
        .orderBy(col("doc_id"))),

    "q102_pack_shards" -> ((s, dir) =>
      Sampling.packIntoShards(
        TsTables.documents(s, dir)
          .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens")),
        budgetTokens = 2000L, nBuckets = 8)
        .orderBy(col("doc_id"))),

    "q103_semantic_dedup" -> ((s, _) =>
      Similarity.semanticDedup(PipelineFixtures.embs(s), threshold = 0.95, nClusters = 3)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))),

    // the full dedup pipeline composed end-to-end: candidate pairs from
    // MinHash LSH -> exact Jaccard verify -> connected components ->
    // one representative per duplicate CLUSTER (survives chains a~b~c)
    "q104_dedup_pipeline" -> ((s, _) => {
      val docs = PipelineFixtures.docs(s)
      val pairs = Dedup.minHashDuplicates(docs, numHashes = 16, threshold = 0.5)
      Components.keepRepresentatives(docs, pairs)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // ---- round 5: decontamination / span dedup / PII / domain mixing ----

    // benchmark set = every 10th doc (a deterministic held-out slice);
    // flag the rest of the corpus for verbatim 8-gram overlap with it
    "q107_decontam_ngrams" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      Decontam.flagContaminated(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0).withColumnRenamed("doc_id", "bench_id"),
        n = 8)
        .orderBy(col("doc_id"))
    }),

    // the Bloom-prefiltered two-phase decontam: exact-result contract
    // (Bloom has no false negatives; false positives die in the confirm
    // join), so the oracle is the same exact mirror as q107 — the gate
    // proves the scale path changes NOTHING about the answer
    "q167_decontam_bloom" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      Decontam.flagContaminatedBloom(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0).withColumnRenamed("doc_id", "bench_id"),
        n = 8)
        .orderBy(col("doc_id"))
    }),

    // semantic decontamination: embedding cosine vs a benchmark set —
    // the leak n-grams miss. The benchmark = a FIXED-SIZE id slice
    // (vec_id % 10 == 0, vec_id < 500 — eval sets don't grow with the
    // corpus, and an unbounded split would make this the one suite entry
    // with a quadratic cost curve) PLUS verbatim copies of corpus
    // vectors 1 and 11 under 1e6+ ids (planted contamination: cosine
    // exactly 1.0 with their originals), so the 0.8 gate provably fires
    // on real pairs at every sf
    "q168_semantic_decontam" -> ((s, dir) => {
      val e = TsTables.embeddings(s, dir)
      val bench = e.where(col("vec_id") % 10 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("bench_id"), col("embedding"))
        .unionByName(e.where(col("vec_id").isin(1L, 11L))
          .select((col("vec_id") + 1000000L).as("bench_id"), col("embedding")))
      Decontam.semanticContamination(
        e.where(col("vec_id") % 10 =!= 0), bench, threshold = 0.8)
        .orderBy(col("vec_id"), col("bench_id"))
    }),

    "q108_dup_span_removal" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(TsTables.documents(s, dir), w = 8)
        .orderBy(col("doc_id"))),

    // arbitrary-length ExactSubstr spans (Lee et al.): maximal merged
    // duplicated passages — a duplicate longer than w reports as ONE
    // (start, len) span, not w-window fragments
    "q155_dup_span_report" -> ((s, dir) =>
      Dedup.duplicateSpanReport(TsTables.documents(s, dir), w = 8)
        .orderBy(col("doc_id"), col("span_start"))),

    "q109_pii_redaction" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(PipelineFixtures.piiDocs(s))
      docs.select(col("doc_id"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.EmailRe).as("n_emails"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.Ipv4Re).as("n_ipv4"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.PhoneRe).as("n_phones"),
        TextAnalysis.piiRedact(col("text")).as("redacted_text"))
        .orderBy(col("doc_id"))
    }),

    "q110_temperature_sample" -> ((s, dir) =>
      Sampling.temperatureSample(TsTables.documents(s, dir), alpha = 0.5, targetRows = 200)
        .orderBy(col("doc_id"))),

    // PQ-ADC approximate kNN on the planted fixture (seeded sub-space
    // KMeans + single-partition fixture = bit-stable output; expected rows
    // pinned as the inline oracle, like the other sketch operators)
    "q112_pq_knn" -> ((s, _) => {
      val e = PipelineFixtures.embs(s)
      Similarity.pqKnn(e.filter(col("vec_id") < 3), e, k = 5, m = 4, ksub = 4)
        .orderBy(col("query_id"), col("rk"))
    }),

    // incremental-ingest dedup: corpus = first 250 docs; the "new batch"
    // is the rest plus three replayed (re-id'd) corpus docs, which must be
    // dropped by fingerprint while genuinely-new docs survive
    "q113_incremental_dedup" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = docs.where(col("doc_id") < 250)
      val replayed = corpus.where(col("doc_id") < 3)
        .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
      val batch = docs.where(col("doc_id") >= 250).unionByName(replayed)
      Dedup.dropAgainstCorpus(batch, corpus)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q114_c4_signals" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(PipelineFixtures.c4Docs(s))
      Quality.c4Signals(docs).orderBy(col("doc_id"))
    }),

    "q115_unigram_logloss" -> ((s, dir) =>
      Quality.unigramLogLoss(TsTables.documents(s, dir)).orderBy(col("doc_id"))),

    // bigram-LM self-perplexity (CCNet signal one order up from q115):
    // add-k-smoothed transition NLL, corpus as its own LM
    "q124_bigram_logloss" -> ((s, dir) =>
      Quality.bigramLogLoss(TsTables.documents(s, dir)).orderBy(col("doc_id"))),

    "q116_chunking" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(TsTables.documents(s, dir),
        chunkTokens = 32, overlapTokens = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // the whole curation pass end to end: Gopher quality gate -> language
    // filter -> duplicate-span removal over the SURVIVORS -> deterministic
    // split. Every stage is the already-verified operator; the composition
    // is what a real corpus run executes as one job.
    "q118_curation_pipeline" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      // text rides THROUGH the gopher gate (r17): the join of gate back
      // to docs on doc_id was a corpus-scale shuffle join plus a third
      // corpus scan for a column the gate's rebuild pass already held;
      // row set identical (inner join inside gopherSignals)
      val kept = Quality.gopherSignals(docs, passThrough = Seq("text"))
        .where(col("gopher_pass") && TextAnalysis.langId(col("text")) === "en")
        .select(col("doc_id"), col("text"))
      Dedup.removeDuplicateSpans(kept, w = 8)
        .select(col("doc_id"), col("clean_text"),
          Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.1)).as("split"))
        .orderBy(col("doc_id"))
    }),

    // the curation dashboard: per-source corpus health report composing
    // token counting, language ID, Gopher verdicts and dedup pressure in
    // ONE pass shape (each signal is a zero-shuffle expression; the only
    // aggregation is the final per-source rollup)
    "q117_corpus_report" -> ((s, dir) => {
      // the dashboard expressions ride THROUGH the gopher pass (r17):
      // evaluated once on its rebuild scan (pruned from the gram-count
      // subtree), replacing a corpus-scale doc_id shuffle join plus a
      // third corpus scan; row set identical (inner join inside
      // gopherSignals)
      val docs = TsTables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.langId(col("text")).as("lang"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
      Quality.gopherSignals(docs,
          passThrough = Seq("source", "n_tokens", "lang", "fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
          sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("n_gopher_pass"),
          countDistinct(col("fp")).as("n_unique_fps"))
        .withColumn("mean_tokens", expr(meanStrSql("total_tokens", "n_docs", "div")))
        .orderBy(col("source"))
    }),

    // per-source document cap (CommonCrawl-style host-domination guard):
    // kept set selected by hash point inside each group, deterministic
    // across engines/topologies and unbiased vs arrival order
    "q120_cap_per_group" -> ((s, dir) =>
      Sampling.capPerGroup(TsTables.documents(s, dir), maxPerGroup = 20)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // corpus seed vocabulary: top regex tokens by corpus-wide count with a
    // min-count floor — the count table a WordPiece/BPE train starts from
    "q121_build_vocab" -> ((s, dir) =>
      TextAnalysis.buildVocab(TsTables.documents(s, dir), vocabSize = 200, minCount = 2)),

    // exact media dedup by content digest per modality: the binary never
    // shuffles, only (doc_id, kind, digest)
    "q128_media_dedup" -> ((s, dir) =>
      Multimodal.exactDupGroups(
        Multimodal.synthesizeMedia(TsTables.documents(s, dir)))
        .orderBy(col("kind"), col("sig"))),

    // training-mix assembly: explicit source weights + token budget ->
    // per-source keep rates, md5-deterministic keeps (The Pile recipe
    // step; src0 capped at rate 1.0 at sf0.01, others downsampled)
    "q127_mix_sources" -> ((s, dir) =>
      Sampling.mixSources(TsTables.documents(s, dir), MixWeights.toMap, MixBudget)
        .orderBy(col("doc_id"))),

    // BPE tokenizer training on the planted corpus (golden-fixture gate
    // like the sketch operators: the iterative merge learning is not
    // DuckDB-expressible; PipelineSpec proves the distributed trainer
    // equals a brute-force reference on a different corpus)
    "q122_bpe_merges" -> ((s, _) => {
      import s.implicits._
      Bpe.train(PipelineFixtures.docs(s), nMerges = 10)
        .toDF("rank", "left", "right", "cnt").orderBy(col("rank"))
    }),

    // BPE application with a literal merge list — full DuckDB mirror (the
    // greedy fold == left-to-right string replace, so both engines run
    // the same algorithm)
    "q123_bpe_encode" -> ((s, dir) =>
      TsTables.documents(s, dir).select(col("doc_id"),
        element_at(TextAnalysis.tokens(lower(col("text"))), 1).as("word"))
        .select(col("doc_id"), col("word"),
          concat_ws(" ", Bpe.encodeWord(col("word"), Bpe.DemoMerges)).as("subwords"))
        .orderBy(col("doc_id"))),

    // CCNet corpus-level line dedup (planted multi-line pages atop the
    // single-line corpus): boilerplate lines survive exactly once —
    // canonical (doc, pos)-least occurrence keeps its copy
    "q131_line_dedup" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(PipelineFixtures.lineDocs(s))
      Dedup.removeDuplicateLines(docs).orderBy(col("doc_id"))
    }),

    // BM25 keyword search: fixed query terms, stats-broadcast scoring,
    // distributed top-k; ordering uses the rounded score in both engines
    "q132_bm25_search" -> ((s, dir) =>
      Search.bm25TopK(TsTables.documents(s, dir), Bm25Terms, k = 25, k1 = Bm25K1, b = Bm25B)
        .orderBy(col("score").desc, col("doc_id"))),

    // per-source Jensen–Shannon drift vs the rest of the corpus
    "q133_source_divergence" -> ((s, dir) =>
      Quality.sourceDivergence(TsTables.documents(s, dir)).orderBy(col("source"))),

    // batch BM25 through the inverted index (the standing-service shape):
    // a query TABLE ranked in one corpus pass; q2's term matches nothing
    "q143_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val qs = Bm25BatchQueries.map { case (id, ts) => (id, ts) }
        .toDF("query_id", "terms")
      Search.bm25TopKBatch(TsTables.documents(s, dir), qs, k = 10,
        k1 = Bm25K1, b = Bm25B)
        .orderBy(col("query_id"), col("rk"))
    }),

    // hybrid retrieval: RRF fusion of batch BM25 and dense cosine ranks,
    // integer micro-unit contributions (exact cross-engine sums)
    "q156_hybrid_search" -> ((s, dir) => {
      import s.implicits._
      val docs = TsTables.documents(s, dir)
        .join(TsTables.embeddings(s, dir).withColumnRenamed("vec_id", "doc_id"),
          "doc_id")
      val qs = Bm25BatchQueries.take(2).toDF("query_id", "terms")
        .join(TsTables.embeddings(s, dir).filter(col("vec_id") < 2)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
          "query_id")
      Search.hybridTopK(docs, qs, k = 10, depth = HybridDepth, rrfK = HybridRrfK,
        k1 = Bm25K1, b = Bm25B)
        .orderBy(col("query_id"), col("rk"))
    }),

    // the STANDING perceptual index probe under the oracle gate: corpus =
    // doc_id < 400 indexed as a bucketed managed table, batch = the rest
    // probed against it (the spec-only path until now)
    "q160_perceptual_index_probe" -> ((s, dir) => {
      import graft.pipeline.{CorpusLayout, Multimodal}
      // corpus = docs below 400 + one planted original; batch = the rest
      // + its two planted near-dup variants (guaranteed cross-split hits)
      val all = TsTables.documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(PipelineFixtures.phashDocs(s))
      val inCorpus = col("doc_id") < 400 ||
        col("doc_id").isin(1300002L, 1300011L)
      // a PREVIOUS session's table directory survives the (in-memory)
      // catalog — drop the entry and delete the orphaned location, or
      // the create fails with locationAlreadyExists
      s.sql("DROP TABLE IF EXISTS q160_pdx_phash")
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "q160_pdx_phash")
      wh.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wh, true)
      CorpusLayout.writePerceptualIndex(
        Multimodal.synthesizeMedia(all.filter(inCorpus)),
        "q160_pdx", nBuckets = 8, prefixBits = 8)
      CorpusLayout.perceptualDupsAgainstIndex(
          s, Multimodal.synthesizeMedia(all.filter(!inCorpus)), "q160_pdx",
          maxDist = 16, prefixBits = 8)
        .orderBy(col("doc_id"), col("corpus_id"))
    }),

    // directional containment (Broder coefficient over winnowing
    // sketches): the planted verbatim-embedded doc scores exactly 1.0
    "q162_containment" -> ((s, _) =>
      Dedup.containmentPairs(PipelineFixtures.containDocs(s), threshold = 0.8)
        .orderBy(col("contained_id"), col("container_id"))),

    // shuffle-key skew pre-flight: heaviest user_ids by event count with
    // exact integer micro shares — run before keying anything on user_id
    "q161_key_skew" -> ((s, dir) =>
      Quality.keySkewReport(TsTables.events(s, dir), "user_id", k = 15)),

    // hybrid retrieval with a compressed-index ANN dense leg through the
    // pluggable fusion surface: BM25 ranks over documents, SQ8 ranks over
    // embeddings (two independent retrievers — no corpus intersection
    // required), RRF-fused as pre-ranked frames. The scale shape the
    // brute-force hybridTopK cannot take; full DuckDB mirror (SQ8 is
    // order-pinned IEEE arithmetic, q145 contract)
    "q163_hybrid_ann" -> ((s, dir) => {
      import s.implicits._
      val qs = Bm25BatchQueries.take(2).toDF("query_id", "terms")
      val sparse = Search.bm25TopKBatch(TsTables.documents(s, dir), qs,
          k = HybridDepth, k1 = Bm25K1, b = Bm25B)
        .select(col("query_id"), col("doc_id"), col("rk"))
      val e = TsTables.embeddings(s, dir)
      val dense = Similarity.sq8Knn(e.filter(col("vec_id") < 2), e,
          k = HybridDepth, overfetch = 4)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk"))
      Search.rrfFuse(sparse, dense, k = 10, rrfK = HybridRrfK)
        .orderBy(col("query_id"), col("rk"))
    }),

    // REAL pixel decode under the oracle gate: deterministically rendered
    // PNG / JPEG-re-encode / 2px-crop of one picture (three byte-distinct
    // payloads) must pair perceptually; the inverted picture must not —
    // the case exact digest dedup structurally cannot catch (dist omitted:
    // its exact value tracks the JDK's JPEG quantization tables)
    "q166_perceptual_real_images" -> ((s, _) =>
      Multimodal.perceptualDuplicates(PipelineFixtures.imageMedia(s),
          maxDist = 6, prefixBits = 12)
        .select(col("kind"), col("id1"), col("id2"))
        .orderBy(col("id1"), col("id2"))),

    // the STANDING-SERVICE WRITE PATH under the oracle gate: a
    // deterministic multi-batch sequence replays through processDocBatch
    // (the foreachBatch body of the streaming near-dedup ingest — batch
    // API, the exact code a stream executes), including a MARKER-PROTECTED
    // replay of a completed batch; the final sink AND standing index are
    // both checked. Golden by construction (q66 contract: xxhash MinHash
    // is not DuckDB-expressible): identical texts near-match at est 1.0,
    // distinct texts never reach 0.5
    "q170_doc_ingest_sink" -> ((s, _) => {
      import s.implicits._
      val table = "q170_ndx"
      for (t <- Seq(s"${table}_bands", s"${table}_sigs")) {
        s.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        wh.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wh, true)
      }
      val sink = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "q170_sink").toString
      new org.apache.hadoop.fs.Path(sink).getFileSystem(
        s.sparkContext.hadoopConfiguration).delete(
          new org.apache.hadoop.fs.Path(sink), true)
      val A = "alpha document about bucketed managed tables and their exchange free probe joins"
      val C = "charlie text concerning histogram quantile interpolation across le bucket arrays"
      val D = "delta prose describing watermark driven state eviction for streaming aggregations"
      val E = "echo report on salting skewed shuffle keys before corpus scale band joins"
      def run(batch: Seq[(Long, String)], id: Long): Unit =
        graft.streaming.Ingest.processDocBatch(batch.toDF("doc_id", "text"),
          id, table, sink, nBuckets = 4, threshold = 0.5)
      run(Seq((0L, A), (1L, A), (2L, C)), 0L)       // in-batch dup: 1 drops
      run(Seq((10L, A), (11L, D), (12L, D)), 1L)    // 10 vs index, 12 in-batch
      run(Seq((10L, A), (11L, D), (12L, D)), 1L)    // marker-protected replay: no-op
      run(Seq((20L, D), (21L, E)), 2L)              // 20 vs standing index
      s.read.parquet(sink).select(lit("sink").as("part"), col("doc_id"))
        .unionByName(s.table(s"${table}_sigs")
          .select(lit("index").as("part"), col("doc_id")).distinct())
        .orderBy(col("part"), col("doc_id"))
    }),

    // REAL PCM decode under the oracle gate (the audio twin of q166):
    // one recording as WAV / 2x-resampled WAV / AIFF re-container (three
    // byte-distinct payloads) must pair via the energy-envelope hash; the
    // time-reversed envelope must not (dist omitted: resample boundary
    // arithmetic owns its exact value, the PAIR SET is the contract)
    "q169_perceptual_real_audio" -> ((s, _) =>
      Multimodal.perceptualDuplicates(PipelineFixtures.audioMedia(s),
          maxDist = 6, prefixBits = 12)
        .select(col("kind"), col("id1"), col("id2"))
        .orderBy(col("id1"), col("id2"))),

    // REAL multi-frame decode under the oracle gate (the video twin of
    // q166/q169): one animated-GIF clip as base / frame-rate-doubled +
    // 2x-upscaled / palette-shifted re-encodes (three byte-distinct
    // payloads) must pair via the temporal luminance-envelope hash; the
    // frame-reversed clip must not
    "q171_perceptual_real_video" -> ((s, _) =>
      Multimodal.perceptualDuplicates(PipelineFixtures.videoMedia(s),
          maxDist = 6, prefixBits = 12)
        .select(col("kind"), col("id1"), col("id2"))
        .orderBy(col("id1"), col("id2"))),

    // tokenizer fertility report: tokens-per-word and chars-per-token per
    // source under the Demo BPE table — the standard tokenizer-eval
    // signals, exact integer-mean strings (the q117 convention)
    "q158_tokenizer_fertility" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      docs.select(col("source"),
          size(filter(graft.pipeline.TextAnalysis.tokens(lower(col("text"))),
            w => length(w) > 0)).cast("long").as("__w"),
          length(regexp_replace(trim(col("text")), "\\s+", "")).cast("long").as("__c"),
          (size(graft.pipeline.Bpe.encodeDoc(col("text"),
            graft.pipeline.Bpe.DemoMerges)) - 1).cast("long").as("__t"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("total_words"),
          sum(col("__c")).as("total_chars"), sum(col("__t")).as("total_tokens"))
        .withColumn("fertility", expr(meanStrSql("total_tokens", "total_words", "div")))
        .withColumn("chars_per_token", expr(meanStrSql("total_chars", "total_tokens", "div")))
        .orderBy(col("source"))
    }),

    // embedding-column health validation: dim drift, NaNs, zero vectors,
    // mean norm — the data-contract check before any ANN/dedup consumes
    // the column (norm mean = per-row micro rounding, exact integer sum)
    "q159_embedding_health" -> ((s, dir) => {
      val e = TsTables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      e.select(size(col("v")).as("__dim"),
          exists(col("v"), x => isnan(x)).as("__nan"),
          aggregate(col("v"), lit(0.0), (a, x) => a + x * x).as("__sq"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("__dim") =!= EmbeddingDim, 1L).otherwise(0L)).as("n_dim_mismatch"),
          sum(when(col("__nan"), 1L).otherwise(0L)).as("n_nan"),
          sum(when(!col("__nan") && col("__sq") === 0.0, 1L).otherwise(0L)).as("n_zero"),
          sum(when(!col("__nan"), round(sqrt(col("__sq")) * 1e6).cast("long"))
            .otherwise(0L)).as("norm_micro_sum"))
        .withColumn("norm_mean", expr(meanStrSql("norm_micro_sum", "n_vecs * 1000000", "div")))
    }),

    // retrieval eval harness: recall@k + reciprocal rank of the batch
    // BM25 ranking against the q151 positives as relevance judgments
    "q157_retrieval_eval" -> ((s, dir) => {
      import s.implicits._
      val qs = HardNegQueries.map(q => (q._1, q._2)).toDF("query_id", "terms")
      val truth = HardNegQueries.map(q => (q._1, q._3)).toDF("query_id", "doc_id")
      val ranked = Search.bm25TopKBatch(TsTables.documents(s, dir), qs, k = 10,
        k1 = Bm25K1, b = Bm25B)
      Search.retrievalEval(ranked, truth, k = 10).orderBy(col("query_id"))
    }),

    // DPR-style hard-negative mining: top BM25 non-positives per
    // (query, positive) pair, through the batch postings index
    "q151_hard_negatives" -> ((s, dir) => {
      import s.implicits._
      val qs = HardNegQueries.toDF("query_id", "terms", "positive_doc_id")
      Search.hardNegatives(TsTables.documents(s, dir), qs, nNeg = HardNegN,
        k1 = Bm25K1, b = Bm25B)
        .orderBy(col("query_id"), col("neg_rk"))
    }),

    // epoch-mix: upsampling sources whose weighted share exceeds their
    // size (floor(rate) epochs + md5-decided fractional extra)
    "q142_mix_epochs" -> ((s, dir) =>
      Sampling.mixSourcesEpochs(TsTables.documents(s, dir),
        EpochWeights.toMap, EpochBudget)
        .orderBy(col("doc_id"), col("epoch"))),

    // curation v2: Gopher gate + language filter + reference-LM
    // perplexity threshold (on the ROUNDED oracle-checked nll, so the
    // cut is engine-stable), then tokenize-and-pack — raw corpus to
    // training sequences in one job
    "q139_curation_v2" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      // text rides THROUGH the gopher gate (r17, as q118): one corpus
      // scan and one doc_id shuffle join eliminated; the nll join stays
      // (crossLogLoss aggregates per doc — not a per-row expression)
      val gate = Quality.gopherSignals(docs, passThrough = Seq("text"))
      val nll = Quality.crossLogLoss(docs, docs.where(col("source") === "src0"))
        .select(col("doc_id"), col("mean_nll"))
      val kept = gate.join(nll, "doc_id")
        .where(col("gopher_pass") && TextAnalysis.langId(col("text")) === "en" &&
               col("mean_nll") < 3.43)
        .select(col("doc_id"), col("text"))
      Bpe.packSequences(kept, Bpe.DemoMerges, seqLen = 32, nBuckets = 4)
        .orderBy(col("bucket"), col("seq_idx"))
    }),

    // media perceptual near-dup: dHash over the stubbed pixel source,
    // banded Hamming join per modality — FULL cross-engine mirror (the
    // hash is pure arithmetic over payload bytes in both engines)
    "q138_perceptual_dups" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(PipelineFixtures.phashDocs(s))
      Multimodal.perceptualDuplicates(Multimodal.synthesizeMedia(docs),
        maxDist = 16, prefixBits = 8)
        .orderBy(col("kind"), col("id1"), col("id2"))
    }),

    // the pretraining data-prep step end to end: BPE-encode every doc,
    // concatenate subword streams per md5 bucket, cut 32-token sequences
    // crossing doc boundaries (GPT packing)
    "q137_tokenize_pack" -> ((s, dir) =>
      Bpe.packSequences(TsTables.documents(s, dir), Bpe.DemoMerges,
        seqLen = 32, nBuckets = 8)
        .orderBy(col("bucket"), col("seq_idx"))),

    // CCNet reference-LM scoring: src0 is the "trusted domain"; every doc
    // is scored under ITS unigram LM (OOV pays the max Laplace penalty)
    "q135_cross_logloss" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      Quality.crossLogLoss(docs, docs.where(col("source") === "src0"))
        .orderBy(col("doc_id"))
    }),

    // IVF-PQ (residual-encoded inverted lists + ADC) on the planted
    // fixture — seeded KMeans + single-partition fixture = bit-stable;
    // expected top-k pinned inline like q112
    "q134_ivfpq_knn" -> ((s, _) => {
      val e = PipelineFixtures.embs(s)
      Similarity.ivfPqKnn(e.filter(col("vec_id") < 3), e, k = 5,
        nCentroids = 3, nprobe = 2, m = 4, ksub = 4)
        .orderBy(col("query_id"), col("rk"))
    }),

    // DSIR importance selection: src0 is the target domain, the whole
    // corpus is raw; integer micro-nat weights (full DuckDB mirror of the
    // hashed-bucket LMs, the log-ratio table and the top-k threshold)
    "q144_dsir_select" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      Sampling.dsirSelect(docs, docs.where(col("source") === "src0"),
        keep = DsirKeep, nBuckets = DsirBuckets)
        .orderBy(col("doc_id"))
    }),

    // SQ8 scalar-quantized ANN with exact rerank — full DuckDB mirror
    // (linear quantization and both cosines are order-pinned IEEE
    // arithmetic; candidate sets are provably identical cross-engine)
    "q145_sq8_knn" -> ((s, dir) => {
      val e = TsTables.embeddings(s, dir)
      Similarity.sq8Knn(e.filter(col("vec_id") < 10), e, k = 5, overfetch = 4)
        .orderBy(col("query_id"), col("rk"))
    }),

    // contamination-safe split: md5 split labels, then train docs sharing
    // an 8-gram with any eval-split doc are relabeled 'quarantined'
    "q146_safe_split" -> ((s, dir) =>
      Decontam.contaminationSafeSplit(TsTables.documents(s, dir),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), n = 8)
        .orderBy(col("doc_id"))),

    // chunk-level exact dedup for RAG indexes: duplicated 32-token
    // chunks (q116's chunker) with their canonical keep occurrence
    "q153_chunk_dedup" -> ((s, dir) =>
      TextAnalysis.chunkDedupReport(TsTables.documents(s, dir),
        chunkTokens = 32, overlapTokens = 8)
        .orderBy(col("fp"))),

    // multi-language ID: per-language stopword argmax over the corpus +
    // planted de/fr/es/tie rows; zero-shuffle expressions, full mirror
    "q149_langid_multi" -> ((s, dir) => {
      import s.implicits._
      val planted = LangPlanted.toDF("doc_id", "text")
      TsTables.documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(planted)
        .select(col("doc_id"), TextAnalysis.langIdMulti(col("text")).as("lang"))
        .orderBy(col("doc_id"))
    }),

    // curation v3: contamination-safe split -> DSIR selection on the
    // train survivors -> tokenize-and-pack; raw corpus to decontaminated,
    // domain-targeted training sequences in one composed job
    "q150_curation_v3" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      val lab = Decontam.contaminationSafeSplit(docs,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), n = 8)
      // checkpoint the survivors: dsirSelect fires three actions on its
      // input and packSequences a fourth — each would re-derive the
      // split's 8-gram quarantine self-join from scratch otherwise
      val train = docs.join(
          lab.where(col("split") === "train").select(col("doc_id")), "doc_id")
        .localCheckpoint(false)
      val sel = Sampling.dsirSelect(train, train.where(col("source") === "src0"),
        keep = V3Keep, nBuckets = DsirBuckets)
      val kept = train
        .join(sel.where(col("keep")).select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("text"))
      Bpe.packSequences(kept, Bpe.DemoMerges, seqLen = 32, nBuckets = 4)
        .orderBy(col("bucket"), col("seq_idx"))
    }),

    // perplexity-stratified sampling (DCLM/FineWeb shape): reference-LM
    // NLL quantile strata from sampled thresholds, per-stratum md5 keeps
    "q147_perplexity_strata" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      val nll = Quality.crossLogLoss(docs, docs.where(col("source") === "src0"))
        .select(col("doc_id"), col("mean_nll"))
      Sampling.stratifiedSampleByScore(nll, "mean_nll", StrataRates)
        .orderBy(col("doc_id"))
    })
  )

  /** q147 per-stratum keep rates (bin 1 = lowest NLL = cleanest). */
  private val StrataRates = Seq(1.0, 0.7, 0.45, 0.2, 0.05)

  /** q149 planted non-English rows (single source for query + oracle;
    * ids far above any corpus doc_id). The last two pin the tie rules:
    * en outscoring fr, and a de/en tie keeping the earliest code. */
  private val LangPlanted: Seq[(Long, String)] = Seq(
    (2000000L, "der hund ist nicht mit der katze und auch nicht allein"),
    (2000001L, "le chat est dans la maison et vous ne savez pas"),
    (2000002L, "el perro es una mascota para este lugar pero no"),
    (2000003L, "completely wordless gibberish zzz qqq"),
    (2000004L, "des une est the and of in to"),
    (2000005L, "und der the a xyz"))

  /** q144 DSIR constants, shared with the oracle SQL. */
  private val DsirKeep = 120
  private val DsirBuckets = 256

  /** q150 DSIR keep over the ~400-doc decontaminated train split. */
  private val V3Keep = 180

  /** q142 epoch-mix recipe: src0's weighted share is ~4× its corpus size
    * (multi-epoch), src1 hovers near 1, src2 downsamples. */
  private val EpochWeights = Seq("src0" -> 8.0, "src1" -> 2.0, "src2" -> 1.0)
  private val EpochBudget = 6000L

  /** q132 search query + BM25 constants — single source of truth for both
    * engines (SQL literals are emitted from these via Double.toString, so
    * e.g. k1+1 is the SAME double in both, not a re-parsed "2.2"). */
  private val Bm25Terms = Seq("spark", "vector", "customer")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** q143 batch query set (query 2's term matches nothing). */
  private val Bm25BatchQueries: Seq[(Long, Seq[String])] = Seq(
    (0L, Seq("spark", "vector")), (1L, Seq("customer", "window")),
    (2L, Seq("zebra")))

  /** q156 hybrid retrieval: the first two batch queries fuse with dense
    * ranks whose query vectors are embeddings 0/1. */
  private val HybridDepth = 60
  private val HybridRrfK = 60

  /** q159: the embeddings table's contract dimension. */
  private val EmbeddingDim = 64

  /** q151 (query, positive) pairs: positives chosen so both cases occur
    * at sf0.01 — a positive inside BM25's top ranks (exclusion fires)
    * and one far outside (pure truncation). */
  private val HardNegQueries: Seq[(Long, Seq[String], Long)] = Seq(
    (0L, Seq("spark", "vector"), 3L),
    (1L, Seq("customer", "window"), 490L),
    (2L, Seq("table", "query"), 7L))
  private val HardNegN = 8

  /** Winnowing candidate pairs: long shingles (k=8) keep fingerprints
    * selective; the rarity cap bounds bucket fan-out so the self-join
    * stays linear in corpus size. Expensive expressions are staged as
    * separate projections — nesting them inside transform lambdas makes
    * Catalyst re-evaluate per array element. */
  private def winnowingCandidates(docs: DataFrame): DataFrame = {
    val fps = docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.gramsFromTokens(col("toks"), 8).as("grams"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("lang"),
        explode(TextAnalysis.fingerprintsFromGrams(col("grams"), 6)).as("fp"))
      // (doc_id, lang, fp) is narrow and its re-derivation includes the
      // tokenize + gram + winnow fingerprint pass — three consumers read
      // it (the rarity count and both self-join sides); r17 rule: YES
      .localCheckpoint(false)
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 8)).select("fp")
    val candidates = fps.join(rare, "fp")
    val a = candidates.as("a"); val b = candidates.as("b")
    a.join(b, col("a.fp") === col("b.fp") && col("a.lang") === col("b.lang") &&
              col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("shared_fps"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Real-corpus runs of the sketch operators — timed by Bench each round
    * so their shuffle/scale shape stays measured even though correctness
    * is gated on the planted fixtures above. */
  def benchDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // corpus-scale hybrid retrieval: 3 fused queries over the full
    // documents+embeddings join — tracks the retrieval stack's cost
    "corpus_hybrid_search" -> ((s, dir) => {
      import s.implicits._
      val docs = TsTables.documents(s, dir)
        .join(TsTables.embeddings(s, dir).withColumnRenamed("vec_id", "doc_id"), "doc_id")
      val qs = Seq((0L, Seq("spark", "vector")), (1L, Seq("customer", "window")),
          (2L, Seq("table", "query"))).toDF("query_id", "terms")
        .join(TsTables.embeddings(s, dir).filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec")), "query_id")
      Search.hybridTopK(docs, qs, k = 10)
    }),
    "corpus_minhash_dups" -> ((s, dir) =>
      Dedup.minHashDuplicates(TsTables.documents(s, dir), numHashes = 16, threshold = 0.5)),
    "corpus_simhash" -> ((s, dir) =>
      Dedup.simHashDuplicates(TsTables.documents(s, dir), prefixBits = 8, maxDist = 12)),
    "corpus_knn_lsh" -> ((s, dir) => {
      val e = TsTables.embeddings(s, dir)
      Similarity.lshKnn(e.filter(col("vec_id") < 10), e, 5, nPlanes = 4)
    }),
    "corpus_cosine_dups" -> ((s, dir) =>
      Similarity.cosineDuplicates(TsTables.embeddings(s, dir), threshold = 0.8, nPlanes = 10)),
    "corpus_ivf_knn" -> ((s, dir) => {
      val e = TsTables.embeddings(s, dir)
      Similarity.ivfKnn(e.filter(col("vec_id") < 10), e, 5, nCentroids = 16, nprobe = 4)
    }),
    "corpus_winnowing" -> ((s, dir) =>
      winnowingCandidates(TsTables.documents(s, dir))),
    "corpus_dedup_pipeline" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      Components.keepRepresentatives(docs,
        Dedup.minHashDuplicates(docs, numHashes = 16, threshold = 0.5))
    }),
    "corpus_span_dedup" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(TsTables.documents(s, dir), w = 8)),
    "corpus_pq_knn" -> ((s, dir) => {
      val e = TsTables.embeddings(s, dir)
      Similarity.pqKnn(e.filter(col("vec_id") < 10), e, k = 5, m = 4, ksub = 16)
    }),
    "corpus_decontam" -> ((s, dir) => {
      val docs = TsTables.documents(s, dir)
      Decontam.flagContaminated(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0).withColumnRenamed("doc_id", "bench_id"),
        n = 8)
    }),
    "corpus_bpe_train" -> ((s, dir) => {
      import s.implicits._
      Bpe.train(TsTables.documents(s, dir), nMerges = 5)
        .toDF("rank", "left", "right", "cnt")
    }),
    "corpus_ivfpq_knn" -> ((s, dir) => {
      val e = TsTables.embeddings(s, dir)
      Similarity.ivfPqKnn(e.filter(col("vec_id") < 10), e, k = 5,
        nCentroids = 16, nprobe = 4, m = 4, ksub = 16)
    }),
    "corpus_tokenize_learned" -> ((s, dir) => {
      // end-to-end with a LEARNED merge table (not DemoMerges): train on
      // the corpus, then native-encode + pack — the shape the codegen'd
      // bpe_encode_doc kernel exists for (cost independent of table size)
      val docs = TsTables.documents(s, dir)
      val merges = Bpe.train(docs, nMerges = 32).map(m => (m._2, m._3))
      Bpe.packSequences(docs, merges, seqLen = 128, nBuckets = 8)
    }),
    "corpus_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      // 60 two-term queries over the corpus vocabulary — the query-table
      // fan-in the inverted-index shape exists for
      val words = Seq("spark", "table", "query", "vector", "stream", "batch",
        "window", "merge", "filter", "group", "order", "scan")
      val qs = (for { (a, i) <- words.zipWithIndex; b <- words.drop(i + 1).take(5) }
        yield (a, b)).zipWithIndex
        .map { case ((a, b), i) => (i.toLong, Seq(a, b)) }
        .toDF("query_id", "terms")
      Search.bm25TopKBatch(TsTables.documents(s, dir), qs, k = 10)
    })
  )

  def oracles: Map[String, String] = Map(

    "q60_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                count(*) AS n_dups, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""",

    "q61_token_count" ->
      """SELECT doc_id,
                len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_regex_tokens
         FROM documents ORDER BY doc_id""",

    "q62_quality_score" ->
      s"""SELECT doc_id,
          round(
            length(regexp_replace(trim(text), '\\s+', '', 'g'))
              / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
            + (len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x IN ($SW)))
               / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)) * 2.0
            - (len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))
               / CAST(length(text) AS DOUBLE)) * 5.0, 6) AS quality
          FROM documents ORDER BY doc_id""",

    "q63_langid" ->
      s"""SELECT doc_id, ${langIdSql("text")} AS pred_lang
          FROM documents ORDER BY doc_id""",

    "q64_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, lang, n_chars // 50 AS len_bucket,
                           list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS toks
                    FROM documents)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
                round(len(list_intersect(a.toks, b.toks))
                      / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6) AS jaccard
         FROM d a JOIN d b
           ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
         WHERE len(list_intersect(a.toks, b.toks))
               / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE) >= 0.8
         ORDER BY 1,2""",

    "q74_multimodal_decode" ->
      """SELECT doc_id,
                CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
                md5(text) AS sig
         FROM documents ORDER BY doc_id""",

    "q75_frame_sampling" ->
      """SELECT doc_id,
                unnest(generate_series(0, (length(text) % 100 + 1) - 1, 7)) AS frame_idx
         FROM documents WHERE doc_id % 3 = 2 ORDER BY 1, 2""",

    // golden-fixture oracles: expected pair/neighbor sets on the planted
    // corpora, frozen from verified runs (see PipelineFixtures)
    "q66_minhash_dups" ->
      """SELECT id1, id2, CAST(j AS DOUBLE) AS jaccard FROM (VALUES
         (0, 1, 0.894737), (0, 2, 1.0), (1, 2, 0.894737), (3, 4, 0.777778)
         ) t(id1, id2, j) ORDER BY 1, 2""",

    "q67_simhash" ->
      """SELECT * FROM (VALUES
         (0, 1, 7), (0, 2, 0), (1, 2, 7)
         ) t(id1, id2, dist) ORDER BY 1, 2""",

    "q68_knn_lsh" ->
      """SELECT query_id, neighbor_id, rk, CAST(s AS DOUBLE) AS sim FROM (VALUES
         (0, 15, 1, 1.0), (0, 9, 2, 0.996624), (0, 6, 3, 0.995936), (0, 21, 4, 0.995936),
         (0, 3, 5, 0.993877), (1, 16, 1, 1.0), (1, 13, 2, 0.994812), (1, 7, 3, 0.994412),
         (1, 22, 4, 0.994412), (1, 12, 5, 0.115331), (2, 17, 1, 1.0), (2, 11, 2, 0.996963),
         (2, 5, 3, 0.995145), (2, 20, 4, 0.995145), (2, 8, 5, 0.994525)
         ) t(query_id, neighbor_id, rk, s) ORDER BY 1, 3""",

    "q69_cosine_dups" ->
      """SELECT id1, id2, CAST(s AS DOUBLE) AS sim FROM (VALUES
         (0, 3, 0.993877), (0, 6, 0.995936), (0, 9, 0.996624), (0, 12, 0.993006),
         (0, 15, 1.0), (0, 18, 0.993877), (0, 21, 0.995936), (1, 7, 0.994412),
         (1, 13, 0.994812), (1, 16, 1.0), (1, 22, 0.994412), (2, 5, 0.995145),
         (2, 8, 0.994525), (2, 11, 0.996963), (2, 14, 0.992351), (2, 17, 1.0),
         (2, 20, 0.995145), (2, 23, 0.994525), (3, 6, 0.993538), (3, 9, 0.996871),
         (3, 12, 0.994798), (3, 15, 0.993877), (3, 18, 1.0), (3, 21, 0.993538),
         (4, 10, 0.996992), (4, 19, 1.0), (5, 8, 0.994743), (5, 11, 0.997105),
         (5, 14, 0.995892), (5, 17, 0.995145), (5, 20, 1.0), (5, 23, 0.994743),
         (6, 9, 0.995369), (6, 12, 0.994984), (6, 15, 0.995936), (6, 18, 0.993538),
         (6, 21, 1.0), (7, 13, 0.995916), (7, 16, 0.994412), (7, 22, 1.0),
         (8, 11, 0.994067), (8, 14, 0.994419), (8, 17, 0.994525), (8, 20, 0.994743),
         (8, 23, 1.0), (9, 12, 0.994163), (9, 15, 0.996624), (9, 18, 0.996871),
         (9, 21, 0.995369), (10, 19, 0.996992), (11, 14, 0.993604), (11, 17, 0.996963),
         (11, 20, 0.997105), (11, 23, 0.994067), (12, 15, 0.993006), (12, 18, 0.994798),
         (12, 21, 0.994984), (13, 16, 0.994812), (13, 22, 0.995916), (14, 17, 0.992351),
         (14, 20, 0.995892), (14, 23, 0.994419), (15, 18, 0.993877), (15, 21, 0.995936),
         (16, 22, 0.994412), (17, 20, 0.995145), (17, 23, 0.994525), (18, 21, 0.993538),
         (20, 23, 0.994743)
         ) t(id1, id2, s) ORDER BY 1, 2""",

    "q76_ivf_knn" ->
      """SELECT query_id, neighbor_id, rk, CAST(s AS DOUBLE) AS sim FROM (VALUES
         (0, 15, 1, 1.0), (0, 9, 2, 0.996624), (0, 6, 3, 0.995936), (0, 21, 4, 0.995936),
         (0, 3, 5, 0.993877), (1, 16, 1, 1.0), (1, 10, 2, 0.996839), (1, 4, 3, 0.994979),
         (1, 19, 4, 0.994979), (1, 13, 5, 0.994812), (2, 17, 1, 1.0), (2, 11, 2, 0.996963),
         (2, 5, 3, 0.995145), (2, 20, 4, 0.995145), (2, 8, 5, 0.994525)
         ) t(query_id, neighbor_id, rk, s) ORDER BY 1, 3""",

    "q77_winnowing_candidates" ->
      """SELECT * FROM (VALUES
         (0, 1, 2), (0, 2, 2), (1, 2, 2), (3, 4, 3), (10, 11, 3)
         ) t(id1, id2, shared_fps) ORDER BY 1, 2""",

    // transitive closure on the planted edge fixture: DuckDB computes the
    // exact min-reachable-id per node with a recursive CTE — a true
    // multi-hop value check of the large-star/small-star implementation
    "q99_connected_components" ->
      s"""WITH RECURSIVE sym AS (
            SELECT id1 AS u, id2 AS v FROM ${PipelineFixtures.edgeValuesSql}
            UNION
            SELECT id2, id1 FROM ${PipelineFixtures.edgeValuesSql}),
          reach(u, r) AS (
            SELECT DISTINCT u, u FROM sym
            UNION
            SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.u)
          SELECT u AS id, min(r) AS component FROM reach GROUP BY u ORDER BY id""",

    // transitive closure over base ∪ batch edges: the incremental fold
    // must land exactly on the full recompute's min-reachable-id labels
    "q164_incremental_components" ->
      s"""WITH RECURSIVE alledges AS (
            SELECT id1, id2 FROM ${PipelineFixtures.edgeValuesSql}
            UNION ALL
            SELECT id1, id2 FROM ${PipelineFixtures.newEdgeValuesSql}),
          sym AS (
            SELECT id1 AS u, id2 AS v FROM alledges
            UNION
            SELECT id2, id1 FROM alledges),
          reach(u, r) AS (
            SELECT DISTINCT u, u FROM sym
            UNION
            SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.u)
          SELECT u AS id, min(r) AS component FROM reach GROUP BY u ORDER BY id""",

    "q100_gopher_signals" -> GopherSql,

    "q117_corpus_report" ->
      s"""WITH gopher AS ($GopherSql),
              d AS (SELECT doc_id, source,
                           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                           ${langIdSql("text")} AS lang,
                           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
                    FROM documents),
              agg AS (SELECT d.source, count(*) AS n_docs,
                             CAST(sum(d.n_tokens) AS BIGINT) AS total_tokens,
                             CAST(sum(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                             CAST(sum(CASE WHEN g.gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
                             count(distinct d.fp) AS n_unique_fps
                      FROM d JOIN gopher g USING (doc_id)
                      GROUP BY d.source)
         SELECT source, n_docs, total_tokens,
                ${meanStrSql("total_tokens", "n_docs", "//")} AS mean_tokens,
                n_en, n_gopher_pass, n_unique_fps
         FROM agg ORDER BY source""",

    "q118_curation_pipeline" ->
      s"""WITH gopher AS ($GopherSql),
              curated AS (SELECT d.doc_id, d.text
                          FROM documents d JOIN gopher g USING (doc_id)
                          WHERE g.gopher_pass AND ${langIdSql("d.text")} = 'en'),
              ${spanRemovalCtes("curated")}
         SELECT doc_id, clean_text,
                CASE WHEN ${hashPointSql("doc_id")} < 0.9
                     THEN 'train' ELSE 'val' END AS split
         FROM span_cleaned ORDER BY doc_id""",

    "q120_cap_per_group" ->
      s"""WITH r AS (SELECT doc_id, source,
                            row_number() OVER (PARTITION BY source
                              ORDER BY ${hashPointSql("doc_id")} ASC, doc_id ASC) AS rk
                     FROM documents)
         SELECT doc_id, source FROM r WHERE rk <= 20 ORDER BY doc_id""",

    "q121_build_vocab" ->
      """WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS token
                       FROM documents)
         SELECT token, count(*) AS n FROM toks
         GROUP BY token HAVING count(*) >= 2
         ORDER BY n DESC, token ASC LIMIT 200""",

    // md5(text) over VARCHAR hashes its UTF-8 bytes — identical to the
    // Spark side's md5(encode(text,'UTF-8')); modality mirrors the
    // synthesizeMedia round-robin
    "q128_media_dedup" ->
      """WITH m AS (SELECT doc_id,
                           (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
                           md5(text) AS sig
                    FROM documents)
         SELECT kind, sig, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM m GROUP BY kind, sig ORDER BY kind, sig""",

    // weights/budget literals generated from the SAME Scala values as the
    // Spark side, so the recipe cannot drift between engines
    "q127_mix_sources" -> {
      val wsum = MixWeights.map(_._2).sum
      // CAST to DOUBLE: DuckDB parses long decimal literals as DECIMAL,
      // whose arithmetic overflows (non-dyadic weights render 17 digits)
      // and diverges from Spark's double math at rate boundaries
      val vals = MixWeights.map { case (s, w) =>
        s"('$s', CAST(${w / wsum} AS DOUBLE))" }.mkString(", ")
      s"""WITH n AS (SELECT source, sum(len(string_split_regex(trim(text), '\\s+'))) AS ns
                     FROM documents GROUP BY 1),
              w AS (SELECT * FROM (VALUES $vals) AS t(source, wt)),
              r AS (SELECT n.source, least(1.0, CAST(${MixBudget.toDouble} AS DOUBLE) * wt / ns) AS rate
                    FROM n JOIN w USING (source))
         SELECT d.doc_id, d.source, round(rate, 6) AS rate
         FROM documents d JOIN r USING (source)
         WHERE ${hashPointSql("d.doc_id")} < rate
         ORDER BY d.doc_id""" },

    "q142_mix_epochs" -> {
      val wsum = EpochWeights.map(_._2).sum
      val vals = EpochWeights.map { case (s, w) =>
        s"('$s', CAST(${w / wsum} AS DOUBLE))" }.mkString(", ")
      s"""WITH n AS (SELECT source, sum(len(string_split_regex(trim(text), '\\s+'))) AS ns
                     FROM documents GROUP BY 1),
              w AS (SELECT * FROM (VALUES $vals) AS t(source, wt)),
              r AS (SELECT n.source,
                           least(16.0, CAST(${EpochBudget.toDouble} AS DOUBLE) * wt / ns) AS rate
                    FROM n JOIN w USING (source)),
              d AS (SELECT d.doc_id, d.source, rate,
                           CAST(floor(rate) AS INT) +
                             CASE WHEN ${hashPointSql("d.doc_id")} < rate - floor(rate)
                                  THEN 1 ELSE 0 END AS nrep
                    FROM documents d JOIN r USING (source))
         SELECT doc_id, source, round(rate, 6) AS rate, CAST(e AS INT) AS epoch
         FROM d, UNNEST(generate_series(1, nrep)) AS g(e)
         WHERE nrep > 0
         ORDER BY doc_id, epoch""" },

    // the greedy adjacent-pair fold == left-to-right literal string
    // replace on a sep-joined symbol string, so DuckDB runs the SAME
    // algorithm; the replace chain is generated from Bpe.DemoMerges so
    // the mirrors cannot drift
    "q123_bpe_encode" -> {
      val init = "array_to_string(regexp_extract_all(w, '.'), chr(1)) || chr(1) || '</w>'"
      val chain = graft.pipeline.Bpe.DemoMerges.foldLeft(init) { case (acc, (a, b)) =>
        s"replace($acc, '$a' || chr(1) || '$b', '${a + b}')"
      }
      s"""WITH w0 AS (SELECT doc_id,
                             string_split_regex(trim(lower(text)), '\\s+')[1] AS w
                      FROM documents)
         SELECT doc_id, w AS word,
                array_to_string(string_split($chain, chr(1)), ' ') AS subwords
         FROM w0 ORDER BY doc_id"""
    }
  ) ++ oraclesTail

  /** Exact half-up mean to 6 dp as a STRING via integer arithmetic only.
    * `round(avg(x), 6)` on doubles differed between Spark and DuckDB at the
    * last ULP near a .5 boundary (round-5 gate red on q117); integer
    * quotient/remainder math is bit-identical in both engines. `idiv` is
    * the engine's integer-divide spelling ("div" Spark, "//" DuckDB).
    * Overflow-safe at corpus scale: the *1e6 happens on the remainder
    * (< cnt), never on the full sum. */
  private def meanStrSql(tot: String, cnt: String, idiv: String): String = {
    val q = s"(($tot) $idiv ($cnt))"
    val frac = s"(((($tot) % ($cnt)) * 1000000 + ($cnt) $idiv 2) $idiv ($cnt))"
    s"""concat(cast($q + (case when $frac >= 1000000 then 1 else 0 end) as string),
               '.', lpad(cast(($frac) % 1000000 as string), 6, '0'))"""
  }

  /** langId / hash-point SQL mirrors of TextAnalysis.langId and
    * Sampling.hashPoint, shared by every oracle that uses them. */
  private def langIdSql(c: String): String =
    s"""CASE WHEN len(list_filter(string_split_regex(trim(lower($c)), '\\s+'),
                                  x -> x IN ($SW))) >= 1
             THEN 'en' ELSE 'und' END"""
  private def hashPointSql(c: String): String =
    s"('0x' || substr(md5($c::VARCHAR), 1, 4))::INT / 65536.0"

  /** The q108 duplicate-span-removal construction as reusable CTEs over an
    * arbitrary (doc_id, text) relation; exposes `span_cleaned(doc_id,
    * clean_text, removed_frac)`. Shared by q108 and the q118 pipeline so
    * the mirrors cannot drift. */
  private def spanRemovalCtes(src: String, minOccurrences: Int = 2): String =
    s"""span_base AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
                      FROM $src),
        span_wins AS (SELECT doc_id, i-1 AS pos, array_to_string(toks[i:i+7], ' ') AS gram
                      FROM span_base, UNNEST(generate_series(1, greatest(len(toks)-7, 0))) AS t(i)),
        span_marked AS (SELECT doc_id, pos,
                               row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk,
                               count(*) OVER (PARTITION BY gram) AS nocc
                        FROM span_wins),
        span_cov AS (SELECT DISTINCT doc_id, pos + d AS cp
                     FROM span_marked, UNNEST(generate_series(0, 7)) AS g(d)
                     WHERE nocc >= $minOccurrences AND rk > 1),
        span_toks AS (SELECT doc_id, i-1 AS pos, toks[i] AS tok
                      FROM span_base, UNNEST(generate_series(1, len(toks))) AS t(i)),
        span_kept AS (SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
                      FROM span_toks t LEFT JOIN span_cov c
                        ON t.doc_id = c.doc_id AND t.pos = c.cp
                      WHERE c.doc_id IS NULL GROUP BY t.doc_id),
        span_covstats AS (SELECT doc_id, count(*) AS ncov FROM span_cov GROUP BY doc_id),
        span_cleaned AS (SELECT b.doc_id, coalesce(k.clean_text, '') AS clean_text,
                                round(coalesce(c.ncov, 0) / CAST(len(b.toks) AS DOUBLE), 6) AS removed_frac
                         FROM span_base b LEFT JOIN span_kept k USING (doc_id)
                              LEFT JOIN span_covstats c USING (doc_id))"""

  /** The full q100 Gopher mirror, shared with q117's per-source rollup. */
  private lazy val GopherSql: String =
      s"""WITH base AS (
            SELECT doc_id, text,
                   string_split_regex(trim(text), '\\s+') AS toks,
                   string_split_regex(trim(lower(text)), '\\s+') AS ltoks,
                   string_split(text, chr(10)) AS lines,
                   length(regexp_replace(trim(text), '\\s+', '', 'g')) AS nsc
            FROM documents),
          signals AS (
            SELECT doc_id,
                   len(toks) AS word_count,
                   round(nsc / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
                   round(1.0 - len(list_distinct(ltoks)) / CAST(len(ltoks) AS DOUBLE), 6) AS dup_word_frac,
                   round(1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE), 6) AS dup_line_frac,
                   round(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
                   round(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) / CAST(len(toks) AS DOUBLE), 6) AS alpha_word_frac
            FROM base),
          g2 AS (
            SELECT doc_id, round(cnt * length(replace(gram, ' ', '')) / CAST(nsc AS DOUBLE), 6) AS top2_frac
            FROM (SELECT doc_id, nsc, gram, count(*) AS cnt,
                         row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, gram DESC) AS rk
                  FROM (SELECT doc_id, nsc,
                               unnest(list_transform(generate_series(1, greatest(len(ltoks) - 2, 0) + 1),
                                      i -> array_to_string(list_slice(ltoks, i, i + 1), ' '))) AS gram
                        FROM base)
                  GROUP BY doc_id, nsc, gram)
            WHERE rk = 1),
          g3 AS (
            SELECT doc_id, round(cnt * length(replace(gram, ' ', '')) / CAST(nsc AS DOUBLE), 6) AS top3_frac
            FROM (SELECT doc_id, nsc, gram, count(*) AS cnt,
                         row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, gram DESC) AS rk
                  FROM (SELECT doc_id, nsc,
                               unnest(list_transform(generate_series(1, greatest(len(ltoks) - 3, 0) + 1),
                                      i -> array_to_string(list_slice(ltoks, i, i + 2), ' '))) AS gram
                        FROM base)
                  GROUP BY doc_id, nsc, gram)
            WHERE rk = 1)
          SELECT s.*, g2.top2_frac, g3.top3_frac,
                 (s.word_count BETWEEN 50 AND 100000
                  AND s.mean_word_len BETWEEN 1.0 AND 10.0
                  AND s.symbol_ratio < 0.1
                  AND s.dup_line_frac < 0.3
                  AND s.alpha_word_frac > 0.8
                  AND g2.top2_frac < 0.20
                  AND g3.top3_frac < 0.18) AS gopher_pass
          FROM signals s JOIN g2 USING (doc_id) JOIN g3 USING (doc_id)
          ORDER BY doc_id"""

  private lazy val oraclesTail: Map[String, String] = Map(

    // the q116 chunk CTE + md5 fingerprint grouping; canonical keep is
    // the (doc, idx)-least occurrence in both engines
    "q153_chunk_dedup" ->
      """WITH base AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                       FROM documents),
              idx AS (SELECT doc_id, toks,
                             unnest(generate_series(0,
                               CAST(floor(greatest(len(toks) - 8 - 1, 0) / 24.0) AS INT))) AS i
                      FROM base),
              ch AS (SELECT doc_id, i AS chunk_idx,
                            md5(lower(array_to_string(toks[i*24+1 : i*24+32], ' '))) AS fp
                     FROM idx),
              agg AS (SELECT fp, count(*) AS n_dups, count(DISTINCT doc_id) AS n_docs,
                             min({'d': doc_id, 'c': chunk_idx}) AS keep
                      FROM ch GROUP BY fp HAVING count(*) > 1)
         SELECT fp, n_dups, n_docs, keep.d AS keep_doc_id,
                keep.c AS keep_chunk_idx
         FROM agg ORDER BY fp""",

    // per-language hit counts from the SAME stopword lists, argmax with
    // the >= chain = the fold's earliest-code-on-ties rule
    "q149_langid_multi" -> {
      def hits(code: String) = {
        val sw = graft.pipeline.TextAnalysis.LangStopwords.toMap
          .apply(code).map(s => s"'$s'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($sw)))"
      }
      val planted = LangPlanted
        .map { case (id, t) => s"($id, '${t.replace("'", "''")}')" }.mkString(", ")
      s"""WITH all_docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT * FROM (VALUES $planted) v(doc_id, text)),
          base AS (SELECT doc_id,
                          string_split_regex(trim(lower(text)), '\\s+') AS toks
                   FROM all_docs),
          h AS (SELECT doc_id, ${hits("de")} AS hde, ${hits("en")} AS hen,
                       ${hits("es")} AS hes, ${hits("fr")} AS hfr
                FROM base)
          SELECT doc_id,
                 CASE WHEN greatest(hde, hen, hes, hfr) < 1 THEN 'und'
                      WHEN hde >= hen AND hde >= hes AND hde >= hfr THEN 'de'
                      WHEN hen >= hes AND hen >= hfr THEN 'en'
                      WHEN hes >= hfr THEN 'es' ELSE 'fr' END AS lang
          FROM h ORDER BY doc_id"""
    },

    // safe-split + DSIR + tokenize-pack composed end to end; every stage
    // reuses the single-operator mirror helper, so the composition
    // cannot drift from q146/q144/q137
    "q150_curation_v3" ->
      s"""WITH ${safeSplitCtes("documents", "ss")},
              train AS (SELECT d.doc_id, d.source, d.text
                        FROM documents d JOIN ss_final USING (doc_id)
                        WHERE ss_final.split = 'train'),
              ${dsirCtes("train", V3Keep, DsirBuckets, "dz")},
              kept AS (SELECT t.doc_id, t.text FROM train t JOIN dz_keep USING (doc_id))
          ${packSelectSql("kept", 4)} ORDER BY bucket, seq_idx""",

    // shared crossLM mirror feeding the same sampled-threshold binning:
    // thresholds are the floor(j*m/5)-th smallest (rounded nll, doc_id)
    // keys, bins count thresholds <= the row's key, keeps are md5 points
    // against CAST-to-DOUBLE rate literals emitted from the Scala seq
    "q147_perplexity_strata" -> {
      def d(v: Double) = s"CAST(${v.toString} AS DOUBLE)"
      val rateCase = s"CASE bin ${StrataRates.zipWithIndex
        .map { case (r, i) => s"WHEN ${i + 1} THEN ${d(r)}" }.mkString(" ")} END"
      s"""WITH xl AS ($crossLmSql),
            nll AS (SELECT doc_id, mean_nll FROM xl),
            sample AS (SELECT doc_id, mean_nll FROM nll ORDER BY doc_id LIMIT 65536),
            ranked AS (SELECT mean_nll AS s, doc_id AS i,
                              row_number() OVER (ORDER BY mean_nll ASC, doc_id ASC) - 1 AS rn,
                              count(*) OVER () AS m
                       FROM sample),
            thr AS (SELECT s, i FROM ranked
                    WHERE rn IN ((1*m)//5, (2*m)//5, (3*m)//5, (4*m)//5)),
            binned AS (SELECT n.doc_id, n.mean_nll,
                              1 + (SELECT count(*) FROM thr t
                                   WHERE n.mean_nll > t.s
                                      OR (n.mean_nll = t.s AND n.doc_id >= t.i)) AS bin
                       FROM nll n)
          SELECT doc_id, mean_nll, CAST(bin AS INT) AS bin,
                 $rateCase AS keep_rate,
                 ${hashPointSql("doc_id")} < $rateCase AS keep
          FROM binned ORDER BY doc_id"""
    },

    // split labels + gram-overlap quarantine; the oracle joins gram
    // STRINGS where the operator joins xxhash64(gram) (the repo's
    // hash-first convention — q115 precedent)
    "q146_safe_split" ->
      s"""WITH ${safeSplitCtes("documents", "ss")}
          SELECT doc_id, split FROM ss_final ORDER BY doc_id""",

    // full mirror of the DSIR hashed-bucket LMs: same md5 bucket, add-1
    // smoothing, micro-nat integer rounding and top-k threshold
    "q144_dsir_select" ->
      s"""WITH ${dsirCtes("documents", DsirKeep, DsirBuckets, "dz")}
          SELECT doc_id, n_feats, logw_micro, rn <= $DsirKeep AS keep
          FROM dz_ranked ORDER BY doc_id""",

    // full mirror of SQ8: per-dim bounds, linear quantize/dequant in the
    // operator's exact op order, asymmetric candidate cosine, exact rerank
    // (CTEs shared with the q163 ANN-backed hybrid)
    "q145_sq8_knn" ->
      s"""WITH ${sq8Ctes("vec_id < 10", k = 5, overfetch = 4)}
          SELECT query_id, neighbor_id, rk, round(sim, 6) AS sim, round(asim, 6) AS asim
          FROM sq8_rk WHERE rk <= 5 ORDER BY query_id, rk""",

    // golden-fixture oracle (KMeans clustering is not DuckDB-reproducible):
    // the three planted direction clusters each keep their minimum id
    "q103_semantic_dedup" ->
      """SELECT * FROM (VALUES (0), (1), (2)) t(vec_id) ORDER BY 1""",

    // golden-fixture oracle: BPE merges learned on the planted corpus,
    // frozen from a verified run (PipelineSpec proves the distributed
    // trainer == brute-force reference; GoldenDump regenerates)
    "q122_bpe_merges" ->
      """SELECT * FROM (VALUES
         (0, 'a', '</w>', 36), (1, 'e', '</w>', 36), (2, 'n', '</w>', 34),
         (3, 'e', 'n</w>', 21), (4, 's', '</w>', 20), (5, 'i', 'n', 18),
         (6, 't', 'a</w>', 18), (7, 't', 'h', 17), (8, 'e', 'r', 14),
         (9, 'd', '</w>', 13)
         ) t(rank, "left", "right", cnt) ORDER BY rank""",

    // golden-fixture oracle: q66's verified pairs (0,1),(0,2),(1,2),(3,4)
    // collapse to clusters {0,1,2} and {3,4}; the representatives 0 and 3
    // survive along with every unpaired doc
    "q104_dedup_pipeline" ->
      """SELECT * FROM (VALUES (0), (3), (5), (6), (7), (8), (9), (10), (11))
         t(doc_id) ORDER BY 1""",

    "q101_hash_split" ->
      s"""SELECT doc_id,
                CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id, ${hashPointSql("doc_id")} AS u
               FROM documents)
         ORDER BY doc_id""",

    "q102_pack_shards" ->
      """WITH t AS (SELECT doc_id,
                           ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 8 AS bucket,
                           len(string_split_regex(trim(text), '\s+')) AS n_tokens
                    FROM documents)
         SELECT doc_id, bucket,
                CAST(floor((sum(n_tokens) OVER w - n_tokens) / 2000.0) AS BIGINT) AS shard,
                n_tokens
         FROM t
         WINDOW w AS (PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY doc_id""",

    "q65_knn_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
              c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
              scored AS (
                SELECT q.query_id, c.neighbor_id,
                       list_dot_product(q.qv, c.cv)
                         / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS sim
                FROM q JOIN c ON q.query_id <> c.neighbor_id)
         SELECT query_id, neighbor_id, rk, round(sim, 6) AS sim
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id ASC) AS rk
               FROM scored)
         WHERE rk <= 5 ORDER BY query_id, rk""",

    "q107_decontam_ngrams" -> decontamOracleSql,

    // exact-result contract of the Bloom prefilter: same mirror as q107
    "q167_decontam_bloom" -> decontamOracleSql,

    // order-pinned IEEE cosine (list_dot_product evaluates index-ascending
    // like vector_dot), rounded ONCE to integer micro-units
    "q168_semantic_decontam" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                    WHERE vec_id % 10 <> 0),
              b AS (SELECT vec_id AS bench_id, embedding::DOUBLE[] AS v FROM embeddings
                    WHERE vec_id % 10 = 0 AND vec_id < 500
                    UNION ALL
                    SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings
                    WHERE vec_id IN (1, 11))
         SELECT c.vec_id, b.bench_id,
                CAST(round(list_dot_product(c.v, b.v)
                  / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v)))
                  * 1e6) AS BIGINT) AS sim_micro
         FROM c, b
         WHERE round(list_dot_product(c.v, b.v)
                 / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v)))
                 * 1e6) >= 800000
         ORDER BY c.vec_id, b.bench_id""",

    "q108_dup_span_removal" ->
      s"""WITH ${spanRemovalCtes("documents")}
         SELECT doc_id, clean_text, removed_frac FROM span_cleaned
         ORDER BY doc_id""",

    // gaps-and-islands over the same span_cov coverage the q108 mirror
    // derives: contiguous covered positions merge into maximal spans
    "q155_dup_span_report" ->
      s"""WITH ${spanRemovalCtes("documents")},
              isl AS (SELECT doc_id, cp,
                             cp - row_number() OVER (PARTITION BY doc_id ORDER BY cp) AS grp
                      FROM span_cov)
         SELECT doc_id, CAST(min(cp) AS INT) AS span_start,
                CAST(count(*) AS INT) AS span_len
         FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""",

    "q109_pii_redaction" ->
      """WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (1000000, 'contact alice.smith+test@example.com or bob@sub.domain.org for details'),
             (1000001, 'server 192.168.1.100 and 10.0.0.1 up; call 555-867-5309 or 555.123.4567 now'),
             (1000002, 'no personal information in this row just plain words')) v(doc_id, text))
         SELECT doc_id,
                len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
                len(regexp_extract_all(text, '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS n_phones,
                regexp_replace(regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                  '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g') AS redacted_text
         FROM all_docs ORDER BY doc_id""",

    "q110_temperature_sample" ->
      s"""WITH stats AS (SELECT source, count(*) AS n, pow(CAST(count(*) AS DOUBLE), 0.5) AS w
                        FROM documents GROUP BY source),
              rates AS (SELECT source, least(1.0, 200.0 * w / (SELECT sum(w) FROM stats) / n) AS rate
                        FROM stats)
         SELECT d.doc_id, d.source
         FROM documents d JOIN rates r USING (source)
         WHERE ${hashPointSql("d.doc_id")} < r.rate
         ORDER BY d.doc_id""",

    // planted-fixture golden (seeded sub-space KMeans, single-partition
    // fixture): expected ADC top-k pinned inline, every neighbor verified
    // same-cluster as its query (i % 3) — the PipelineSpec recall property
    "q112_pq_knn" ->
      """SELECT query_id, neighbor_id, rk, CAST(adist AS DOUBLE) AS adist FROM (VALUES
           (0, 3, 1, 0.005394), (0, 6, 2, 0.005394), (0, 9, 3, 0.005394),
           (0, 12, 4, 0.005394), (0, 15, 5, 0.005394),
           (1, 4, 1, 0.004369), (1, 10, 2, 0.004369), (1, 16, 3, 0.004369),
           (1, 19, 4, 0.004369), (1, 7, 5, 0.008991),
           (2, 17, 1, 0.002114), (2, 8, 2, 0.008469), (2, 23, 3, 0.008469),
           (2, 11, 4, 0.009158), (2, 14, 5, 0.013469))
         v(query_id, neighbor_id, rk, adist)
         ORDER BY query_id, rk""",

    "q113_incremental_dedup" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
              batch AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250
                        UNION ALL
                        SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 3),
              fp AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
                     FROM batch),
              keepb AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f),
              seen AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
                       FROM corpus)
         SELECT k.doc_id FROM keepb k LEFT JOIN seen s USING (f)
         WHERE s.f IS NULL ORDER BY doc_id""",

    "q114_c4_signals" ->
      s"""WITH all_docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT * FROM ${PipelineFixtures.c4ValuesSql}),
          base AS (SELECT doc_id, text, lower(text) AS lt,
                          string_split(text, chr(10)) AS lines,
                          len(regexp_extract_all(text, '[.!?]')) AS n_sentences,
                          contains(lower(text), 'lorem ipsum') AS has_lorem,
                          contains(text, '{') AS has_brace,
                          (contains(lower(text), 'privacy policy') OR
                           contains(lower(text), 'terms of use') OR
                           contains(lower(text), 'cookie policy')) AS has_policy
                   FROM all_docs)
          SELECT doc_id, len(lines) AS n_lines,
                 round(len(list_filter(lines, l -> regexp_matches(trim(l), '[.!?]$$')))
                   / CAST(len(lines) AS DOUBLE), 6) AS term_punct_line_frac,
                 round(len(list_filter(lines, l -> len(string_split_regex(trim(l), '\\s+')) < 5))
                   / CAST(len(lines) AS DOUBLE), 6) AS short_line_frac,
                 n_sentences, has_lorem, has_brace, has_policy,
                 (NOT has_lorem AND NOT has_brace AND NOT has_policy
                  AND n_sentences >= 3) AS c4_pass
          FROM base ORDER BY doc_id""",

    "q115_unigram_logloss" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
                       FROM documents),
              tf AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
              n AS (SELECT sum(c) AS tot FROM tf)
         SELECT doc_id, count(*) AS n_tokens,
                round(ln((SELECT tot FROM n)) - avg(ln(c)), 6) AS mean_nll
         FROM toks JOIN tf USING (t)
         GROUP BY doc_id ORDER BY doc_id""",

    // same hash-first trick as q115's mirror: DuckDB counts on the token
    // STRINGS (grouping by xxhash64(token) and by the token itself give
    // identical count tables absent a 64-bit collision)
    "q124_bigram_logloss" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
                       FROM documents),
              bi AS (SELECT doc_id, t[i] AS a, t[i+1] AS b
                     FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)),
              cab AS (SELECT a, b, count(*) AS cab FROM bi GROUP BY a, b),
              ca AS (SELECT a, sum(cab) AS ca FROM cab GROUP BY a),
              v AS (SELECT count(DISTINCT x) AS v
                    FROM (SELECT a AS x FROM bi UNION SELECT b FROM bi))
         SELECT doc_id, count(*) AS n_bigrams,
                round(avg(ln(ca + 0.5 * (SELECT v FROM v)) - ln(cab + 0.5)), 6) AS mean_nll
         FROM bi JOIN cab USING (a, b) JOIN ca USING (a)
         GROUP BY doc_id ORDER BY doc_id""",

    "q116_chunking" ->
      """WITH base AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                       FROM documents),
              idx AS (SELECT doc_id, toks,
                             unnest(generate_series(0,
                               CAST(floor(greatest(len(toks) - 8 - 1, 0) / 24.0) AS INT))) AS i
                      FROM base)
         SELECT doc_id, i AS chunk_idx,
                array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text,
                len(toks[i*24+1 : i*24+32]) AS n_tokens
         FROM idx ORDER BY doc_id, chunk_idx""",

    // line strings as dedup keys in the mirror vs xxhash64(line) in Spark
    // — identical absent a 64-bit collision (the q108/q115 convention)
    "q131_line_dedup" ->
      s"""WITH all_docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT * FROM ${PipelineFixtures.lineValuesSql}),
          base AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM all_docs),
          occ AS (SELECT doc_id, i-1 AS pos, trim(lower(lines[i])) AS key
                  FROM base, UNNEST(generate_series(1, len(lines))) AS t(i)
                  WHERE trim(lines[i]) <> ''),
          marked AS (SELECT doc_id, pos,
                            row_number() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rk,
                            count(*) OVER (PARTITION BY key) AS nocc
                     FROM occ),
          rm AS (SELECT doc_id, pos FROM marked WHERE nocc >= 2 AND rk > 1),
          pos_lines AS (SELECT doc_id, i-1 AS pos, lines[i] AS line
                        FROM base, UNNEST(generate_series(1, len(lines))) AS t(i)),
          kept AS (SELECT p.doc_id, string_agg(p.line, chr(10) ORDER BY p.pos) AS clean_text
                   FROM pos_lines p LEFT JOIN rm r ON p.doc_id = r.doc_id AND p.pos = r.pos
                   WHERE r.doc_id IS NULL AND trim(p.line) <> ''
                   GROUP BY p.doc_id),
          nb AS (SELECT doc_id, count(*) AS nlines FROM occ GROUP BY doc_id),
          rmc AS (SELECT doc_id, count(*) AS nrm FROM rm GROUP BY doc_id)
         SELECT b.doc_id, coalesce(k.clean_text, '') AS clean_text,
                round(coalesce(c.nrm, 0) / CAST(greatest(coalesce(n.nlines, 0), 1) AS DOUBLE), 6)
                  AS removed_line_frac
         FROM base b LEFT JOIN kept k USING (doc_id)
              LEFT JOIN nb n USING (doc_id) LEFT JOIN rmc c USING (doc_id)
         ORDER BY doc_id""",

    "q132_bm25_search" -> bm25OracleSql,

    "q143_bm25_batch" -> bm25BatchOracleSql,

    "q156_hybrid_search" -> hybridOracleSql,

    "q163_hybrid_ann" -> hybridAnnOracleSql,

    "q157_retrieval_eval" -> retrievalEvalOracleSql,

    // planted-fixture golden (xxhash winnowing sketches are not DuckDB-
    // reproducible, q77 contract): the embedded copy shares all 7 of its
    // fingerprints with its container — containment exactly 1.0
    "q162_containment" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(7 AS BIGINT), CAST(1000000 AS BIGINT)))
         t(contained_id, container_id, shared_fps, containment_micro)
         ORDER BY contained_id, container_id""",

    // golden by construction (see PipelineFixtures.imageRows): the three
    // encodings of one picture pair, the inverted picture stays out
    "q166_perceptual_real_images" ->
      """SELECT * FROM (VALUES
           ('image', CAST(0 AS BIGINT), CAST(3 AS BIGINT)),
           ('image', CAST(0 AS BIGINT), CAST(6 AS BIGINT)),
           ('image', CAST(3 AS BIGINT), CAST(6 AS BIGINT)))
         t(kind, id1, id2) ORDER BY id1, id2""",

    // golden by construction: survivors {0,2,11,21} land in the sink AND
    // the standing index; dropped near-dups (1,10,12,20) and the replayed
    // batch appear in neither
    "q170_doc_ingest_sink" ->
      """SELECT * FROM (VALUES
           ('index', CAST(0 AS BIGINT)), ('index', CAST(2 AS BIGINT)),
           ('index', CAST(11 AS BIGINT)), ('index', CAST(21 AS BIGINT)),
           ('sink', CAST(0 AS BIGINT)), ('sink', CAST(2 AS BIGINT)),
           ('sink', CAST(11 AS BIGINT)), ('sink', CAST(21 AS BIGINT)))
         t(part, doc_id) ORDER BY part, doc_id""",

    // golden by construction (see PipelineFixtures.audioRows): the three
    // encodings of one recording pair, the reversed envelope stays out
    "q169_perceptual_real_audio" ->
      """SELECT * FROM (VALUES
           ('audio', CAST(1 AS BIGINT), CAST(4 AS BIGINT)),
           ('audio', CAST(1 AS BIGINT), CAST(7 AS BIGINT)),
           ('audio', CAST(4 AS BIGINT), CAST(7 AS BIGINT)))
         t(kind, id1, id2) ORDER BY id1, id2""",

    // golden by construction (see PipelineFixtures.videoRows): the three
    // encodings of one clip pair, the frame-reversed clip stays out
    "q171_perceptual_real_video" ->
      """SELECT * FROM (VALUES
           ('video', CAST(2 AS BIGINT), CAST(5 AS BIGINT)),
           ('video', CAST(2 AS BIGINT), CAST(8 AS BIGINT)),
           ('video', CAST(5 AS BIGINT), CAST(8 AS BIGINT)))
         t(kind, id1, id2) ORDER BY id1, id2""",

    "q161_key_skew" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
                    FROM events GROUP BY 1),
              t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
         SELECT key, n, CAST(n * 1000000 // total AS BIGINT) AS share_micro
         FROM c, t ORDER BY n DESC, key ASC LIMIT 15""",

    // lambda var must stay `w` (bpeEncChainSql's init references it), so
    // the per-doc count columns take nw/nc/nt names
    "q158_tokenizer_fertility" ->
      s"""WITH d AS (SELECT source,
                CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                     x -> len(x) > 0)) AS BIGINT) AS nw,
                CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS BIGINT) AS nc,
                CAST(len(flatten(list_transform(
                    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                x -> len(x) > 0),
                    w -> string_split($bpeEncChainSql, chr(1))))) AS BIGINT) AS nt
              FROM documents),
           agg AS (SELECT source, count(*) AS n_docs,
                          CAST(sum(nw) AS BIGINT) AS total_words,
                          CAST(sum(nc) AS BIGINT) AS total_chars,
                          CAST(sum(nt) AS BIGINT) AS total_tokens
                   FROM d GROUP BY source)
         SELECT source, n_docs, total_words, total_chars, total_tokens,
                ${meanStrSql("total_tokens", "total_words", "//")} AS fertility,
                ${meanStrSql("total_chars", "total_tokens", "//")} AS chars_per_token
         FROM agg ORDER BY source""",

    "q159_embedding_health" ->
      s"""WITH s AS (SELECT len(embedding) AS dim,
                            len(list_filter(embedding::DOUBLE[], x -> isnan(x))) > 0 AS has_nan,
                            list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS sq
                     FROM embeddings),
              agg AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs,
                             CAST(sum(CASE WHEN dim <> $EmbeddingDim THEN 1 ELSE 0 END) AS BIGINT) AS n_dim_mismatch,
                             CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
                             CAST(sum(CASE WHEN NOT has_nan AND sq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
                             CAST(sum(CASE WHEN NOT has_nan
                                           THEN CAST(round(sqrt(sq) * 1e6) AS BIGINT)
                                           ELSE 0 END) AS BIGINT) AS norm_micro_sum
                      FROM s)
         SELECT n_vecs, n_dim_mismatch, n_nan, n_zero, norm_micro_sum,
                ${meanStrSql("norm_micro_sum", "n_vecs * 1000000", "//")} AS norm_mean
         FROM agg""",
    "q151_hard_negatives" -> hardNegOracleSql,

    "q137_tokenize_pack" -> tokenizePackOracleSql,

    "q138_perceptual_dups" -> perceptualOracleSql,

    // same dHash CTEs, corpus/batch split mirroring the Spark predicate
    "q160_perceptual_index_probe" ->
      s"""WITH all_docs AS (SELECT doc_id, text FROM documents
                            UNION ALL
                            SELECT * FROM ${PipelineFixtures.phashValuesSql}),
          $phashCtes
         SELECT b.doc_id, c.doc_id AS corpus_id, b.kind,
                CAST(bit_count(xor(b.ph, c.ph)) AS INT) AS dist
         FROM (SELECT * FROM bkt
               WHERE NOT (doc_id < 400 OR doc_id IN (1300002, 1300011))) b
              JOIN (SELECT * FROM bkt
                    WHERE doc_id < 400 OR doc_id IN (1300002, 1300011)) c
                ON b.kind = c.kind AND b.bucket = c.bucket
         WHERE bit_count(xor(b.ph, c.ph)) <= 16
         ORDER BY b.doc_id, corpus_id""",

    "q135_cross_logloss" -> (crossLmSql + " ORDER BY doc_id"),

    "q139_curation_v2" ->
      s"""WITH gopher AS ($GopherSql),
              xl AS ($crossLmSql),
              kept AS (SELECT d.doc_id, d.text
                       FROM documents d JOIN gopher g USING (doc_id)
                            JOIN xl USING (doc_id)
                       WHERE g.gopher_pass AND ${langIdSql("d.text")} = 'en'
                         AND xl.mean_nll < 3.43)
         ${packSelectSql("kept", 4)} ORDER BY bucket, seq_idx""",

    // planted-fixture golden (seeded coarse + sub-space KMeans fits,
    // single-partition fixture = bit-stable, same contract as q112);
    // every neighbor is same-cluster as its query (i % 3) and the
    // rank-1 hit is the query's nearest planted perturbation
    "q134_ivfpq_knn" ->
      """SELECT query_id, neighbor_id, rk, CAST(adist AS DOUBLE) AS adist FROM (VALUES
           (0, 15, 1, 0.000089), (0, 9, 2, 0.009911), (0, 3, 3, 0.015644),
           (0, 18, 4, 0.015644), (0, 6, 5, 0.015822),
           (1, 16, 1, 0.000089), (1, 10, 2, 0.009911), (1, 4, 3, 0.015644),
           (1, 19, 4, 0.015644), (1, 7, 5, 0.015822),
           (2, 17, 1, 0.000089), (2, 11, 2, 0.009911), (2, 5, 3, 0.015644),
           (2, 20, 4, 0.015644), (2, 8, 5, 0.015822))
         v(query_id, neighbor_id, rk, adist)
         ORDER BY query_id, rk""",

    "q133_source_divergence" ->
      """WITH toks AS (SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
                       FROM documents),
              counts AS (SELECT source, t, count(*) AS c FROM toks GROUP BY source, t),
              tot AS (SELECT t, sum(c) AS ct FROM counts GROUP BY t),
              srct AS (SELECT source, sum(c) AS n FROM counts GROUP BY source),
              g AS (SELECT sum(n) AS gg FROM srct),
              terms AS (SELECT c.source, s.n,
                               c.c / CAST(s.n AS DOUBLE) AS p,
                               (t.ct - c.c) / CAST((SELECT gg FROM g) - s.n AS DOUBLE) AS q
                        FROM counts c JOIN tot t USING (t) JOIN srct s USING (source))
         SELECT source, CAST(n AS BIGINT) AS n_tokens,
                round(0.5 * sum(p * ln(2.0 * p / (p + q)) +
                                CASE WHEN q > 0 THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END)
                      + 0.5 * ln(2.0) * (1.0 - sum(q)), 6) AS jsd
         FROM terms GROUP BY source, n ORDER BY source"""
  )

  /** The tokenize-and-pack mirror: per-word BPE via the q123 replace
    * chain (greedy fold == left-to-right replace), md5 bucket via the
    * hashPoint mirror, running offsets + fixed cuts as window math. The
    * merge chain is generated from the SAME DemoMerges list Spark folds.
    * Parameterized over the (doc_id, text) source relation so pipeline
    * compositions (q139) reuse the exact same construction. */
  /** The q146 contamination-safe-split construction as reusable CTEs over
    * an arbitrary (doc_id, text) relation; exposes
    * `${p}_final(doc_id, split)` with split ∈ train/val/test/quarantined.
    * Shared by q146 and the q150 pipeline so the mirrors cannot drift. */
  private def safeSplitCtes(src: String, p: String): String =
    s"""${p}_lab AS (
          SELECT doc_id, CASE WHEN u < 0.8 THEN 'train'
                              WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT doc_id, ${hashPointSql("doc_id")} AS u FROM $src)),
        ${p}_base AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
                      FROM $src),
        ${p}_wins AS (SELECT b.doc_id, array_to_string(toks[i:i+7], ' ') AS gram
                      FROM ${p}_base b,
                           UNNEST(generate_series(1, greatest(len(toks)-7, 0))) AS t(i)),
        ${p}_tg AS (SELECT DISTINCT w.doc_id, gram
                    FROM ${p}_wins w JOIN ${p}_lab USING (doc_id)
                    WHERE ${p}_lab.split = 'train'),
        ${p}_eg AS (SELECT DISTINCT gram
                    FROM ${p}_wins w JOIN ${p}_lab USING (doc_id)
                    WHERE ${p}_lab.split <> 'train'),
        ${p}_hit AS (SELECT DISTINCT doc_id FROM ${p}_tg JOIN ${p}_eg USING (gram)),
        ${p}_final AS (
          SELECT l.doc_id,
                 CASE WHEN l.doc_id IN (SELECT doc_id FROM ${p}_hit)
                      THEN 'quarantined' ELSE l.split END AS split
          FROM ${p}_lab l)"""

  /** The q144 DSIR construction as reusable CTEs over an arbitrary
    * (doc_id, source, text) relation (target = rows with source='src0');
    * exposes `${p}_ranked(doc_id, n_feats, logw_micro, rn)` and
    * `${p}_keep(doc_id)` (the top-`keep`). Shared by q144 and q150. */
  private def dsirCtes(src: String, keep: Int, nBuckets: Int, p: String): String =
    s"""${p}_base AS (
          SELECT doc_id, source,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             t -> len(t) > 0) AS toks
          FROM $src),
        ${p}_feats AS (
          SELECT doc_id, source,
                 toks || CASE WHEN len(toks) >= 2
                              THEN list_transform(generate_series(1, len(toks) - 1),
                                                  i -> toks[i] || ' ' || toks[i + 1])
                              ELSE []::VARCHAR[] END AS gs
          FROM ${p}_base),
        ${p}_bg AS (
          SELECT doc_id, source,
                 CAST(floor((('0x' || substr(md5(g), 1, 4))::INT / 65536.0)
                            * $nBuckets) AS INT) AS b
          FROM (SELECT doc_id, source, unnest(gs) AS g FROM ${p}_feats)),
        ${p}_t AS (SELECT b, count(*) AS n FROM ${p}_bg WHERE source = 'src0' GROUP BY b),
        ${p}_r AS (SELECT b, count(*) AS n FROM ${p}_bg GROUP BY b),
        ${p}_tot AS (SELECT (SELECT sum(n) FROM ${p}_t) + $nBuckets.0 AS tn,
                            (SELECT sum(n) FROM ${p}_r) + $nBuckets.0 AS rn),
        ${p}_ratio AS (
          SELECT bs.b,
                 CAST(round((ln((coalesce(t.n, 0) + 1) / tot.tn)
                           - ln((coalesce(r.n, 0) + 1) / tot.rn)) * 1e6) AS BIGINT) AS rr
          FROM (SELECT unnest(generate_series(0, ${nBuckets - 1})) AS b) bs
          LEFT JOIN ${p}_t t ON t.b = bs.b LEFT JOIN ${p}_r r ON r.b = bs.b
          CROSS JOIN ${p}_tot tot),
        ${p}_score AS (
          SELECT bg.doc_id, CAST(sum(ratio.rr) AS BIGINT) AS lw
          FROM ${p}_bg bg JOIN ${p}_ratio ratio ON ratio.b = bg.b GROUP BY bg.doc_id),
        ${p}_ranked AS (
          SELECT f.doc_id, CAST(len(f.gs) AS INT) AS n_feats,
                 CAST(coalesce(s.lw, 0) AS BIGINT) AS logw_micro,
                 row_number() OVER (ORDER BY coalesce(s.lw, 0) DESC, f.doc_id ASC) AS rn
          FROM ${p}_feats f LEFT JOIN ${p}_score s ON s.doc_id = f.doc_id),
        ${p}_keep AS (SELECT doc_id FROM ${p}_ranked WHERE rn <= $keep)"""

  /** The DemoMerges BPE word-encode as a DuckDB replace chain over chr(1)
    * joints — shared by the pack mirror and the fertility report. */
  private lazy val bpeEncChainSql: String = {
    val init = "array_to_string(regexp_extract_all(w, '.'), chr(1)) || chr(1) || '</w>'"
    graft.pipeline.Bpe.DemoMerges.foldLeft(init) { case (acc, (a, b)) =>
      s"replace($acc, '$a' || chr(1) || '$b', '${a + b}')"
    }
  }

  private def packSelectSql(src: String, nBuckets: Int): String = {
    val chain = bpeEncChainSql
    s"""SELECT bucket, seq_idx, n_tokens, seq_text FROM (
        WITH enc AS (
          SELECT doc_id,
                 CAST(floor(${hashPointSql("doc_id")} * $nBuckets) AS INT) AS bucket,
                 flatten(list_transform(
                   list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                               x -> len(x) > 0),
                   w -> string_split($chain, chr(1)))) || ['</d>'] AS etoks
          FROM $src),
        offd AS (
          SELECT doc_id, bucket, etoks,
                 CAST(sum(len(etoks)) OVER (PARTITION BY bucket ORDER BY doc_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   - len(etoks) AS off
          FROM enc),
        pos AS (
          SELECT bucket, off + i - 1 AS gpos, etoks[i] AS tok
          FROM offd, UNNEST(generate_series(1, len(etoks))) AS g(i))
       SELECT bucket, gpos // 32 AS seq_idx, count(*) AS n_tokens,
              string_agg(tok, ' ' ORDER BY gpos % 32) AS seq_text
       FROM pos GROUP BY bucket, gpos // 32)"""
  }

  private lazy val tokenizePackOracleSql: String =
    packSelectSql("documents", 8) + " ORDER BY bucket, seq_idx"

  /** The q135 reference-LM NLL as a reusable SELECT (src0 = trusted
    * domain), shared by q135 and the q139 composition. */
  private lazy val crossLmSql: String =
    """WITH ref AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
                    FROM documents WHERE source = 'src0'),
            tf AS (SELECT t, count(*) AS c FROM ref GROUP BY t),
            nv AS (SELECT sum(c) + count(*) + 1 AS nv FROM tf),
            toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
                     FROM documents)
       SELECT doc_id, count(*) AS n_tokens,
              round(ln((SELECT nv FROM nv)) - avg(ln(coalesce(f.c, 0) + 1)), 6) AS mean_nll
       FROM toks k LEFT JOIN tf f USING (t)
       GROUP BY doc_id"""

  /** The batch-BM25 mirror: postings on token STRINGS (identical to the
    * Spark side's hashed postings absent a 64-bit collision), same
    * constants-from-Scala-doubles contract as bm25OracleSql. */
  /** The batch-BM25 ranking as reusable CTEs (postings on token STRINGS,
    * same constants-from-Scala-doubles contract as bm25OracleSql);
    * exposes `rk(query_id, doc_id, score, rk)`. Shared by q143 and the
    * q151 hard-negative miner. */
  private def bm25BatchCtes(qvals: String, src: String = "documents"): String = {
    def d(v: Double) = s"CAST(${v.toString} AS DOUBLE)"
    s"""pre AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
                FROM $src),
       post AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
                FROM pre, UNNEST(toks) AS u(t) GROUP BY 1, 2),
       dls AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM pre),
       dfq AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY t),
       stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dls),
       q AS (SELECT * FROM (VALUES $qvals) AS v(query_id, t)),
       sc AS (SELECT q.query_id, p.doc_id,
                     ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * ${d(Bm25K1 + 1.0)} /
                       (tf + ${d(Bm25K1)} * (${d(1.0 - Bm25B)} + ${d(Bm25B)} * dl / avgdl)) AS s
              FROM q JOIN post p USING (t) JOIN dfq USING (t)
                   JOIN dls USING (doc_id), stats),
       agg AS (SELECT query_id, doc_id, round(sum(s), 6) AS score
               FROM sc GROUP BY 1, 2),
       rk AS (SELECT *, row_number() OVER
                (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
              FROM agg)"""
  }

  private def qvalsSql(qs: Seq[(Long, Seq[String])]): String =
    qs.flatMap { case (id, ts) => ts.map(t => s"($id, '$t')") }.mkString(", ")

  /** q107/q167 shared mirror: exact 8-gram overlap counts against the
    * doc_id % 10 == 0 benchmark split (the Bloom variant's exact-result
    * contract makes the two gates one SQL). */
  private val decontamOracleSql: String =
    """WITH base AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
                     FROM documents),
            wins AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
                     FROM base, UNNEST(generate_series(1, greatest(len(toks)-7, 0))) AS t(i)),
            bench AS (SELECT DISTINCT gram, doc_id AS bench_id FROM wins WHERE doc_id % 10 = 0)
       SELECT w.doc_id, count(distinct w.gram) AS n_hit_grams,
              count(distinct b.bench_id) AS n_benchmarks
       FROM (SELECT DISTINCT doc_id, gram FROM wins WHERE doc_id % 10 <> 0) w
       JOIN bench b USING (gram)
       GROUP BY w.doc_id ORDER BY doc_id"""

  /** The SQ8 ranking as reusable CTEs (q145's mirror, parameterized):
    * per-dim [min, max] bounds over the embeddings corpus, linear
    * quantize/dequant in the operator's exact op order, asymmetric
    * candidate cosine with `k * overfetch` candidates, exact-cosine
    * rerank. Exposes `sq8_rk(query_id, neighbor_id, sim, asim, rk)` —
    * consumers filter `rk <= k` themselves; sim/asim stay UNROUNDED
    * (ranking happened on the raw doubles — consumers round at their
    * final select, like the Spark side). Shared by q145 and the q163
    * ANN-backed hybrid. */
  private def sq8Ctes(queryPred: String, k: Int, overfetch: Int): String =
    s"""sq8_c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       sq8_q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE $queryPred),
       sq8_dim AS (SELECT max(len(cv)) AS d FROM sq8_c),
       sq8_dims AS (
         SELECT i, min(cv[i]) AS mn,
                CASE WHEN max(cv[i]) - min(cv[i]) > 0
                     THEN max(cv[i]) - min(cv[i]) ELSE 1.0 END AS span
         FROM sq8_c CROSS JOIN (SELECT unnest(generate_series(1, (SELECT d FROM sq8_dim))) AS i)
         GROUP BY i),
       sq8_bounds AS (SELECT list(mn ORDER BY i) AS mnl, list(span ORDER BY i) AS spanl
                      FROM sq8_dims),
       sq8_enc AS (
         SELECT neighbor_id,
                list_transform(generate_series(1, d),
                  i -> mnl[i] + round((cv[i] - mnl[i]) / spanl[i] * 255) / 255.0
                                * spanl[i]) AS dv
         FROM sq8_c CROSS JOIN sq8_bounds CROSS JOIN sq8_dim),
       sq8_cand AS (
         SELECT query_id, neighbor_id, asim, qv,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY asim DESC, neighbor_id ASC) AS crk
         FROM (SELECT q.query_id, e.neighbor_id, q.qv,
                      list_dot_product(q.qv, e.dv)
                        / (sqrt(list_dot_product(q.qv, q.qv))
                           * sqrt(list_dot_product(e.dv, e.dv))) AS asim
               FROM sq8_q q JOIN sq8_enc e ON q.query_id <> e.neighbor_id)),
       sq8_rer AS (
         SELECT query_id, neighbor_id, asim,
                list_dot_product(qv, c.cv)
                  / (sqrt(list_dot_product(qv, qv))
                     * sqrt(list_dot_product(c.cv, c.cv))) AS sim
         FROM sq8_cand JOIN sq8_c c USING (neighbor_id) WHERE crk <= ${k * overfetch}),
       sq8_rk AS (
         SELECT query_id, neighbor_id, sim, asim,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rk
         FROM sq8_rer)"""

  private lazy val bm25BatchOracleSql: String =
    s"""WITH ${bm25BatchCtes(qvalsSql(Bm25BatchQueries))}
       SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, CAST(rk AS INT) AS rk, score
       FROM rk WHERE rk <= 10 ORDER BY query_id, rk"""

  /** q156: sparse ranks from the shared batch-BM25 CTEs, dense ranks via
    * the q65 cosine construct (6-dp-rounded sim BEFORE ranking, id ties),
    * RRF contributions as integer micro-units so the fused score is an
    * exact integer sum on both engines. BOTH retriever corpora mirror the
    * Spark side's documents⋈embeddings frame explicitly (BM25 stats and
    * dense ranks over the intersection) — the gate holds by construction
    * even if the generator ever stops keeping the two tables 1:1. */
  private lazy val hybridOracleSql: String = {
    def contrib(r: String) =
      s"coalesce(CAST(round(1e6 / ($HybridRrfK + $r)) AS BIGINT), 0)"
    val docsWithEmb =
      "(SELECT d.doc_id, d.text FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id)"
    s"""WITH ${bm25BatchCtes(qvalsSql(Bm25BatchQueries.take(2)), docsWithEmb)},
        sparse AS (SELECT query_id, doc_id, rk AS rs FROM rk WHERE rk <= $HybridDepth),
        qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 2),
        cv AS (SELECT e.vec_id AS doc_id, e.embedding::DOUBLE[] AS v
               FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        dsc AS (SELECT q.query_id, c.doc_id,
                       round(list_dot_product(q.v, c.v)
                         / (sqrt(list_dot_product(q.v, q.v))
                            * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
                FROM qv q, cv c),
        dense AS (SELECT query_id, doc_id, rd FROM
                    (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, doc_id ASC) AS rd FROM dsc)
                  WHERE rd <= $HybridDepth),
        fused AS (SELECT coalesce(s.query_id, d.query_id) AS query_id,
                         coalesce(s.doc_id, d.doc_id) AS doc_id,
                         CAST(${contrib("s.rs")} + ${contrib("d.rd")} AS BIGINT) AS rrf_micro
                  FROM sparse s FULL OUTER JOIN dense d
                       ON s.query_id = d.query_id AND s.doc_id = d.doc_id)
       SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
              CAST(rk AS INT) AS rk, rrf_micro
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_micro DESC, doc_id ASC) AS rk FROM fused)
       WHERE rk <= 10 ORDER BY query_id, rk"""
  }

  /** q163: the ANN-backed hybrid — BM25 ranks over all documents, SQ8
    * ranks over all embeddings (two independent retrievers, no corpus
    * intersection), fused with the same integer-micro RRF as q156. */
  private lazy val hybridAnnOracleSql: String = {
    def contrib(r: String) =
      s"coalesce(CAST(round(1e6 / ($HybridRrfK + $r)) AS BIGINT), 0)"
    s"""WITH ${bm25BatchCtes(qvalsSql(Bm25BatchQueries.take(2)))},
        ${sq8Ctes("vec_id < 2", k = HybridDepth, overfetch = 4)},
        sparse AS (SELECT query_id, doc_id, rk AS rs FROM rk WHERE rk <= $HybridDepth),
        dense AS (SELECT query_id, neighbor_id AS doc_id, rk AS rd
                  FROM sq8_rk WHERE rk <= $HybridDepth),
        fused AS (SELECT coalesce(s.query_id, d.query_id) AS query_id,
                         coalesce(s.doc_id, d.doc_id) AS doc_id,
                         CAST(${contrib("s.rs")} + ${contrib("d.rd")} AS BIGINT) AS rrf_micro
                  FROM sparse s FULL OUTER JOIN dense d
                       ON s.query_id = d.query_id AND s.doc_id = d.doc_id)
       SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
              CAST(rk AS INT) AS rk, rrf_micro
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_micro DESC, doc_id ASC) AS rk FROM fused)
       WHERE rk <= 10 ORDER BY query_id, rk"""
  }

  /** q157: the shared batch ranking evaluated against the q151 positives;
    * recall@k and RR round once per query to integer micro-units. */
  private lazy val retrievalEvalOracleSql: String = {
    val truthVals = HardNegQueries.map { case (id, _, p) => s"($id, $p)" }.mkString(", ")
    s"""WITH ${bm25BatchCtes(qvalsSql(HardNegQueries.map(q => (q._1, q._2))))},
        truth AS (SELECT * FROM (VALUES $truthVals) AS t(query_id, doc_id)),
        rel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant
                FROM truth GROUP BY 1),
        hit AS (SELECT r.query_id, CAST(count(*) AS BIGINT) AS hits_at_k,
                       min(r.rk) AS first_rk
                FROM rk r JOIN truth t ON t.query_id = r.query_id
                                      AND t.doc_id = r.doc_id
                WHERE r.rk <= 10 GROUP BY 1)
       SELECT CAST(rel.query_id AS BIGINT) AS query_id, n_relevant,
              coalesce(hits_at_k, 0) AS hits_at_k,
              CAST(round(1e6 * coalesce(hits_at_k, 0) / n_relevant) AS BIGINT)
                AS recall_micro,
              coalesce(CAST(round(1e6 / first_rk) AS BIGINT), 0) AS rr_micro
       FROM rel LEFT JOIN hit ON hit.query_id = rel.query_id
       ORDER BY query_id"""
  }

  /** q151: the shared batch ranking, positives excluded, renumbered.
    * WHERE runs before the window, so neg_rk numbers exactly the
    * surviving top-(nNeg+1) rows — the operator's semantics. */
  private lazy val hardNegOracleSql: String = {
    val posVals = HardNegQueries.map { case (id, _, p) => s"($id, $p)" }.mkString(", ")
    s"""WITH ${bm25BatchCtes(qvalsSql(HardNegQueries.map(q => (q._1, q._2))))},
        pos AS (SELECT * FROM (VALUES $posVals) AS p(query_id, positive_doc_id)),
        neg AS (SELECT r.query_id, r.doc_id, r.score,
                       row_number() OVER (PARTITION BY r.query_id ORDER BY r.rk ASC) AS neg_rk
                FROM rk r JOIN pos USING (query_id)
                WHERE r.rk <= ${HardNegN + 1} AND r.doc_id <> pos.positive_doc_id)
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id AS neg_doc_id,
               CAST(neg_rk AS INT) AS neg_rk, score
        FROM neg WHERE neg_rk <= $HardNegN ORDER BY query_id, neg_rk"""
  }

  /** The dHash mirror: 72 sampled "pixels" as one computed-column CTE,
    * 64 gradient bits OR-ed into a BIGINT, trailing-8-bit bucket, capped
    * Hamming self-join — generated so the bit layout cannot drift from
    * Multimodal.dHash. Payloads are ASCII here, so char ops mirror the
    * byte ops exactly. */
  private lazy val perceptualOracleSql: String = {
    s"""WITH all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT * FROM ${PipelineFixtures.phashValuesSql}),
        $phashCtes
       SELECT a.kind, a.doc_id AS id1, b.doc_id AS id2,
              CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS dist
       FROM capped a JOIN capped b
         ON a.kind = b.kind AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       WHERE bit_count(xor(a.ph, b.ph)) <= 16
       ORDER BY a.kind, id1, id2"""
  }

  /** The dHash/bucket CTE chain over an `all_docs(doc_id, text)` CTE —
    * shared by the q138 pair mirror and the q160 index-probe mirror. */
  private lazy val phashCtes: String = {
    def px(k: Int) =
      s"(CASE WHEN len = 0 THEN 0 ELSE ord(substring(text, (($k * len) // 72) + 1, 1)) END)"
    val pxCols = (0 until 72).map(k => s"${px(k)} AS p$k").mkString(", ")
    val phExpr = (0 until 8).flatMap(r => (0 until 8).map { c =>
      val bit = 1L << (r * 8 + c)
      s"(CASE WHEN p${r * 9 + c} > p${r * 9 + c + 1} THEN CAST($bit AS BIGINT) ELSE 0 END)"
    }).mkString(" | ")
    s"""base AS (SELECT doc_id,
                        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
                        length(text) AS len, text
                 FROM all_docs),
        pxs AS (SELECT doc_id, kind, $pxCols FROM base),
        phs AS (SELECT doc_id, kind, $phExpr AS ph FROM pxs),
        bkt AS (SELECT doc_id, kind, ph, (ph >> 56) & 255 AS bucket FROM phs),
        capped AS (SELECT * FROM
                     (SELECT *, count(*) OVER (PARTITION BY kind, bucket) AS bs FROM bkt)
                   WHERE bs <= 4096)"""
  }

  /** The BM25 mirror, generated from the SAME Scala constants the Spark
    * side runs with (terms, k1, b) — Double.toString literals round-trip
    * bit-exactly through DuckDB's CAST(... AS DOUBLE). */
  private lazy val bm25OracleSql: String = {
    def d(v: Double) = s"CAST(${v.toString} AS DOUBLE)"
    val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(", ")
    val dfCols = Bm25Terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i").mkString(", ")
    val denomTail = s"${d(Bm25K1)} * (${d(1.0 - Bm25B)} + ${d(Bm25B)} * dl / avgdl)"
    val scoreTerms = Bm25Terms.indices.map(i =>
      s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * tf$i * ${d(Bm25K1 + 1.0)} / (tf$i + $denomTail)")
      .mkString(" + ")
    val anyTf = Bm25Terms.indices.map(i => s"tf$i").mkString(" + ")
    s"""WITH pre AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
                     FROM documents),
            tf AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, $tfCols FROM pre),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl, $dfCols FROM tf)
       SELECT doc_id, round($scoreTerms, 6) AS score
       FROM tf, stats
       WHERE $anyTf > 0
       ORDER BY score DESC, doc_id LIMIT 25"""
  }
}
