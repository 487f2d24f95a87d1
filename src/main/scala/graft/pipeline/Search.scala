package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword search over the corpus: BM25 ranking (Robertson & Walker 1994,
  * in the Lucene formulation with the `ln(1 + …)` idf floor so scores stay
  * non-negative even for terms in more than half the corpus).
  *
  * Scale shape: no inverted index is materialized — for a FIXED query,
  * per-term tf is a map-side expression over the staged token array,
  * corpus statistics (N, avgdl, per-term df) are ONE 1-row aggregate
  * broadcast back, and the ranked result is a distributed top-k
  * (TakeOrderedAndProject). Zero wide shuffles at any corpus size; the
  * corpus is scanned twice (stats pass + scoring pass), both scans
  * column-pruned to (id, text). An ad-hoc query over 100 TB is therefore
  * two embarrassingly-parallel passes; a standing search service would
  * bucket a (term-hash → posting) table instead — that shape is
  * [[graft.pipeline.Dedup.jaccardPairs]]'s inverted index.
  */
object Search {

  /** Top-k documents by BM25 score for a bag of query terms. Terms are
    * matched against whitespace tokens of lowercase text (the corpus
    * tokenization every other text operator uses). Docs matching no term
    * are not returned. Ties break on ascending id, and ordering uses the
    * 6-dp rounded score so ranks are reproducible across engines.
    * Output: (idCol, score) — score rounded to 6 dp. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val pre = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).cast("double").as("__dl"))
    val withTf = terms.indices.foldLeft(pre) { (df, i) =>
      df.withColumn(s"__tf$i",
        size(filter(col("__toks"), x => x === lit(terms(i)))).cast("double"))
    }.drop("__toks")
    val statAggs = count(lit(1)).cast("double").as("__n") ::
      avg(col("__dl")).as("__avgdl") ::
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1.0).otherwise(0.0)).as(s"__df$i")).toList
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .where(terms.indices.map(i => col(s"__tf$i")).reduce(_ + _) > 0)
      .select(col(idCol), round(score, 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch BM25 — the standing-service shape: a whole TABLE of queries
    * `(query_id, terms ARRAY<STRING>)` ranked at once through an inverted
    * index. The corpus becomes a postings table (term-hash, doc, tf) in
    * one pass; per-term document frequencies re-aggregate those postings;
    * the (tiny) exploded query-term stream joins postings on the hash, and
    * per-(query, doc) scores top-k within each query. Token strings never
    * cross a shuffle (the hash-first contract) and the corpus is scanned
    * once regardless of query count — the shape that serves a million
    * queries against 100 TB.
    * Scores are identical to [[bm25TopK]] (same formula and rounding);
    * ties break on ascending doc id within a query. */
  def bm25TopKBatch(docs: DataFrame, queries: DataFrame, k: Int,
                    k1: Double = 1.2, b: Double = 0.75,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("double").as("__dl"),
        explode(col("__toks")).as("__t"))
      .select(col(idCol), col("__dl"), xxhash64(col("__t")).as("__h"))
    // the postings table IS the search index — localCheckpoint it so its
    // three consumers (df table, corpus stats, scoring join) read the
    // materialized result instead of re-deriving the corpus scan+tokenize
    // each (3 scans measured without it); a standing service persists
    // this table instead
    val postings = toks.groupBy(col(idCol), col("__dl"), col("__h"))
      .agg(count(lit(1)).cast("double").as("__tf"))
      .localCheckpoint(false)
    val dfreq = postings.groupBy(col("__h")).agg(count(lit(1)).cast("double").as("__df"))
    // N and avgdl re-aggregate the postings' (doc, dl) pairs — no second
    // corpus scan (every doc has >= 1 posting: empty text still tokenizes
    // to one empty token, same as bm25TopK's convention)
    val stats = postings.select(col(idCol), col("__dl")).distinct()
      .agg(count(lit(1)).cast("double").as("__n"), avg(col("__dl")).as("__avgdl"))
    val qterms = queries
      .select(col("query_id"), explode(array_distinct(col("terms"))).as("__t"))
      .select(col("query_id"), xxhash64(lower(col("__t"))).as("__h"))
    val scored = qterms
      .join(postings, "__h")
      .join(broadcast(dfreq.join(qterms.select(col("__h")).distinct(), "__h")), "__h")
      .crossJoin(broadcast(stats))
      .withColumn("__s",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))) *
          col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("__s")), 6).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col(idCol), col("rk"), col("score"))
  }

  /** Dense retrieval ranks: per query, the `k` highest-cosine docs.
    * Queries (query_id, qvecCol) broadcast against the corpus; similarity
    * rounds to 6 dp BEFORE ranking (the repo's cross-engine rank-stability
    * convention) with ascending-id ties. Unlike Similarity.bruteForceKnn
    * this does NOT exclude id equality — query ids and doc ids are
    * different namespaces in retrieval.
    * Output: (query_id, idCol, rk, sim). */
  def denseTopK(docs: DataFrame, queries: DataFrame, k: Int,
                idCol: String = "doc_id", vecCol: String = "embedding",
                qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col("query_id"),
      col(qvecCol).cast("array<double>").as("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol).asc)
    q.crossJoin(docs.select(col(idCol), col(vecCol).cast("array<double>").as("__cv")))
      .withColumn("sim", round(Similarity.cosine(col("__qv"), col("__cv")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col(idCol), col("rk"), col("sim"))
  }

  /** HYBRID retrieval: reciprocal-rank fusion (Cormack, Clarke & Büttner,
    * SIGIR 2009) of the sparse BM25 ranking and the dense cosine ranking —
    * the RAG-stack default that beats either retriever alone without score
    * calibration. Each retriever contributes 1/(rrfK + rank) for its top
    * `depth` docs; a doc ranked by only one side scores that side alone.
    *
    * Determinism contract: contributions are INTEGER MICRO-UNITS
    * (round(1e6/(rrfK+rank)) as long) so the fused score is an exact
    * integer sum — identical across engines, partition orders and the
    * driver's exact hasher (the q117/HUGEINT lesson applied at design
    * time). Ties break ascending id.
    *
    * Scale shape: BM25 side = [[bm25TopKBatch]] (one corpus pass, postings
    * index, hash-only shuffles); dense side = [[denseTopK]] (broadcast
    * queries, per-partition window-limit before the per-query exchange);
    * fusion joins two (queries x depth)-sized frames — nothing corpus-sized
    * moves after the two retriever passes.
    * `queries`: (query_id, terms ARRAY<STRING>, qvec ARRAY).
    * Output: (query_id, idCol, rk, rrf_micro).
    *
    * This convenience form runs BRUTE-FORCE dense ranking; at corpus
    * scale, rank each side independently (ANN for dense) and fuse with
    * [[rrfFuse]] — any `(query_id, idCol, rk)` frame plugs in. */
  def hybridTopK(docs: DataFrame, queries: DataFrame, k: Int,
                 depth: Int = 60, rrfK: Int = 60,
                 k1: Double = 1.2, b: Double = 0.75,
                 textCol: String = "text", idCol: String = "doc_id",
                 vecCol: String = "embedding"): DataFrame = {
    val sparse = bm25TopKBatch(docs, queries.select(col("query_id"), col("terms")),
        depth, k1, b, textCol, idCol)
      .select(col("query_id"), col(idCol), col("rk"))
    val dense = denseTopK(docs, queries.select(col("query_id"), col("qvec")),
        depth, idCol, vecCol)
      .select(col("query_id"), col(idCol), col("rk"))
    rrfFuse(sparse, dense, k, rrfK, idCol)
  }

  /** RRF fusion of two PRE-RANKED frames — the pluggable-retriever form of
    * [[hybridTopK]]: either side is any `(query_id, idCol, rk)` frame
    * (the shape every retriever here emits — [[bm25TopKBatch]],
    * [[denseTopK]], and all of Similarity's ANN variants: brute / LSH /
    * IVF / PQ / IVF-PQ / SQ8), so at corpus scale the dense leg can be
    * served by a compressed-index ANN instead of the brute-force scan.
    * Fusion joins two (queries x depth)-sized frames — nothing
    * corpus-sized moves, no vector math runs (PlanQualitySpec pins the
    * ANN-backed hybrid to exactly that shape). Identical scores and
    * tie-breaks to the inline fusion this replaces. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int, rrfK: Int = 60,
              idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def contrib(rank: org.apache.spark.sql.Column) =
      coalesce(round(lit(1e6) / (lit(rrfK) + rank)).cast("long"), lit(0L))
    val s = sparse.select(col("query_id"), col(idCol), col("rk").as("__rs"))
    val d = dense.select(col("query_id"), col(idCol), col("rk").as("__rd"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col(idCol).asc)
    s.join(d, Seq("query_id", idCol), "full_outer")
      .withColumn("rrf_micro", contrib(col("__rs")) + contrib(col("__rd")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col(idCol), col("rk"), col("rrf_micro"))
  }

  /** Retrieval evaluation: per query, recall@k and reciprocal rank
    * against a relevance-judgment table — the harness that closes the
    * loop on every retriever here (BM25 / dense / hybrid / ANN variants
    * all emit the (query_id, id, rk) shape this consumes). Metrics are
    * integer micro-units (round once per query) per the determinism
    * contract. Queries with judgments but no ranked hits score 0, not
    * null; macro averages are the caller's one extra aggregate.
    *
    * `ranked`: (query_id, idCol, rk); `truth`: one row per
    * (query_id, relevant idCol). Both frames are query-scale — every
    * join here is tiny regardless of corpus size.
    * Output: (query_id, n_relevant, hits_at_k, recall_micro, rr_micro). */
  def retrievalEval(ranked: DataFrame, truth: DataFrame, k: Int,
                    idCol: String = "doc_id"): DataFrame = {
    val rel = truth.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_relevant"))
    val hits = ranked.filter(col("rk") <= k)
      .join(truth, Seq("query_id", idCol))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("hits_at_k"), min(col("rk")).as("__first"))
    rel.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        col("n_relevant"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        round(lit(1e6) * coalesce(col("hits_at_k"), lit(0L)) / col("n_relevant"))
          .cast("long").as("recall_micro"),
        coalesce(round(lit(1e6) / col("__first")).cast("long"), lit(0L))
          .as("rr_micro"))
  }

  /** Hard-negative mining for retrieval training (DPR, Karpukhin et al.
    * 2020 §4.2: the strongest training negatives are BM25's top-ranked
    * NON-answers): for each (query, positive) pair, the `nNeg` top
    * BM25 docs that are not the positive, re-ranked 1..nNeg.
    *
    * Scale shape: rides [[bm25TopKBatch]]'s single-corpus-pass postings
    * index with k = nNeg+1 (at most one positive can be displaced); the
    * positive table is query-cardinality and broadcasts; re-ranking
    * reuses the per-query window partitioning.
    * `queries`: (query_id, terms, positive_doc_id).
    * Output: (query_id, neg_doc_id, neg_rk, score). */
  def hardNegatives(docs: DataFrame, queries: DataFrame, nNeg: Int,
                    k1: Double = 1.2, b: Double = 0.75,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // positives FOLD TO ONE ROW PER QUERY before anything joins: a query
    // listed with several positives would otherwise duplicate its terms
    // into the scorer (doubling tf contributions) and cross-product the
    // ranked rows. The per-query positive SET sizes the rank headroom —
    // p positives can displace at most p ranks.
    val pos = queries.groupBy(col("query_id"))
      .agg(first(col("terms")).as("terms"),
        collect_set(col("positive_doc_id")).as("__pos"))
    val maxP = pos.agg(max(size(col("__pos")))).head.getInt(0)
    val ranked = bm25TopKBatch(docs,
      pos.select(col("query_id"), col("terms")), nNeg + maxP, k1, b, textCol, idCol)
    val w = Window.partitionBy(col("query_id")).orderBy(col("rk").asc)
    ranked
      .join(broadcast(pos.select(col("query_id"), col("__pos"))), "query_id")
      .where(!array_contains(col("__pos"), col(idCol)))
      .withColumn("neg_rk", row_number().over(w))
      .where(col("neg_rk") <= nNeg)
      .select(col("query_id"), col(idCol).as("neg_doc_id"), col("neg_rk"), col("score"))
  }
}
