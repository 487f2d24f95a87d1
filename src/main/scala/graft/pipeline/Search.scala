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
}
