package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.pipeline.{Dedup, Similarity, TextAnalysis}
import graft.queries.PipelineFixtures

/** Dev helper: print the fixture-op outputs in VALUES form to freeze as
  * golden oracles. Not part of any driver contract. */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = PipelineFixtures.docs(spark)
    val embs = PipelineFixtures.embs(spark)

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"== $name (${df.columns.mkString(", ")})")
      df.collect().foreach { r =>
        println("(" + (0 until r.length).map(r.get(_).toString).mkString(", ") + "),")
      }
    }

    dump("q66", Dedup.minHashDuplicates(docs, numHashes = 16, threshold = 0.5)
      .orderBy("id1", "id2"))
    dump("q67", Dedup.simHashDuplicates(docs, prefixBits = 8, maxDist = 12)
      .orderBy("id1", "id2"))
    dump("q68", Similarity.lshKnn(embs.filter(col("vec_id") < 3), embs, 5, nPlanes = 4)
      .orderBy("query_id", "rk"))
    dump("q69", Similarity.cosineDuplicates(embs, threshold = 0.8, nPlanes = 4)
      .orderBy("id1", "id2"))
    dump("q76", Similarity.ivfKnn(embs.filter(col("vec_id") < 3), embs, 5,
      nCentroids = 3, nprobe = 2).orderBy("query_id", "rk"))
    val fps = docs
      .select(col("doc_id"), col("lang"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), col("lang"), TextAnalysis.gramsFromTokens(col("toks"), 8).as("grams"))
      .select(col("doc_id"), col("lang"),
        explode(TextAnalysis.fingerprintsFromGrams(col("grams"), 6)).as("fp"))
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 8)).select("fp")
    val candidates = fps.join(rare, "fp")
    val a = candidates.as("a"); val b = candidates.as("b")
    dump("q77", a.join(b, col("a.fp") === col("b.fp") && col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("shared_fps"))
      .orderBy("id1", "id2"))
    dump("q103", Similarity.semanticDedup(embs, threshold = 0.95, nClusters = 3)
      .select(col("vec_id")).orderBy("vec_id"))
    import spark.implicits._
    dump("q122", graft.pipeline.Bpe.train(docs, nMerges = 10)
      .toDF("rank", "left", "right", "cnt"))
    spark.stop()
  }
}
