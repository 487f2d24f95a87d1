package graft.tools
import org.apache.spark.sql.functions._
import graft.model.TsTables
import graft.pipeline.TextAnalysis

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = TsTables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"STAGE $name t=${ts.min}%.2f")
    }
    def fpsFrom(barrier: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val arr = docs
        .select(col("doc_id"), col("lang"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
        .select(col("doc_id"), col("lang"), TextAnalysis.gramsFromTokens(col("toks"), 8).as("grams"))
        .select(col("doc_id"), col("lang"), TextAnalysis.fingerprintsFromGrams(col("grams"), 6).as("fparr"))
      barrier(arr).select(col("doc_id"), col("lang"), explode(col("fparr")).as("fp"))
    }
    time("fps_nobarrier")(fpsFrom(identity).count())
    time("fps_ckpt")(fpsFrom(_.localCheckpoint(false)).count())
    // full winnowing with checkpoint barrier
    def full(fps: org.apache.spark.sql.DataFrame): Long = {
      val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
        .filter(col("n").between(2, 8)).select("fp")
      val candidates = fps.join(rare, "fp")
      val a = candidates.as("a"); val b = candidates.as("b")
      a.join(b, col("a.fp") === col("b.fp") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("shared_fps")).count()
    }
    time("full_nobarrier")(full(fpsFrom(identity)))
    time("full_ckpt")(full(fpsFrom(_.localCheckpoint(false))))
    spark.stop()
  }
}
