package graft.tools

import graft.GraftSession
import graft.model.TsTables
import graft.pipeline.Bpe

/** Dev probe (r17): where do Bpe.train's 32 iterations spend time —
  * codegen compile (fresh literals → fresh class per round) vs the tiny
  * shuffle vs scheduling? Times train at several merge counts so the
  * per-iteration slope is measurable, with and without whole-stage
  * codegen. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = TsTables.documents(spark, dir)
    docs.count() // warm the scan

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }
      println(f"BPEPROBE $label ${ts.min}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("train n=1 ") { Bpe.train(docs, 1) }
    time("train n=8 ") { Bpe.train(docs, 8) }
    time("train n=32") { Bpe.train(docs, 32) }

    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("train n=32 noWSCG") { Bpe.train(docs, 32) }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("train n=32 noAQE ") { Bpe.train(docs, 32) }
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    val vocab = Bpe.wordCounts(docs).count()
    println(s"BPEPROBE vocab rows=$vocab")
    spark.stop()
    sys.exit(0)
  }
}
