package graft.tools
import graft._
object TimeOps {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val defs = graft.queries.PipelineQueries.benchDefs
    for (name <- args) {
      val fn = defs(name)
      fn(spark, sfDir).count() // warmup
      val ts = (1 to 3).map { _ =>
        val s = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - s) / 1e9 }
      println(f"$name min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
