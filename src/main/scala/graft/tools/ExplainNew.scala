package graft.tools
import graft._
import graft.queries._

/** Dev: plan audit for this round's new operators. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"===== $name =====")
      (SparkEntry.queries ++ PipelineQueries.benchDefs)(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
