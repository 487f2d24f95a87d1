package graft.tools
import graft._
import graft.queries._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("===== q02 filter pushdown =====")
    RelationalQueries.defs("q02_filter_pushdown_revenue")(spark, dir).explain("formatted")
    println("===== q04 broadcast join =====")
    RelationalQueries.defs("q04_multi_join_region")(spark, dir).explain("formatted")
    println("===== q50 promql sum rate =====")
    PromEngineQueries.defs("q50_promql_sum_rate_6h")(spark, dir).explain("formatted")
    spark.stop()
  }
}
