package graft.tools
import graft._
import graft.model.TsTables
object ApiDrive {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val samples = TsTables.eventsAsSamples(spark, "/root/testdata/sf0.001")
    val api = new graft.http.PromApi(spark, samples, 19917).start()
    println(s"LISTENING ${api.boundPort}")
    Thread.sleep(120000)
    api.stop(); spark.stop()
  }
}
