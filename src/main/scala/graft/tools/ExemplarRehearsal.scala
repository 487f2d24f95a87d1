package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.http.{PromApi, ProtoWire, RemoteRead}
import graft.streaming.Ingest
import graft.operators.Quota

/** Exemplar side-table scale rehearsal: per-POST dedup cost vs STANDING
  * EXEMPLAR TABLE size (closes the r11 advisor's "bound the scan"
  * finding with a measurement).
  *
  * For each table size N: seed N exemplar rows spread over `metrics`
  * metric families and `segs` per-commit delta dirs (the worst-case
  * fragmented layout a long-running sink accumulates), then time a real
  * exemplar-carrying POST (sync mode — the commit runs in the handler)
  * against (a) that fragmented layout and (b) the compacted `_exbase`
  * base. The dedup anti-join reads the existing side filtered to the
  * POST's metrics, so with pushdown + compaction the per-POST cost
  * should track the METRIC's exemplar count, not the table size.
  */
object ExemplarRehearsal {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(10000, 100000, 1000000)
    val metrics = 100
    val segs = 64
    val cfg = Quota.QuotaConfig(Seq("metric"), Seq(10000000L))
    println(f"${"exemplar rows"}%14s ${"seed(s)"}%8s ${"post frag(s)"}%13s " +
      f"${"compact(s)"}%11s ${"post base(s)"}%13s")
    for (n <- sizes) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-ex-$n").toString
      val (sink, index, reject, ex) =
        (s"$dir/sink", s"$dir/index", s"$dir/reject", s"$dir/ex")
      val t0 = System.nanoTime()
      val perSeg = math.max(1, n / segs)
      (0 until segs).foreach { s0 =>
        spark.range(perSeg.toLong)
          .select(concat(lit("m"), (col("id") % metrics).cast("string")).as("metric"),
            map().cast("map<string,string>").as("tags"),
            map(lit("trace_id"),
              concat(lit(s"s$s0-"), col("id").cast("string"))).as("exemplar_labels"),
            (lit(s0 * 1000000L) + col("id")).as("ts"),
            col("id").cast("double").as("value"))
          .write.mode("overwrite").parquet(s"$ex/batch_id=$s0")
      }
      val seedSec = (System.nanoTime() - t0) / 1e9
      val ws = PromApi.WriteSink(sink, index, reject, cfg,
        exemplarDir = Some(ex))
      val api = new PromApi(spark, spark.range(0).toDF(), writeSink = Some(ws),
        hwmCompactEvery = 0).start()
      val url = s"http://localhost:${api.boundPort}"
      try {
        def post(tsBase: Long): Double = {
          val series = Seq(ProtoWire.PSeries(
            Seq("__name__" -> "m7"),
            Seq(ProtoWire.PSample(1.0, tsBase)),
            exemplars = (0 until 10).map(i => ProtoWire.PExemplar(
              Seq("trace_id" -> s"new-$tsBase-$i"), i.toDouble, tsBase + i))))
          val t = System.nanoTime()
          RemoteRead.remoteWriteSeries(series, url)
          (System.nanoTime() - t) / 1e9
        }
        post(900000000L) // warmup (codegen/JIT), not reported
        val frag = post(910000000L)
        val tC = System.nanoTime()
        Ingest.compactExemplars(spark, ex)
        val compactSec = (System.nanoTime() - tC) / 1e9
        val base = post(920000000L)
        println(f"$n%14d $seedSec%8.2f $frag%13.2f $compactSec%11.2f $base%13.2f")
      } finally api.stop()
    }
    spark.stop()
    sys.exit(0)
  }
}
