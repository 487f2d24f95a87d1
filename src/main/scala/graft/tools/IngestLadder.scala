package graft.tools

import graft.GraftSession
import graft.http.{PromApi, ProtoWire}
import graft.operators.Quota

/** Ingest-throughput ladder: where is the acked-samples/s ceiling, and
  * what is it made of?
  *
  * The r14 qi block recorded 9-12k acked samples/s — but with ONE
  * synchronous sender, so the figure conflates per-POST round-trip
  * latency with server capacity. This rehearsal separates them:
  *
  *  1. COMPONENT micro-bench (driver-side, no HTTP): snappy+full-decode
  *     vs snappy+structural-walk per 1000-sample payload — the ack path's
  *     CPU term (spool mode acks on walk + durable spool append; the full
  *     decode runs once, at drain).
  *  2. SENDER LADDER: N concurrent senders (N = 1, 2, 4, 8, 16) POSTing
  *     pre-encoded 100-series x 10-sample v1 WriteRequests against a
  *     spool-mode server (drainer live, permits sized to the ladder rung)
  *     for a fixed window; acked samples/s per rung. A rung that scales
  *     ~linearly means the single-sender figure was latency-bound, not a
  *     server ceiling; the knee is the real capacity.
  *
  * Output: one line per rung + component table + a floor-analysis line,
  * consumed by BENCH.md.
  *
  * Usage: runMain graft.tools.IngestLadder [windowSecPerRung]
  */
object IngestLadder {

  def main(args: Array[String]): Unit = {
    val windowSec = if (args.nonEmpty) args(0).toInt else 6
    // rungs + drain caps + core count as args so the drain-throughput
    // experiment can vary the group-commit window AND prove the
    // committed rate scales with cores without a rebuild:
    //   runMain graft.tools.IngestLadder 6 1,8 2048 32
    val rungs = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                else Seq(1, 2, 4, 8, 16)
    val drainMaxFiles = if (args.length > 2) args(2).toInt else 256
    val cores = if (args.length > 3) args(3).toInt else 8
    val spark = GraftSession.builder(s"local[$cores]", cores.toString).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nSeries = 100
    val nSamplesPerSeries = 10
    val samplesPerPost = nSeries * nSamplesPerSeries

    // pre-encoded payload pool: distinct timestamps per payload so the
    // drain does realistic hwm work, client CPU out of the measurement
    val t0 = 1704067200000L
    def payload(k: Int): Array[Byte] =
      org.xerial.snappy.Snappy.compress(ProtoWire.encodeWriteRequest(
        (0 until nSeries).map { i =>
          ProtoWire.PSeries(
            Seq("__name__" -> "ladder", "instance" -> i.toString),
            (0 until nSamplesPerSeries).map { j =>
              ProtoWire.PSample(1.0, t0 + (k.toLong * nSamplesPerSeries + j) * 1000L)
            })
        }))
    val pool = (0 until 256).map(payload).toArray

    // ---- component micro-bench --------------------------------------
    def bench(label: String, iters: Int)(f: Array[Byte] => Unit): Double = {
      (0 until 50).foreach(i => f(pool(i % pool.length))) // warm
      val s0 = System.nanoTime()
      (0 until iters).foreach(i => f(pool(i % pool.length)))
      val perPost = (System.nanoTime() - s0) / 1e6 / iters
      println(f"[ladder] component $label%-22s ${perPost}%8.3f ms/POST " +
        f"(${samplesPerPost / (perPost / 1000)}%,.0f samples/s single-thread)")
      perPost
    }
    val decodeMs = bench("snappy+full-decode", 400) { b =>
      ProtoWire.decodeWriteRequest(org.xerial.snappy.Snappy.uncompress(b))
    }
    val walkMs = bench("snappy+walk-count", 400) { b =>
      ProtoWire.countWriteRequest(org.xerial.snappy.Snappy.uncompress(b), isV2 = false)
    }

    // ---- sender ladder ------------------------------------------------
    val results = rungs.map { senders =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-ladder-$senders").toString
      val ws = PromApi.WriteSink(s"$dir/sink", s"$dir/index", s"$dir/reject",
        Quota.QuotaConfig(Seq("metric"), Seq(10000000L)))
      val api = new PromApi(spark, spark.range(0).toDF(), writeSink = Some(ws),
        spoolDrainMs = 100L, hwmCompactEvery = 8,
        spoolDrainMaxFiles = drainMaxFiles,
        spoolDrainMaxBytes = drainMaxFiles.toLong * 1L << 20,
        httpThreads = senders + 4, maxInFlightWrites = senders).start()
      try {
        val url = java.net.URI.create(s"http://localhost:${api.boundPort}/api/v1/write")
        val acked = new java.util.concurrent.atomic.AtomicLong(0)
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val threads = (0 until senders).map { s =>
          val t = new Thread(() => {
            val client = java.net.http.HttpClient.newHttpClient()
            var k = s
            while (!stop.get()) {
              val code = client.send(
                java.net.http.HttpRequest.newBuilder(url)
                  .header("Content-Type", "application/x-protobuf")
                  .header("Content-Encoding", "snappy")
                  .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(
                    pool(k % pool.length))).build(),
                java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
              if (code == 204) acked.addAndGet(samplesPerPost.toLong)
              k += senders
            }
          }, s"ladder-sender-$s")
          t.setDaemon(true); t
        }
        // warm the path (JIT + first spool create) before the timed window
        threads.foreach(_.start())
        Thread.sleep(1500)
        acked.set(0)
        val w0 = System.nanoTime()
        Thread.sleep(windowSec * 1000L)
        val got = acked.get()
        val sec = (System.nanoTime() - w0) / 1e9
        stop.set(true)
        threads.foreach(_.join(3000))
        // DRAIN throughput: the sustained end-to-end (committed-to-sink)
        // floor — acks are durability acks, the group-commit drain is
        // what must keep up long-run. Measured over the backlog actually
        // left at window end (the 100 ms drainer consumed some already).
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val backlog = (try fs.listStatus(
            new org.apache.hadoop.fs.Path(s"$dir/sink/_spool"))
          .count(st => st.getPath.getName.endsWith(".wr") ||
            st.getPath.getName.endsWith(".wr2"))
          catch { case _: Exception => 0 }).toLong * samplesPerPost
        val d0 = System.nanoTime()
        api.drainSpool()
        val drainSec = (System.nanoTime() - d0) / 1e9
        val rate = got / sec
        val drainRate = backlog / math.max(drainSec, 1e-9)
        println(f"[ladder] senders=$senders%2d acked=${rate}%,.0f samples/s " +
          f"(${rate / samplesPerPost}%.0f POSTs/s); drain backlog " +
          f"${backlog}%,d samples in ${drainSec}%.1f s = " +
          f"${drainRate}%,.0f samples/s committed (maxFiles=$drainMaxFiles)")
        (senders, rate, drainRate)
      } finally api.stop()
    }

    // ---- floor analysis ----------------------------------------------
    val r1 = results.head._2
    val best = results.maxBy(_._2)
    val bestDrain = results.map(_._3).max
    println(f"[ladder] single-sender ${r1}%,.0f samples/s; best " +
      f"${best._2}%,.0f at ${best._1} senders (${best._2 / r1}%.1fx); " +
      f"best committed (drain) ${bestDrain}%,.0f samples/s")
    println(f"[ladder] ack-path CPU: walk ${walkMs}%.3f ms vs full decode " +
      f"${decodeMs}%.3f ms per 1000-sample POST (${decodeMs / walkMs}%.1fx)")
    println("""{"metric":"ingest_ladder","unit":"samples_per_sec","rungs":{""" +
      results.map { case (s, r, _) => s""""$s":${r.toLong}""" }.mkString(",") +
      s"""},"drain_committed_samples_per_sec":${bestDrain.toLong},""" +
      s""""walk_ms":$walkMs,"decode_ms":$decodeMs}""")
    spark.stop()
    sys.exit(0)
  }
}
