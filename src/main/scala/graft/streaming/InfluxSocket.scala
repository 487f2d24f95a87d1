package graft.streaming

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** TCP listener for InfluxDB line protocol — the host:port surface a
  * Telegraf `socket_writer` (or `netcat`) points at, feeding the same
  * decode → quota → sink chain every other wire format uses.
  *
  * Reference surface: gateway/src/main/scala/filodb/gateway/
  * GatewayServer.scala:263-300 (setupTCPService) binds a Netty server on
  * `gateway.influx-port`, frames on `\n`, and hands each line to a
  * sharding queue that DROPS when full (numDroppedMessages). Re-expressed
  * for Spark: plain JDK sockets (the decode is not the bottleneck — the
  * Spark job is), a bounded line queue with the same drop-don't-block
  * contract, and a flusher that bridges queued lines into a
  * [[MemoryStream]] so the stream side is a normal `Dataset[String]` the
  * caller wires into [[Gateway.influxSamples]] + an `Ingest` sink. The
  * socket threads never touch Spark; the Spark side never blocks a
  * client's write.
  *
  * Framing matches the reference's `NettySocketHandler(Some('\n'))`:
  * lines split on `\n`, a trailing `\r` is stripped (Telegraf ends lines
  * with `\n`; some writers send `\r\n`), blank lines are ignored.
  * Parse errors are NOT handled here — malformed lines flow through
  * [[Gateway.influxDecode]] as `err` rows, the reference's
  * numInfluxParseErrors-as-data design.
  */
class InfluxSocketServer(spark: SparkSession, port: Int = 0,
                         maxPending: Int = 1 << 16) {
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  /** Lines accepted but not yet bridged to the stream. Bounded: a stalled
    * Spark side sheds load at the gateway edge instead of ballooning the
    * driver heap (the reference's MpscGrowableArrayQueue + drop). */
  private val queue = new LinkedBlockingQueue[String](maxPending)
  private val stream = MemoryStream[String]

  /** numDroppedMessages analogue: lines shed because the queue was full. */
  val droppedLines = new AtomicLong(0L)
  /** numInfluxMessages analogue: lines accepted off the wire. */
  val receivedLines = new AtomicLong(0L)
  /** Lines handed to the stream (== receivedLines - droppedLines once
    * quiesced; the test's readiness probe). */
  val bridgedLines = new AtomicLong(0L)

  private val server = new ServerSocket()
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress(port))

  @volatile private var running = true
  private val conns = ConcurrentHashMap.newKeySet[Socket]()

  def boundPort: Int = server.getLocalPort

  /** The raw line stream (column-less `Dataset[String]`). */
  def lines: Dataset[String] = stream.toDS()

  /** Decoded canonical samples, ready for any `Ingest` sink: the one-line
    * wiring from a listening port to the ingest chain. */
  def samples(defaultTsMs: Long = 0L): DataFrame =
    Gateway.influxSamples(lines.toDF("line"), defaultTsMs)

  private def spawn(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => body, name)
    t.setDaemon(true)
    t.start()
    t
  }

  // accept loop: one reader thread per connection (Telegraf holds few
  // long-lived connections; thousands of clients would want NIO, but the
  // bottleneck is the Spark side either way)
  spawn(s"influx-accept-${server.getLocalPort}") {
    while (running)
      try {
        val s = server.accept()
        conns.add(s)
        spawn(s"influx-conn-${s.getPort}") {
          try {
            val in = new java.io.BufferedReader(
              new java.io.InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
            var line = in.readLine() // frames on \n, strips it
            while (running && line != null) {
              val l = if (line.nonEmpty && line.last == '\r') line.init else line
              if (l.nonEmpty) {
                receivedLines.incrementAndGet()
                if (!queue.offer(l)) droppedLines.incrementAndGet()
              }
              line = in.readLine()
            }
          } catch { case _: java.io.IOException => () // client went away
          } finally { conns.remove(s); try s.close() catch { case _: Exception => () } }
        }
        ()
      } catch { case _: java.io.IOException => () } // closed during accept
  }

  // flusher: drain whatever accumulated into one addData batch — batched
  // so a firehose of single lines becomes a few memory-stream blocks per
  // micro-batch, not one block per line
  spawn(s"influx-flush-${server.getLocalPort}") {
    val buf = new java.util.ArrayList[String](4096)
    while (running || !queue.isEmpty) {
      val first = queue.poll(50L, TimeUnit.MILLISECONDS)
      if (first != null) {
        buf.add(first)
        queue.drainTo(buf, 65535)
        stream.addData(buf.asScala.toSeq)
        bridgedLines.addAndGet(buf.size.toLong)
        buf.clear()
      }
    }
  }

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: Exception => () }
    conns.asScala.foreach(s => try s.close() catch { case _: Exception => () })
  }
}
