package graft.http

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal protobuf wire codec for the Prometheus REMOTE-READ messages —
  * the `/api/v1/read` protobuf+snappy surface (reference
  * http/src/main/scala/filodb/http/PrometheusApiRoute.scala:130, which
  * serves the same route via the prometheus java client lib).
  *
  * No protobuf library resolves in this environment, and the remote-read
  * schema is tiny and frozen (prometheus/prometheus prompb/remote.proto +
  * types.proto — public, stable since 2017), so the five message shapes
  * are encoded/decoded directly against the documented wire format
  * (varint / 64-bit / length-delimited):
  *
  *   ReadRequest  { repeated Query queries = 1; }
  *   Query        { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
  *                  repeated LabelMatcher matchers = 3; }
  *   LabelMatcher { enum Type { EQ=0 NEQ=1 RE=2 NRE=3 } type = 1;
  *                  string name = 2; string value = 3; }
  *   ReadResponse { repeated QueryResult results = 1; }
  *   WriteRequest { repeated TimeSeries timeseries = 1; }
  *   QueryResult  { repeated TimeSeries timeseries = 1; }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  *   Label        { string name = 1; string value = 2; }
  *   Sample       { double value = 1; int64 timestamp = 2; }
  *
  * Decoding skips unknown fields by wire type (hints, accepted response
  * types, exemplars, native histograms), per proto3 rules — a request from
  * a real Prometheus decodes cleanly even though only SAMPLES content is
  * answered. Proto3 default-value elision is honored on encode (zero
  * int64/enum and empty strings are omitted), so our bytes match a
  * canonical library encoding byte-for-byte.
  */
object ProtoWire {

  // ---- generic wire primitives ----------------------------------------

  final class Writer {
    private[ProtoWire] val out = new ByteArrayOutputStream()

    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def key(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)

    def int64(field: Int, v: Long): Unit =
      if (v != 0L) { key(field, 0); varint(v) }
    def enum(field: Int, v: Int): Unit =
      if (v != 0) { key(field, 0); varint(v.toLong) }
    def double(field: Int, v: Double): Unit = {
      // doubles are always written (Sample.value 0.0 would otherwise be
      // ambiguous with absent; Prometheus' own encoder writes it — the
      // one deliberate divergence from default-elision, matching it)
      key(field, 1)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def string(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) bytes(field, s.getBytes(StandardCharsets.UTF_8))
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); varint(b.length.toLong); out.write(b)
    }
    def message(field: Int, m: Writer): Unit = bytes(field, m.toBytes)
    def toBytes: Array[Byte] = out.toByteArray
  }

  final class Reader(val buf: Array[Byte], from: Int, val end: Int) {
    var pos: Int = from
    def hasNext: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var b = 0
      do {
        if (pos >= end)
          throw new IllegalArgumentException(
            s"malformed protobuf: varint overruns enclosing bound (end=$end)")
        b = buf(pos) & 0xFF; pos += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    /** returns (fieldNumber, wireType) */
    def readKey(): (Int, Int) = {
      val k = readVarint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }
    def readDouble(): Double = {
      bounded(8)
      var bits = 0L; var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    /** a corrupt length prefix must fail loudly, not silently consume
      * sibling bytes as message content */
    private def bounded(len: Long): Int = {
      if (len < 0 || pos + len > end)
        throw new IllegalArgumentException(
          s"malformed protobuf: length $len overruns enclosing bound " +
            s"(pos=$pos, end=$end)")
      len.toInt
    }
    /** length-delimited payload as a sub-reader */
    def readMessage(): Reader = {
      val len = bounded(readVarint())
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
    def readString(): String = {
      val len = bounded(readVarint())
      val s = new String(buf, pos, len, StandardCharsets.UTF_8)
      pos += len
      s
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => pos += bounded(8)
      case 2 =>
        // two statements, NOT `pos = pos + bounded(readVarint())`: Scala
        // evaluates the receiver `pos` BEFORE readVarint() advances it,
        // which would under-skip by the length-varint's own byte count
        // and mis-parse payload bytes as field keys (a real Prometheus
        // ReadRequest always carries the unknown `hints` field here)
        val len = bounded(readVarint())
        pos += len
      case 5 => pos += bounded(4)
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ---- remote-read messages --------------------------------------------

  /** LabelMatcher.Type: 0=EQ 1=NEQ 2=RE 3=NRE */
  case class PMatcher(typ: Int, name: String, value: String)
  case class PQuery(startMs: Long, endMs: Long, matchers: Seq[PMatcher])
  case class PReadRequest(queries: Seq[PQuery])
  case class PSample(value: Double, ts: Long)
  case class PSeries(labels: Seq[(String, String)], samples: Seq[PSample])

  def encodeReadRequest(req: PReadRequest): Array[Byte] = {
    val w = new Writer
    req.queries.foreach { q =>
      val qw = new Writer
      qw.int64(1, q.startMs)
      qw.int64(2, q.endMs)
      q.matchers.foreach { m =>
        val mw = new Writer
        mw.enum(1, m.typ); mw.string(2, m.name); mw.string(3, m.value)
        qw.message(3, mw)
      }
      w.message(1, qw)
    }
    w.toBytes
  }

  def decodeReadRequest(b: Array[Byte]): PReadRequest = {
    val r = new Reader(b, 0, b.length)
    val queries = Seq.newBuilder[PQuery]
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val qr = r.readMessage()
        var start = 0L; var end = 0L
        val ms = Seq.newBuilder[PMatcher]
        while (qr.hasNext) qr.readKey() match {
          case (1, 0) => start = qr.readVarint()
          case (2, 0) => end = qr.readVarint()
          case (3, 2) =>
            val mr = qr.readMessage()
            var typ = 0; var name = ""; var value = ""
            while (mr.hasNext) mr.readKey() match {
              case (1, 0) => typ = mr.readVarint().toInt
              case (2, 2) => name = mr.readString()
              case (3, 2) => value = mr.readString()
              case (_, wt) => mr.skip(wt)
            }
            ms += PMatcher(typ, name, value)
          case (_, wt) => qr.skip(wt)
        }
        queries += PQuery(start, end, ms.result())
      case (_, wt) => r.skip(wt)
    }
    PReadRequest(queries.result())
  }

  /** TimeSeries { repeated Label labels = 1; repeated Sample samples = 2; }
    * — the one message shape ReadResponse (inside QueryResult) and
    * WriteRequest both carry. */
  private def writeSeries(parent: Writer, field: Int, s: PSeries): Unit = {
    val tw = new Writer
    s.labels.foreach { case (n, v) =>
      val lw = new Writer
      lw.string(1, n); lw.string(2, v)
      tw.message(1, lw)
    }
    s.samples.foreach { smp =>
      val sw = new Writer
      sw.double(1, smp.value); sw.int64(2, smp.ts)
      tw.message(2, sw)
    }
    parent.message(field, tw)
  }

  private def readSeries(tr: Reader): PSeries = {
    val labels = Seq.newBuilder[(String, String)]
    val samples = Seq.newBuilder[PSample]
    while (tr.hasNext) tr.readKey() match {
      case (1, 2) =>
        val lr = tr.readMessage()
        var n = ""; var v = ""
        while (lr.hasNext) lr.readKey() match {
          case (1, 2) => n = lr.readString()
          case (2, 2) => v = lr.readString()
          case (_, wt) => lr.skip(wt)
        }
        labels += (n -> v)
      case (2, 2) =>
        val sr = tr.readMessage()
        var value = 0.0; var ts = 0L
        while (sr.hasNext) sr.readKey() match {
          case (1, 1) => value = sr.readDouble()
          case (2, 0) => ts = sr.readVarint()
          case (_, wt) => sr.skip(wt)
        }
        samples += PSample(value, ts)
      case (_, wt) => tr.skip(wt)
    }
    PSeries(labels.result(), samples.result())
  }

  /** One QueryResult per request query, in order. */
  def encodeReadResponse(results: Seq[Seq[PSeries]]): Array[Byte] = {
    val w = new Writer
    results.foreach { series =>
      val rw = new Writer
      series.foreach(writeSeries(rw, 1, _))
      w.message(1, rw)
    }
    w.toBytes
  }

  /** Prometheus remote-WRITE request (prompb/remote.proto):
    *   WriteRequest { repeated TimeSeries timeseries = 1; }
    * — the wire every real Prometheus `remote_write` stanza pushes
    * through; same frozen public schema family as the read pair (unknown
    * fields — metadata, exemplars, histograms — skip per proto3 rules). */
  def encodeWriteRequest(series: Seq[PSeries]): Array[Byte] = {
    val w = new Writer
    series.foreach(writeSeries(w, 1, _))
    w.toBytes
  }

  def decodeWriteRequest(b: Array[Byte]): Seq[PSeries] = {
    val r = new Reader(b, 0, b.length)
    val series = Seq.newBuilder[PSeries]
    while (r.hasNext) r.readKey() match {
      case (1, 2) => series += readSeries(r.readMessage())
      case (_, wt) => r.skip(wt)
    }
    series.result()
  }

  def decodeReadResponse(b: Array[Byte]): Seq[Seq[PSeries]] = {
    val r = new Reader(b, 0, b.length)
    val results = Seq.newBuilder[Seq[PSeries]]
    while (r.hasNext) r.readKey() match {
      case (1, 2) =>
        val qr = r.readMessage()
        val series = Seq.newBuilder[PSeries]
        while (qr.hasNext) qr.readKey() match {
          case (1, 2) => series += readSeries(qr.readMessage())
          case (_, wt) => qr.skip(wt)
        }
        results += series.result()
      case (_, wt) => r.skip(wt)
    }
    results.result()
  }
}
