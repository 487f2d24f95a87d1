package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Gateway wire-format decode: InfluxDB line protocol → the canonical
  * samples shape, the seam the reference's gateway keeps between raw
  * socket lines and its ingest records (gateway/src/main/scala/filodb/
  * gateway/GatewayServer.scala:64 routing into conversion/
  * InfluxProtocolParser.scala). Semantics mirrored from the reference
  * parser:
  *
  *   measurement[,tag=v,...] field=v[,field2=v2,...] [timestamp_ns]
  *
  *  - `\` escapes the NEXT character anywhere in names/tags/keys
  *    (InfluxProtocolParser.parseInner's Escape branch copies the next
  *    byte verbatim);
  *  - field values: `"..."` quoted strings, `123i` integer suffix,
  *    otherwise double (InfluxFieldVisitor);
  *  - nanosecond timestamps truncate to ms by dropping the last 6
  *    digits (parseUnixTime); a missing timestamp takes the caller's
  *    `defaultTsMs` — an explicit argument, NOT System.currentTimeMillis,
  *    so batches and replays are deterministic;
  *  - a single numeric field → one Prom-style sample, counter schema
  *    when the field key is `counter`, else gauge
  *    (InfluxPromSingleRecord.schema);
  *  - multiple fields → histogram decomposition
  *    (InfluxHistogramRecord): numeric field KEYS are `le` bucket
  *    bounds → `<m>_bucket{le=...}` rows, `sum`/`count` →
  *    `<m>_sum`/`<m>_count`, and a `+Inf` bucket is synthesized from
  *    `count` when absent — landing directly in the hist-to-prom-vector
  *    shape the query engine already serves (q73/q78);
  *  - empty measurement / no numeric fields / malformed timestamp →
  *    the line is REJECTED with a reason (the gateway's
  *    numInfluxParseErrors counter, as data instead of a metric).
  *
  * The decode itself is per-line imperative scalar work (escape-aware
  * single pass, like the reference's byte parser) on a typed Dataset
  * flatMap: stateless, fully distributed, no shuffle — the rare seam
  * where row-at-a-time code is the honest shape. Everything downstream
  * stays declarative.
  */
object Gateway {

  /** One decoded sample row, or (line, err) for a reject. */
  case class Decoded(metric: String, tags: Map[String, String], ts: Long,
                     value: Double, kind: String, line: String, err: String)

  /** Split on an unescaped delimiter, PRESERVING `\x` sequences so the
    * downstream k=v split still sees which chars were escaped (the
    * reference does delimitation and un-escaping in one pass; two passes
    * need the escapes kept until the last split). */
  private def splitUnescaped(s: String, delim: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur.append(c).append(s.charAt(i + 1)); i += 2 }
      else if (c == delim) { out += cur.result(); cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    out += cur.result()
    out.result()
  }

  /** Split into the (up to 3) space-separated sections WITHOUT
    * unescaping — sections are parsed further. Quoted field values may
    * contain raw spaces, so quotes toggle splitting off. */
  private def sections(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) { cur.append(c).append(line.charAt(i + 1)); i += 2 }
      else if (c == '"') { inQuote = !inQuote; cur.append(c); i += 1 }
      else if (c == ' ' && !inQuote) { out += cur.result(); cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    out += cur.result()
    out.result().filter(_.nonEmpty)
  }

  private def kv(piece: String): Option[(String, String)] = {
    // the k=v split must also be escape-aware: k\=1=v has key "k=1"
    val parts = {
      val out = Seq.newBuilder[String]
      val cur = new StringBuilder
      var i = 0
      var done = false
      while (i < piece.length) {
        val c = piece.charAt(i)
        if (c == '\\' && i + 1 < piece.length) { cur.append(c).append(piece.charAt(i + 1)); i += 2 }
        else if (c == '=' && !done) { out += cur.result(); cur.clear(); done = true; i += 1 }
        else { cur.append(c); i += 1 }
      }
      out += cur.result()
      out.result()
    }
    if (parts.length == 2 && parts(0).nonEmpty) Some((unescape(parts(0)), parts(1)))
    else None
  }

  private def unescape(s: String): String = {
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 2 }
      else { cur.append(c); i += 1 }
    }
    cur.result()
  }

  /** Field value → Some(double): strips the `i` integer suffix, rejects
    * quoted strings (string fields carry no sample). */
  private def numericField(raw: String): Option[Double] = {
    val v = unescape(raw)
    if (v.isEmpty || v.startsWith("\"")) None
    else {
      val body = if (v.endsWith("i")) v.dropRight(1) else v
      try Some(body.toDouble) catch { case _: NumberFormatException => None }
    }
  }

  /** ns → ms by dropping the last 6 digits (reference parseUnixTime). */
  private def parseTsMs(s: String): Option[Long] =
    if (s.nonEmpty && s.forall(_.isDigit))
      Some(if (s.length <= 6) 0L else s.dropRight(6).toLong)
    else None

  private def reject(line: String, why: String) =
    Seq(Decoded(null, null, 0L, 0.0, null, line, why))

  /** Decode ONE line to sample rows (err=null) or one reject row. */
  def parseInflux(line: String, defaultTsMs: Long): Seq[Decoded] = {
    val secs = sections(line.trim)
    if (secs.isEmpty || line.trim.isEmpty) return reject(line, "empty line")
    if (secs.length < 2) return reject(line, "no fields")
    if (secs.length > 3) return reject(line, "too many sections")
    val keyParts = splitUnescaped(secs.head, ',')
    val measurement = unescape(keyParts.head)
    if (measurement.isEmpty) return reject(line, "empty measurement")
    val tagPairs = keyParts.tail.map(p => kv(p).map { case (k, v) => k -> unescape(v) })
    if (tagPairs.exists(_.isEmpty)) return reject(line, "malformed tag")
    val tags = tagPairs.flatten.toMap
    val fieldPairs = splitUnescaped(secs(1), ',').map(kv)
    if (fieldPairs.exists(_.isEmpty)) return reject(line, "malformed field")
    val fields = fieldPairs.flatten
    val ts = if (secs.length == 3) parseTsMs(secs(2)) match {
      case Some(t) => t
      case None => return reject(line, "malformed timestamp")
    } else defaultTsMs
    val numeric = fields.flatMap { case (k, v) => numericField(v).map(k -> _) }
    if (numeric.isEmpty) return reject(line, "no numeric fields")
    if (numeric.length == 1) {
      val kind = if (numeric.head._1 == "counter") "counter" else "gauge"
      Seq(Decoded(measurement, tags, ts, numeric.head._2, kind, null, null))
    } else {
      // histogram decomposition: numeric KEYS are le bounds
      val buckets = numeric.filter { case (k, _) =>
        k == "+Inf" || scala.util.Try(k.toDouble).isSuccess
      }
      val sum = numeric.find(_._1 == "sum")
      val count = numeric.find(_._1 == "count")
      val bucketRows = buckets.map { case (le, v) =>
        Decoded(s"${measurement}_bucket", tags + ("le" -> le), ts, v, "hist", null, null)
      }
      val infRow = if (count.isDefined && !buckets.exists(_._1 == "+Inf"))
        Seq(Decoded(s"${measurement}_bucket", tags + ("le" -> "+Inf"), ts,
          count.get._2, "hist", null, null))
      else Nil
      val sumCnt = sum.map(s => Decoded(s"${measurement}_sum", tags, ts, s._2, "hist", null, null)).toSeq ++
        count.map(c => Decoded(s"${measurement}_count", tags, ts, c._2, "hist", null, null)).toSeq
      val others = numeric.filterNot(f => buckets.contains(f) || f._1 == "sum" || f._1 == "count")
        .map { case (k, v) => Decoded(s"${measurement}_$k", tags, ts, v, "gauge", null, null) }
      bucketRows ++ infRow ++ sumCnt ++ others
    }
  }

  /** Decode a frame of raw lines (column `line`, batch or streaming).
    * Good rows have err null; rejects keep the offending line + reason
    * (filter on `err` for the parse-error counter). */
  def influxDecode(lines: DataFrame, defaultTsMs: Long): Dataset[Decoded] = {
    import lines.sparkSession.implicits._
    lines.select(col("line").cast("string")).as[String]
      .flatMap(parseInflux(_, defaultTsMs))
  }

  /** Good samples in the canonical shape, ready for Ingest-style sinks:
    * (series_id, metric, tags, ts, value, kind). */
  def influxSamples(lines: DataFrame, defaultTsMs: Long): DataFrame =
    influxDecode(lines, defaultTsMs).filter(col("err").isNull)
      .withColumn("series_id",
        xxhash64(col("metric"), to_json(array_sort(map_entries(col("tags"))))))
      .select(col("series_id"), col("metric"), col("tags"), col("ts"),
        col("value"), col("kind"))

  /** Per-batch reject counts by reason — numInfluxParseErrors as data. */
  def influxRejectStats(lines: DataFrame, defaultTsMs: Long): DataFrame =
    influxDecode(lines, defaultTsMs).filter(col("err").isNotNull)
      .groupBy(col("err")).agg(count(lit(1)).as("n_lines"))
}
