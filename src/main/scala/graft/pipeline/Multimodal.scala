package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY with typed
  * metadata, processed in partition-batched form (the Scala analogue of
  * `mapInPandas` — one iterator pass per partition, batch-shaped, no
  * per-row JVM boundary crossing).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (content digest + shape-derived fake
  * features); everything around it — schema, partitioning by modality,
  * batch iteration, feature schema — is the real pipeline a decoder would
  * drop into.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType))))))

  /** Build a deterministic media table from the documents table (stand-in
    * for reading real binary files): payload = utf8 text bytes, modality
    * round-robins by doc_id, metadata derived from length. */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (length(col("text")) % 100 + 1).cast("int").as("n_frames")).as("meta"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("sig", StringType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Batch decode + featurize. Partition-batched mapPartitions keeps the
    * (hypothetical) codec context alive across the whole batch, exactly
    * like a Pandas-UDF batch; repartitioning by modality first lets each
    * executor load one codec. */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.repartition(col("kind"))
      .select(col("doc_id"), col("kind"), col("bytes"))
      .mapPartitions { rows =>
        // real pipeline: codec = Codec.open(kind) once per batch here
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          // ---- STUB DECODE ----: digest + hash-derived fake features.
          // A real decoder would emit pixel/audio tensors here.
          md.reset()
          val sig = md.digest(bytes).map("%02x".format(_)).mkString
          val feats = Array.tabulate(dim)(i =>
            ((java.lang.Long.parseLong(sig.substring(i * 2, i * 2 + 2), 16) / 255.0f) - 0.5f))
          Row(r.getLong(0), r.getString(1), bytes.length, sig, feats)
        }
      }(enc)
  }

  /** "Resize": metadata rewrite + deterministic byte resampling (stub for
    * a pixel resample; keeps output size = w*h so downstream batch shapes
    * are honest). Pure expressions — cyclic tiling is "concat enough
    * copies, slice to w*h", which stays inside codegen instead of crossing
    * a per-row UDF boundary. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val n = w * h
    val len = octet_length(col("bytes"))
    val reps = (lit(n) / greatest(len, lit(1))).cast("int") + 1
    val tiled = aggregate(sequence(lit(1), reps),
      lit(Array.emptyByteArray), (acc, _) => concat(acc, col("bytes")))
    val resampled = when(len === 0, lit(new Array[Byte](n)))
      .otherwise(substring(tiled, 1, n))
    media.withColumn("bytes", resampled)
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"), col("meta.n_frames").as("n_frames")))
  }

  /** Exact media dedup groups by content digest, per modality (the
    * LAION-style first dedup pass over billions of binary payloads):
    * survivors = lowest doc_id per (kind, md5). The BINARY never crosses
    * a shuffle — only (doc_id, kind, 32-hex digest); at 100 TB of media
    * that is the difference between shuffling terabytes and gigabytes. */
  def exactDupGroups(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("kind"), md5(col("bytes")).as("sig"))
      .groupBy(col("kind"), col("sig"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep one row per distinct (kind, content digest) — the lowest id.
    * A doc sits in exactly one digest group, so semi-joining on
    * doc_id == keep_id is exact; the join side is one row per DISTINCT
    * payload (AQE broadcasts it when small, sort-merges when not). */
  def dropExactDuplicates(media: DataFrame): DataFrame =
    media.join(exactDupGroups(media).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "leftsemi")

  /** Perceptual hash (dHash: 8×8 horizontal gradients over a 9×8
    * nearest-neighbor downsample of the image — Krawetz's difference
    * hash). STUB pixel source: the payload BYTES stand in for decoded
    * luminance (a real decoder swaps in the pixel plane; the resampling,
    * gradient and 64-bit packing below are the published algorithm,
    * unchanged). Pure codegen'd expressions; byte k of the 72-cell grid
    * samples position floor(k·len/72) so the WHOLE payload contributes. */
  def dHash(bytes: Column): Column = {
    val len = octet_length(bytes)
    // k * len as LONG: an int product overflows for payloads > ~30 MB
    // (k up to 71 × a 4-byte length)
    def px(k: Int): Column =
      when(len === 0, lit(0L)).otherwise(
        conv(hex(substring(bytes,
          ((lit(k.toLong) * len.cast("long")).cast("double") / 72).cast("int") + 1, lit(1))),
          16, 10).cast("long"))
    val cells = Array.tabulate(8, 9)((r, c) => px(r * 9 + c))
    (0 until 8).flatMap { r =>
      (0 until 8).map { c =>
        when(cells(r)(c) > cells(r)(c + 1), lit(1L << (r * 8 + c))).otherwise(lit(0L))
      }
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Perceptual near-duplicate pairs per modality: small Hamming distance
    * between dHashes among same-prefix-bucket candidates (the SimHash
    * banding pattern — linear shuffles of (doc_id, kind, 64-bit hash)
    * only, the BINARY never moves; capBuckets bounds degenerate buckets).
    * Same recall caveat as SimHash: a flip inside the prefix bits hides a
    * pair — lower prefixBits for recall, raise for pruning. */
  def perceptualDuplicates(media: DataFrame, maxDist: Int = 6, prefixBits: Int = 12,
                           maxBucketSize: Int = 4096): DataFrame = {
    val mask = (1L << prefixBits) - 1
    val h = media.select(col("doc_id"), col("kind"), dHash(col("bytes")).as("ph"))
      .withColumn("__bucket", shiftright(col("ph"), 64 - prefixBits).bitwiseAND(lit(mask)))
    val b = graft.pipeline.Dedup.capBuckets(h, Seq("kind", "__bucket"), maxBucketSize)
    val a = b.as("a"); val bb = b.as("b")
    a.join(bb, col("a.kind") === col("b.kind") && col("a.__bucket") === col("b.__bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", bit_count(col("a.ph").bitwiseXOR(col("b.ph"))))
      .filter(col("dist") <= maxDist)
      .select(col("a.kind").as("kind"), col("a.doc_id").as("id1"),
        col("b.doc_id").as("id2"), col("dist"))
  }

  /** Frame sampling for video rows: every nth frame index becomes a row
    * (frame bytes stubbed as slices of the payload). */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyN))).as("frame_idx"),
        col("bytes"))
      .withColumn("frame_bytes",
        expr("substring(bytes, frame_idx % greatest(octet_length(bytes), 1) + 1, 16)"))
      .drop("bytes")
}
