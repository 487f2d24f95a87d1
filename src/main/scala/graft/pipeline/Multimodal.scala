package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY with typed
  * metadata, processed in partition-batched form (the Scala analogue of
  * `mapInPandas` — one iterator pass per partition, batch-shaped, no
  * per-row JVM boundary crossing).
  *
  * IMAGE decode is REAL: the in-JDK `javax.imageio` registry (java.desktop
  * module — PNG/JPEG/GIF/BMP) decodes actual pixels, so `dHash` /
  * `perceptualDuplicates` / `decodeFeatures` / `resize` operate on
  * luminance planes for encoded images — a JPEG re-encode of the same
  * picture IS found as a near-duplicate, the case byte digests cannot
  * catch (see [[graft.functions.ImageOps]]). AUDIO decode is REAL for PCM
  * containers: WAV/AIFF/AU frames decode through the in-JDK
  * `javax.sound.sampled` (same java.desktop module), and `aHash` /
  * `mediaHash` / `decodeFeatures` operate on the mono energy envelope —
  * a resampled or re-containered copy of the same recording IS found
  * perceptually (see [[graft.functions.AudioOps]]). VIDEO decode is REAL
  * for the JDK's one moving-picture container: animated GIFs composite
  * every frame through the multi-frame `javax.imageio` reader, and
  * `vHash` / `mediaHash` / `decodeFeatures` / `sampleFrames` operate on
  * the composited timeline — a frame-rate-doubled, rescaled or
  * re-palettized copy of the same clip IS found perceptually (see
  * [[graft.functions.VideoOps]]). COMPRESSED audio (MP3/AAC) and
  * compressed video (MP4/WebM) decode remain a clearly-marked
  * deterministic STUB (no such codecs in the JDK): content digest +
  * byte-sampling stand in for the sample/frame planes, with the
  * Spark-side plumbing (schema, modality partitioning, batch iteration)
  * identical to what a real codec would drop into. Undecodable payloads
  * take a byte-sampling fallback bit-identical to the pre-decode stub, so
  * synthetic-fixture oracles are unchanged.
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
    StructField("decoded", BooleanType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Batch decode + featurize. Partition-batched mapPartitions keeps the
    * codec context alive across the whole batch, exactly like a
    * Pandas-UDF batch; repartitioning by modality first lets each
    * executor load one codec. Real encoded images (javax.imageio) emit
    * block-mean luminance features with decoded=true; other payloads
    * (audio/video STUB + synthetic fixtures) emit the digest-derived
    * stand-in features with decoded=false. `sig` is always the payload
    * md5 (content identity is byte identity for exact dedup either way). */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.repartition(col("kind"))
      .select(col("doc_id"), col("kind"), col("bytes"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          md.reset()
          val sig = md.digest(bytes).map("%02x".format(_)).mkString
          // real decode where the JDK has a codec: composited animated-GIF
          // frames (multi-frame javax.imageio — checked FIRST, the still-
          // image sniff also matches GIF magic), still-image pixels
          // (javax.imageio) or PCM audio frames (javax.sound.sampled)
          val vid = graft.functions.VideoOps.features(bytes, dim)
          val img = if (vid != null) vid
                    else graft.functions.ImageOps.features(bytes, dim)
          val real = if (img != null) img
                     else graft.functions.AudioOps.features(bytes, dim)
          // ---- STUB DECODE (compressed audio/video/other) ----: digest-
          // derived fake features; a real codec would emit tensors here.
          val feats = if (real != null) real else Array.tabulate(dim)(i =>
            ((java.lang.Long.parseLong(sig.substring(i * 2, i * 2 + 2), 16) / 255.0f) - 0.5f))
          Row(r.getLong(0), r.getString(1), bytes.length, sig, real != null, feats)
        }
      }(enc)
  }

  /** Resize: real images nearest-neighbor-resample their decoded pixels
    * to w x h and re-encode as PNG; non-image payloads keep the honest
    * deterministic stand-in (cyclic byte tiling to exactly w*h bytes).
    * One native codegen'd expression per row
    * ([[graft.functions.ImageResize]]) — no per-row UDF boundary, no
    * interpreted lambda. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("bytes",
        call_function("image_resize", col("bytes"), lit(w), lit(h)))
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"), col("meta.n_frames").as("n_frames")))

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
    * hash). Real encoded images (PNG/JPEG/GIF/BMP via the in-JDK
    * javax.imageio) hash their decoded LUMINANCE plane, so re-encodes and
    * small edits of the same picture land at small Hamming distance — the
    * case byte digests structurally miss. Non-image payloads take the
    * byte-sampling fallback (cell k samples position floor(k·len/72)),
    * bit-identical to the pre-decode stub, keeping synthetic-fixture
    * oracles unchanged. One native codegen'd expression
    * ([[graft.functions.ImageDHash]]) — one decode per row, inside the
    * whole-stage span. */
  def dHash(bytes: Column): Column = call_function("image_dhash", bytes)

  /** Perceptual AUDIO hash (64-bit energy-envelope difference hash over
    * real decoded PCM — WAV/AIFF/AU via the in-JDK javax.sound.sampled;
    * see [[graft.functions.AudioOps]]). A resampled, gain-changed or
    * AIFF-re-encoded copy of the same recording lands at small Hamming
    * distance while its digest differs completely. Non-audio payloads
    * take the byte-sampling fallback BIT-IDENTICAL to [[dHash]]'s. */
  def aHash(bytes: Column): Column = call_function("audio_ahash", bytes)

  /** Perceptual VIDEO hash (64-bit mean-luminance temporal difference
    * hash over real composited frames — animated GIF via the in-JDK
    * javax.imageio multi-frame reader; see [[graft.functions.VideoOps]]).
    * A frame-rate-doubled, spatially rescaled or palette-requantized copy
    * of the same clip lands at small Hamming distance while its digest
    * differs completely; the frame-reversed clip lands far. Non-video
    * payloads take the byte-sampling fallback BIT-IDENTICAL to
    * [[dHash]]'s (single-frame GIFs hash as stills). */
  def vHash(bytes: Column): Column = call_function("video_thash", bytes)

  /** Kind-dispatched perceptual hash: audio rows hash their decoded PCM
    * energy envelope, video rows their composited temporal luminance
    * envelope, everything else its decoded pixels (all fall back to the
    * same deterministic byte sampling for undecodable payloads, so the
    * dispatch changes nothing on synthetic fixtures). */
  def mediaHash(kind: Column, bytes: Column): Column =
    when(kind === "audio", aHash(bytes))
      .when(kind === "video", vHash(bytes))
      .otherwise(dHash(bytes))

  /** Perceptual near-duplicate pairs per modality: small Hamming distance
    * between dHashes among same-prefix-bucket candidates (the SimHash
    * banding pattern — linear shuffles of (doc_id, kind, 64-bit hash)
    * only, the BINARY never moves; capBuckets bounds degenerate buckets).
    * Same recall caveat as SimHash: a flip inside the prefix bits hides a
    * pair — lower prefixBits for recall, raise for pruning. */
  def perceptualDuplicates(media: DataFrame, maxDist: Int = 6, prefixBits: Int = 12,
                           maxBucketSize: Int = 4096): DataFrame = {
    val mask = (1L << prefixBits) - 1
    val h = media.select(col("doc_id"), col("kind"),
      mediaHash(col("kind"), col("bytes")).as("ph"))
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

  /** Frame sampling for video rows: every nth frame becomes a row.
    * Animated-GIF payloads emit REAL composited frames (PNG-re-encoded,
    * one multi-frame decode per payload regardless of stride — see
    * [[graft.functions.VideoOps.sampleFrames]]); everything else keeps
    * the honest deterministic stub (frame_idx from the declared
    * meta.n_frames, frame bytes = 16-byte payload slices), BIT-IDENTICAL
    * to the pure-SQL version it replaces, so synthetic-fixture oracles
    * are unchanged. Partition-batched like [[decodeFeatures]]. */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = false)))
    val enc = Encoders.row(schema)
    media.filter(col("kind") === "video")
      .select(col("doc_id"), col("bytes"), col("meta.n_frames").as("nf"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]]("bytes")
          val real = graft.functions.VideoOps.sampleFrames(bytes, everyN)
          if (real != null) real.iterator.map { case (i, png) => Row(id, i, png) }
          else {
            val nf = r.getInt(2)
            val len = math.max(bytes.length, 1)
            (0 until nf by everyN).iterator.map { i =>
              val from = i % len
              Row(id, i, bytes.slice(from, math.min(from + 16, bytes.length)))
            }
          }
        }
      }(enc)
  }
}
