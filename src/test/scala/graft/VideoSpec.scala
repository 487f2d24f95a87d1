package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.{ImageOps, VideoOps}
import graft.pipeline.Multimodal
import graft.queries.PipelineFixtures

/** Real multi-frame video decode (animated GIF via the in-JDK multi-frame
  * javax.imageio reader) behind the perceptual hash: re-encodes of the
  * same clip must be FOUND while their digests differ — and non-video
  * payloads must keep the byte-sampling fallback bit-identical to the
  * image expressions'. */
class VideoSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("the sniff is a pure byte function: frame counting walks the GIF " +
       "block structure; stills and text are never video") {
    val Seq(base, doubled, shifted, rev) = PipelineFixtures.videoRows.map(_._3)
    VideoOps.gifFrameCount(base) shouldEqual 65
    VideoOps.gifFrameCount(doubled) shouldEqual 130
    VideoOps.gifFrameCount(rev) shouldEqual 65
    VideoOps.isVideo(base) shouldEqual true
    // a single-frame GIF is a STILL: stays on the image path
    val still = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(
        new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB), "gif", baos)
      baos.toByteArray
    }
    VideoOps.gifFrameCount(still) shouldEqual 1
    VideoOps.isVideo(still) shouldEqual false
    ImageOps.isImage(still) shouldEqual true
    VideoOps.gifFrameCount("GIF89a-but-not-really-a-gif-payload".getBytes) shouldEqual 0
    VideoOps.gifFrameCount("plain text payload".getBytes) shouldEqual 0
    VideoOps.gifFrameCount(null) shouldEqual 0
  }

  test("frame decode is real: composited mean-luminance envelope follows " +
       "the authored staircase") {
    val Seq(base, doubled, shifted, rev) = PipelineFixtures.videoRows.map(_._3)
    val m = VideoOps.frameMeanLums(base)
    m should not be null
    m.length shouldEqual 65
    // uniform-gray frames: each mean IS the authored level (indexed
    // palette round-trips losslessly)
    def gray(w: Int): Int = (((w * 37 + 11) % 13) * 255 / 13 * 85 / 100) + 25
    (0 until 65).foreach(w => m(w) shouldEqual gray(w).toDouble +- 0.01)
    // doubled clip carries each frame twice at 2x scale, same means
    val m2 = VideoOps.frameMeanLums(doubled)
    m2.length shouldEqual 130
    (0 until 65).foreach(w => m2(2 * w) shouldEqual m(w) +- 0.01)
    VideoOps.frameMeanLums("not a gif".getBytes) shouldEqual null
  }

  test("re-encodes of one clip hash close while digests differ; the " +
       "frame-reversed clip hashes far") {
    val Seq(base, doubled, shifted, rev) = PipelineFixtures.videoRows.map(_._3)
    Seq(base, doubled, shifted, rev).map(b =>
      java.security.MessageDigest.getInstance("MD5").digest(b).toSeq)
      .distinct.size shouldEqual 4
    val h = VideoOps.thash(base)
    // frame-rate doubling + 2x upscale resamples the same envelope
    ham(h, VideoOps.thash(doubled)) shouldEqual 0
    // +3 palette shift moves every mean equally: gradients unchanged
    ham(h, VideoOps.thash(shifted)) shouldEqual 0
    // frame reversal is a different clip
    ham(h, VideoOps.thash(rev)) should be > 16
  }

  test("non-video payloads keep the byte-sampling fallback bit-identical " +
       "to image_dhash — kind dispatch changes nothing on synthetic fixtures") {
    val payloads = Seq(
      "short", "a longer synthetic text payload standing in for media bytes", "")
      .map(_.getBytes("UTF-8"))
    payloads.foreach { b =>
      VideoOps.thash(b) shouldEqual ImageOps.dhash(b)
    }
    // an ENCODED STILL labeled kind=video still decodes as pixels through
    // the shared fallback (single-frame GIF / PNG -> ImageOps.dhash)
    val png = PipelineFixtures.imageRows.head._3
    VideoOps.thash(png) shouldEqual ImageOps.dhash(png)
  }

  test("kind-dispatched mediaHash in perceptualDuplicates pairs the video " +
       "re-encodes; decodeFeatures emits real temporal luminances") {
    val media = PipelineFixtures.videoMedia(spark)
    val pairs = Multimodal.perceptualDuplicates(media, maxDist = 6, prefixBits = 12)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldEqual Set((2L, 5L), (2L, 8L), (5L, 8L))
    val feats = Multimodal.decodeFeatures(
        media.withColumn("meta", lit(null).cast(
          Multimodal.mediaSchema("meta").dataType)))
      .select("doc_id", "decoded", "features").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getSeq[Float](2))).toMap
    feats.values.forall(_._1) shouldEqual true // all four decode for real
    // the doubled clip resamples to the same temporal features
    feats(2L)._2 shouldEqual feats(5L)._2
    // and the reversed clip differs
    feats(2L)._2 should not equal feats(11L)._2
  }

  test("sampleFrames emits REAL composited PNG frames for animated GIFs " +
       "and keeps the byte-slice stub for synthetic payloads") {
    import spark.implicits._
    val media = PipelineFixtures.videoMedia(spark)
      .withColumn("meta", lit(null).cast(Multimodal.mediaSchema("meta").dataType))
    val frames = Multimodal.sampleFrames(media, everyN = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    // base clip: frames 0,16,32,48,64 sampled; each is a real PNG
    val baseFrames = frames.filter(_._1 == 2L).sortBy(_._2)
    baseFrames.map(_._2).toSeq shouldEqual Seq(0, 16, 32, 48, 64)
    def gray(w: Int): Int = (((w * 37 + 11) % 13) * 255 / 13 * 85 / 100) + 25
    baseFrames.foreach { case (_, idx, png) =>
      val img = ImageOps.decode(png)
      img should not be null
      img.getWidth shouldEqual 12
      (img.getRGB(5, 5) & 0xFF) shouldEqual gray(idx)
    }
    // synthetic text payload keeps the stub: frame_idx from meta.n_frames,
    // frame bytes = 16-byte payload slices (bit-identical to the SQL form)
    val synth = Multimodal.synthesizeMedia(
      Seq((2L, "a synthetic documentary payload of modest length")).toDF("doc_id", "text"))
    val stub = Multimodal.sampleFrames(synth, everyN = 16)
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2)))
    val text = "a synthetic documentary payload of modest length".getBytes("UTF-8")
    val nf = text.length % 100 + 1
    stub.map(_._1).toSeq shouldEqual (0 until nf by 16).toSeq
    stub.foreach { case (idx, b) =>
      val from = idx % text.length
      b.toSeq shouldEqual text.slice(from, math.min(from + 16, text.length)).toSeq
    }
  }
}
