package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.ImageOps
import graft.pipeline.Multimodal

/** Real image decode through the multimodal seam: a JPEG re-encode (and a
  * slight crop) of the same picture must be FOUND by perceptual dedup —
  * the case content digests structurally cannot catch — while non-image
  * payloads keep the bit-exact byte-sampling fallback the DuckDB oracles
  * mirror. Images are rendered deterministically in-fixture (no files). */
class ImageSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4").getOrCreate()
  import spark.implicits._

  /** 90x80 grayscale block pattern: 10x10 constant blocks, adjacent block
    * values always >= 50 apart — every dHash gradient is decisive, so the
    * hash survives JPEG quantization error. `invert` flips all gradients. */
  private def render(invert: Boolean = false): BufferedImage = {
    val img = new BufferedImage(90, 80, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 80; x <- 0 until 90) {
      val v0 = (((x / 10) * 37 + (y / 10) * 11) % 5) * 50
      val v = if (invert) 200 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def enc(img: BufferedImage, fmt: String): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  private lazy val png = enc(render(), "png")
  private lazy val jpeg = enc(render(), "jpg")
  private lazy val cropPng = {
    val full = render()
    enc(full.getSubimage(2, 2, 88, 78), "png")
  }
  private lazy val otherPng = enc(render(invert = true), "png")

  test("magic-byte sniff: real formats yes, text (even 'BM...'-prefixed) no") {
    ImageOps.isImage(png) shouldBe true
    ImageOps.isImage(jpeg) shouldBe true
    ImageOps.isImage("BMW motorcycles are fast and loud on highways".getBytes("UTF-8")) shouldBe false
    ImageOps.isImage("GIF pictures were everywhere in the nineties".getBytes("UTF-8")) shouldBe false
    ImageOps.isImage(Array.emptyByteArray) shouldBe false
  }

  test("dHash of a JPEG re-encode and a 2px crop matches the PNG's (pixels, not bytes)") {
    // the three encodings share NO bytes (different digests)...
    Set(png.toSeq, jpeg.toSeq, cropPng.toSeq).size shouldEqual 3
    // ...but hash the same picture
    val hp = ImageOps.dhash(png)
    java.lang.Long.bitCount(hp ^ ImageOps.dhash(jpeg)) should be <= 4
    java.lang.Long.bitCount(hp ^ ImageOps.dhash(cropPng)) should be <= 4
    // a genuinely different picture is far away
    java.lang.Long.bitCount(hp ^ ImageOps.dhash(otherPng)) should be > 32
  }

  test("perceptualDuplicates finds the JPEG re-encode; exact digest dedup cannot") {
    val media = Seq(
      (0L, "image", png), (3L, "image", jpeg), (6L, "image", cropPng),
      (9L, "image", otherPng))
      .toDF("doc_id", "kind", "bytes")
    val pairs = Multimodal.perceptualDuplicates(media, maxDist = 6, prefixBits = 12)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    pairs shouldEqual Set((0L, 3L), (0L, 6L), (3L, 6L))
    // exact dedup sees four distinct payloads — the re-encode is invisible
    Multimodal.exactDupGroups(media).count() shouldEqual 4L
  }

  test("fallback dHash on non-image payloads is bit-exact to the byte-sampling formula") {
    // the oracle-mirrored stub: cell k = unsigned byte floor(k*len/72),
    // bit (r*8+c) set iff cell(r,9c) > right neighbor — independent
    // reimplementation here guards the DuckDB phash mirror's contract
    def expected(b: Array[Byte]): Long = {
      val cells = Array.tabulate(72)(k =>
        if (b.isEmpty) 0 else b((k.toLong * b.length / 72).toInt) & 0xFF)
      (for (r <- 0 until 8; c <- 0 until 8 if cells(r * 9 + c) > cells(r * 9 + c + 1))
        yield 1L << (r * 8 + c)).foldLeft(0L)(_ | _)
    }
    for (s <- Seq("the solar observatory logged a quiet morning with calm winds today",
                  "a", "", "BMW motorcycles are fast and loud on highways")) {
      val b = s.getBytes("UTF-8")
      ImageOps.dhash(b) shouldEqual expected(b)
    }
    // and the Column surface agrees with the kernel
    val got = Seq((1L, "image", "hello world payload".getBytes("UTF-8")))
      .toDF("doc_id", "kind", "bytes")
      .select(Multimodal.dHash(col("bytes"))).head().getLong(0)
    got shouldEqual expected("hello world payload".getBytes("UTF-8"))
  }

  test("resize: real images re-encode as a w x h PNG; text keeps cyclic tiling") {
    val media = Seq((0L, "image", png), (2L, "video", "abcde".getBytes("UTF-8")))
      .toDF("doc_id", "kind", "bytes")
      .withColumn("meta", struct(lit(90).as("width"), lit(80).as("height"),
        lit(16000).as("sample_rate"), lit(1).as("n_frames")))
    val out = Multimodal.resize(media, 8, 4).orderBy("doc_id").collect()
    val img = ImageIO.read(new java.io.ByteArrayInputStream(out(0).getAs[Array[Byte]]("bytes")))
    (img.getWidth, img.getHeight) shouldEqual ((8, 4))
    val tiled = out(1).getAs[Array[Byte]]("bytes")
    tiled.length shouldEqual 32
    tiled.zipWithIndex.foreach { case (b, i) => b shouldEqual "abcde".getBytes("UTF-8")(i % 5) }
  }

  test("streaming media ingest drops a JPEG re-upload of an indexed PNG on arrival; " +
       "crash-window replay converges") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Ingest
    // a third, genuinely different picture for the batch-2 survivor
    val freshPng = {
      val img = new BufferedImage(90, 80, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 80; x <- 0 until 90) {
        val v = (((x / 10) * 11 + (y / 10) * 37) % 5) * 50
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      enc(img, "png")
    }
    val ms = MemoryStream[(Long, String, Array[Byte])]
    val dir = java.nio.file.Files.createTempDirectory("media_ingest").toString
    val table = "media_pdx"
    spark.sql(s"DROP TABLE IF EXISTS ${table}_phash")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${table}_phash")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    val q = Ingest.startMediaIngestWithPerceptualDedup(
      ms.toDF.toDF("doc_id", "kind", "bytes"), table, s"$dir/sink", s"$dir/ckpt",
      nBuckets = 4, maxDist = 6, prefixBits = 12)
    try {
      ms.addData((1L, "image", png), (2L, "image", otherPng))
      q.processAllAvailable()
      spark.read.parquet(s"$dir/sink").select("doc_id")
        .collect().map(_.getLong(0)).sorted shouldEqual Array(1L, 2L)
      // batch 2: a JPEG re-encode and a 2px crop of the INDEXED picture
      // (different bytes, different digests) are dropped on arrival;
      // the genuinely new picture survives and folds into the index
      ms.addData((10L, "image", jpeg), (11L, "image", cropPng), (12L, "image", freshPng))
      q.processAllAvailable()
      spark.read.parquet(s"$dir/sink").select("doc_id")
        .collect().map(_.getLong(0)).sorted shouldEqual Array(1L, 2L, 12L)
      // crash-window replay (processed marker lost after the index fold):
      // sink unchanged, no duplicate index rows observable via the probe
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/sink/_processed/batch_id=1"), true)
      import spark.implicits._
      Ingest.processMediaBatch(
        Seq((10L, "image", jpeg), (11L, "image", cropPng), (12L, "image", freshPng))
          .toDF("doc_id", "kind", "bytes"),
        1L, table, s"$dir/sink", nBuckets = 4, maxDist = 6, prefixBits = 12)
      spark.read.parquet(s"$dir/sink").select("doc_id")
        .collect().map(_.getLong(0)).sorted shouldEqual Array(1L, 2L, 12L)
      graft.pipeline.CorpusLayout.perceptualDupsAgainstIndex(
          spark, Seq((99L, "image", freshPng)).toDF("doc_id", "kind", "bytes"),
          table, maxDist = 6, prefixBits = 12)
        .collect().map(_.getLong(1)).toSeq shouldEqual Seq(12L) // exactly once
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS ${table}_phash")
    }
  }

  test("decodeFeatures: real images emit luminance features (decoded=true), others the digest stub") {
    val media = Seq((0L, "image", png), (2L, "audio", "some audio bytes".getBytes("UTF-8")))
      .toDF("doc_id", "kind", "bytes")
    val rows = Multimodal.decodeFeatures(media, dim = 8).orderBy("doc_id").collect()
    rows(0).getAs[Boolean]("decoded") shouldBe true
    // block means of the rendered pattern, scaled to [-0.5, 0.5]
    val feats = rows(0).getAs[scala.collection.Seq[Float]]("features")
    feats.foreach(f => f should (be >= -0.5f and be <= 0.5f))
    feats.toSet.size should be > 1 // not constant: real pixel variation
    rows(1).getAs[Boolean]("decoded") shouldBe false
    rows(1).getAs[String]("sig") should have length 32
  }
}
