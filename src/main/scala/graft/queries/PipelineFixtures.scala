package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic planted corpora for the hash-sketch pipeline operators.
  *
  * xxhash64-based sketches (MinHash/SimHash/LSH planes) and the KMeans IVF
  * index are not reproducible in DuckDB SQL, so their correctness gate is
  * golden-fixture: a corpus with PLANTED near-duplicates / neighbor
  * structure, checked against the exact expected pair/neighbor sets as
  * inline oracle tables. The real-corpus runs of the same operators stay on
  * the bench path (PipelineQueries.benchDefs) so their scale behavior is
  * still measured per round.
  *
  * Everything here is literal or integer-arithmetic-derived — no RNG, no
  * time — so outputs are bit-stable across sessions and parallelism.
  */
object PipelineFixtures {

  /** 12 docs: d0/d1/d2 a near-dup cluster (d2 exact copy of d0), d3/d4 a
    * second cluster, d5-d9 unrelated, d10/d11 share one long verbatim
    * passage (winnowing bait) inside different surroundings. */
  private val docRows: Seq[(Int, String, String)] = Seq(
    (0, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
    (1, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau phi"),
    (2, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
    (3, "en", "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"),
    (4, "en", "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen nineteen twenty"),
    (5, "en", "the quick brown fox jumps over a lazy dog near the riverbank at dawn every single morning"),
    (6, "en", "sparkling galaxies rotate slowly around invisible centers while astronomers chart their spiral arms patiently"),
    (7, "en", "fresh sourdough bread requires patient fermentation long kneading and a very hot stone oven floor"),
    (8, "en", "mountain glaciers carve deep valleys over millennia leaving moraines and cold clear lakes behind them"),
    (9, "en", "database engines trade write amplification against read latency using trees logs and clever caches"),
    (10, "en", "intro words here then the shared secret passage hides twelve golden keys under the old stone bridge tonight and nothing else"),
    (11, "en", "completely different opening before the shared secret passage hides twelve golden keys under the old stone bridge tonight closing words")
  )

  def docs(s: SparkSession): DataFrame = {
    import s.implicits._
    docRows.toDF("doc_id", "lang", "text")
  }

  /** Containment fixture (q162): doc 1 verbatim-embedded inside doc 2,
    * doc 3 unrelated — only (1 in 2) reaches the threshold. */
  val containRows: Seq[(Long, String)] = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"),
    (2L, "intro words before the quote begins alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau " +
      "upsilon and several closing remarks after the embedded passage ends here"),
    (3L, "wholly unrelated content discussing bucketed parquet layouts and " +
      "exchange free joins across standing index tables with deterministic admission"))

  def containDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    containRows.toDF("doc_id", "text")
  }

  /** 24 vectors in 8 dims, three well-separated direction clusters
    * (i % 3), with small integer-derived per-vector perturbations; same-
    * cluster cosines are high (planted near-dups), cross-cluster low. */
  private val embRows: Seq[(Int, Array[Float])] = (0 until 24).map { i =>
    val c = i % 3
    val base = c match {
      case 0 => Array(1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0)
      case 1 => Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0)
      case _ => Array(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.5, 0.0)
    }
    val v = Array.tabulate(8)(d => (base(d) + 0.02 * (((i / 3) * 7 + d) % 5)).toFloat)
    (i, v)
  }

  def embs(s: SparkSession): DataFrame = {
    import s.implicits._
    // single partition keeps KMeans aggregation order (and thus the IVF
    // index) identical under any session parallelism
    embRows.toDF("vec_id", "embedding").repartition(1)
  }

  /** Planted near-duplicate edge list for connected components: a CHAIN
    * 100..110 (10 hops — forces multi-round convergence, the case a naive
    * one-round min-join gets wrong), a triangle {0,1,2}, a star centered
    * at 20, an isolated pair {50,51}, and a bridge 7-110 merging the chain
    * into 7's pair {7,8}. Duplicate/reversed edges included on purpose. */
  val edgeRows: Seq[(Long, Long)] =
    (100L until 110L).map(i => (i, i + 1)) ++
      Seq((0L, 1L), (1L, 2L), (2L, 0L),
          (20L, 21L), (20L, 22L), (20L, 23L), (23L, 20L),
          (50L, 51L),
          (7L, 8L), (110L, 7L))

  def edges(s: SparkSession): DataFrame = {
    import s.implicits._
    edgeRows.toDF("id1", "id2")
  }

  /** The edge fixture as an inline DuckDB VALUES relation. */
  def edgeValuesSql: String =
    edgeRows.map { case (a, b) => s"($a, $b)" }.mkString("(VALUES ", ", ", ") e(id1, id2)")

  /** Incremental batch on top of [[edgeRows]] (q164): an edge MERGING two
    * existing components (star 20-23 with triangle 0-2), a brand-new pair,
    * a redundant edge inside the chain component (must be a no-op), and a
    * bridge attaching a brand-new node to the chain. */
  val newEdgeRows: Seq[(Long, Long)] =
    Seq((21L, 2L), (300L, 301L), (105L, 107L), (108L, 400L))

  def newEdges(s: SparkSession): DataFrame = {
    import s.implicits._
    newEdgeRows.toDF("id1", "id2")
  }

  def newEdgeValuesSql: String =
    newEdgeRows.map { case (a, b) => s"($a, $b)" }.mkString("(VALUES ", ", ", ") n(id1, id2)")

  /** Planted PII rows (unioned with the real corpus in q109 so the
    * redaction operator has non-trivial matches; mirrored verbatim as
    * VALUES in the oracle). doc_ids start at 1e6 to stay clear of any
    * scale factor's id range. */
  val piiRows: Seq[(Long, String)] = Seq(
    (1000000L, "contact alice.smith+test@example.com or bob@sub.domain.org for details"),
    (1000001L, "server 192.168.1.100 and 10.0.0.1 up; call 555-867-5309 or 555.123.4567 now"),
    (1000002L, "no personal information in this row just plain words"))

  def piiDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    piiRows.toDF("doc_id", "text")
  }

  /** Planted multi-line pages for the C4 filter battery (q114): exercises
    * terminal-punctuation/short-line fractions, code/boilerplate markers,
    * and the policy-page phrases the real single-line corpus can't. */
  val c4Rows: Seq[(Long, String)] = Seq(
    (1100000L, "This is a proper sentence. And another follows it!\nShort line\nWe value your privacy policy compliance."),
    (1100001L, "function foo() { return 42; }\nlorem ipsum dolor sit amet consetetur."),
    (1100002L, "Clean page with sentences. It has three of them. Yes it truly does."),
    (1100003L, "no punctuation here at all\njust fragments"))

  def c4Docs(s: SparkSession): DataFrame = {
    import s.implicits._
    c4Rows.toDF("doc_id", "text")
  }

  /** The same rows as an inline DuckDB relation (newlines emitted as
    * chr(10) concatenations so the SQL stays single-line). Generated from
    * c4Rows so the two sides cannot drift. */
  def c4ValuesSql: String =
    c4Rows.map { case (id, t) => s"($id, ${textLiteralSql(t)})" }
      .mkString("(VALUES ", ", ", ") c4v(doc_id, text)")

  /** Planted multi-line pages for corpus-level line dedup (q131): a
    * boilerplate footer shared by three docs (with case + surrounding-
    * whitespace variants so normalization is exercised), a line repeated
    * WITHIN one doc, blank lines, and unique content. The real corpus
    * (single-line docs) rides along underneath in the query. */
  val lineRows: Seq[(Long, String)] = Seq(
    (1200000L, "Unique opening thoughts on glaciers.\n\nSubscribe to our newsletter today!\nMore unique glacier content here."),
    (1200001L, "Different page about sourdough baking.\n  subscribe to our newsletter today!  \nCrumb structure depends on hydration."),
    (1200002L, "SUBSCRIBE TO OUR NEWSLETTER TODAY!\nA third page with its own words.\nRepeated local line of text.\nRepeated local line of text."),
    (1200003L, "Entirely original page with no shared lines.\n\nNothing here repeats anywhere."))

  def lineDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    lineRows.toDF("doc_id", "text")
  }

  /** The line-dedup rows as an inline DuckDB relation. */
  def lineValuesSql: String =
    lineRows.map { case (id, t) => s"($id, ${textLiteralSql(t)})" }
      .mkString("(VALUES ", ", ", ") lv(doc_id, text)")

  /** Planted perceptual near-duplicates for media dHash (q138): ASCII,
    * EQUAL length, ids ≡ 2 mod 3 (all land in the `video` modality), with
    * single-character / single-word edits early in the payload so the
    * trailing-bytes prefix bucket stays shared. */
  val phashRows: Seq[(Long, String)] = Seq(
    (1300002L, "the solar observatory logged a quiet morning with calm winds today"),
    (1300005L, "the solar observatory logged a quiet evening with calm winds today"),
    (1300008L, "the solar observatory jogged a quiet morning with calm winds today"),
    (1300011L, "completely different payload about glacier carving and moraine lakes"))

  def phashDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    phashRows.toDF("doc_id", "text")
  }

  def phashValuesSql: String =
    phashRows.map { case (id, t) => s"($id, ${textLiteralSql(t)})" }
      .mkString("(VALUES ", ", ", ") phv(doc_id, text)")

  /** A text value as a single-line DuckDB expression (newlines → chr(10)). */
  private def textLiteralSql(t: String): String =
    t.split("\n", -1).map(p => "'" + p.replace("'", "''") + "'")
      .mkString(" || chr(10) || ")

  /** REAL encoded images for the pixel-decode perceptual gate (q166),
    * rendered deterministically in-process (no files, no RNG): a 90x80
    * block pattern whose adjacent 10x10 blocks always differ by >= 50
    * luminance — every dHash gradient is decisive, so the hash survives
    * JPEG quantization. Docs 0/3/6 are the SAME picture as PNG, JPEG
    * re-encode and 2px-crop PNG (three byte-distinct payloads, three
    * distinct digests); doc 9 is the gradient-inverted picture. Expected
    * by construction: exactly the {0,3,6} pairs match perceptually. */
  def imageRows: Seq[(Long, String, Array[Byte])] = {
    def render(invert: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        90, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 80; x <- 0 until 90) {
        val v0 = (((x / 10) * 37 + (y / 10) * 11) % 5) * 50
        val v = if (invert) 200 - v0 else v0
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    val full = render(invert = false)
    Seq(
      (0L, "image", enc(full, "png")),
      (3L, "image", enc(full, "jpg")),
      (6L, "image", enc(full.getSubimage(2, 2, 88, 78), "png")),
      (9L, "image", enc(render(invert = true), "png")))
  }

  def imageMedia(s: SparkSession): DataFrame = {
    import s.implicits._
    imageRows.toDF("doc_id", "kind", "bytes")
  }

  /** REAL PCM audio for the audio-decode perceptual gate (q169),
    * synthesized deterministically in-process (no files, no RNG): a 1 s
    * 440 Hz tone amplitude-modulated by a staircase envelope that takes a
    * DISTINCT level on each of the 65 hash windows (levels differ by
    * >= 7%, so every energy-envelope gradient is decisive — the audio
    * analogue of imageRows' >= 50-luminance blocks). Docs 1/4/7 are the
    * SAME recording as 8320 Hz WAV, 2x-resampled 16640 Hz WAV (linear
    * interpolation) and AIFF re-container (three byte-distinct payloads,
    * three distinct digests); doc 10 is the time-REVERSED envelope — a
    * different recording. Expected by construction: exactly the {1,4,7}
    * pairs match perceptually. */
  def audioRows: Seq[(Long, String, Array[Byte])] = {
    val nWin = 65
    val perWin = 128
    val n = nWin * perWin // 8320 samples @ 8320 Hz = 1 s
    def level(k: Int): Double = ((k * 37 + 11) % 13) / 13.0 * 0.85 + 0.1
    def synth(reverse: Boolean): Array[Float] = Array.tabulate(n) { i =>
      val w = i / perWin
      val lv = level(if (reverse) nWin - 1 - w else w)
      (lv * math.sin(2 * math.Pi * 440.0 * i / n)).toFloat
    }
    def upsample2x(s: Array[Float]): Array[Float] = {
      val out = new Array[Float](s.length * 2)
      var i = 0
      while (i < s.length) {
        out(2 * i) = s(i)
        val next = if (i + 1 < s.length) s(i + 1) else s(i)
        out(2 * i + 1) = (s(i) + next) / 2
        i += 1
      }
      out
    }
    def enc(samples: Array[Float], rate: Float,
            typ: javax.sound.sampled.AudioFileFormat.Type,
            bigEndian: Boolean): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      val buf = java.nio.ByteBuffer.wrap(pcm).order(
        if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(v => buf.putShort(
        math.max(-32768, math.min(32767, math.round(v * 32767.0))).toShort))
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        rate, 16, 1, 2, rate, bigEndian)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in, typ, baos)
      baos.toByteArray
    }
    val base = synth(reverse = false)
    val Wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val Aiff = javax.sound.sampled.AudioFileFormat.Type.AIFF
    Seq(
      (1L, "audio", enc(base, 8320f, Wave, bigEndian = false)),
      (4L, "audio", enc(upsample2x(base), 16640f, Wave, bigEndian = false)),
      (7L, "audio", enc(base, 8320f, Aiff, bigEndian = true)),
      (10L, "audio", enc(synth(reverse = true), 8320f, Wave, bigEndian = false)))
  }

  def audioMedia(s: SparkSession): DataFrame = {
    import s.implicits._
    audioRows.toDF("doc_id", "kind", "bytes")
  }

  /** REAL animated GIFs for the video-decode perceptual gate (q171),
    * synthesized deterministically in-process (no files, no RNG): 65
    * uniform-gray frames whose level takes a DISTINCT value on each of
    * the 65 hash samples (adjacent levels differ by >= 18/255 luminance,
    * so every temporal gradient is decisive — the video analogue of
    * imageRows' >= 50-luminance blocks / audioRows' >= 7%-energy steps).
    * Docs 2/5/8 are the SAME clip as 12x10 base, frame-rate-doubled +
    * 2x-upscaled re-encode, and +3-gray palette-shifted re-encode (three
    * byte-distinct payloads, three distinct digests); doc 11 is the
    * frame-REVERSED clip — a different video. Expected by construction:
    * exactly the {2,5,8} pairs match perceptually. Frames are indexed
    * 256-gray (deterministic palette); ids ≡ 2 mod 3 land in the `video`
    * modality. */
  def videoRows: Seq[(Long, String, Array[Byte])] = {
    val nFrames = 65
    def gray(w: Int): Int = (((w * 37 + 11) % 13) * 255 / 13 * 85 / 100) + 25
    val grays = (0 until 256).map(_.toByte).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    def frame(g: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val gr = img.createGraphics()
      gr.setColor(new java.awt.Color(g, g, g))
      gr.fillRect(0, 0, w, h)
      gr.dispose()
      img
    }
    def enc(levels: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      levels.foreach { g =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(frame(g, w, h), null, null), null)
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      baos.toByteArray
    }
    val base = (0 until nFrames).map(gray)
    Seq(
      (2L, "video", enc(base, 12, 10)),
      (5L, "video", enc(base.flatMap(g => Seq(g, g)), 24, 20)),
      (8L, "video", enc(base.map(_ + 3), 12, 10)),
      (11L, "video", enc(base.reverse, 12, 10)))
  }

  def videoMedia(s: SparkSession): DataFrame = {
    import s.implicits._
    videoRows.toDF("doc_id", "kind", "bytes")
  }
}
