package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.metadata.IIOMetadataNode

/** JVM kernels behind the multimodal VIDEO expressions: real multi-frame
  * decode for the one moving-picture container the in-JDK `javax.imageio`
  * registry reads without external codecs — ANIMATED GIF (the same
  * java.desktop GIF reader [[ImageOps]] already uses for stills reads
  * every frame plus its placement metadata), with the SAME deterministic
  * fallback chain as the image/audio paths for everything else (MP4/WebM/
  * compressed video, synthetic fixtures, corrupt payloads).
  *
  * The perceptual hash is a 64-bit DIFFERENCE hash over the per-frame
  * MEAN-LUMINANCE envelope — the temporal analogue of the image dHash and
  * the exact shape of [[AudioOps]]' energy-envelope hash: 65 frames are
  * sampled at equal strides across the composited timeline, bit k is set
  * iff frame k's mean luminance exceeds frame k+1's. Frame-rate doubling
  * resamples the same envelope, spatial rescaling preserves per-frame
  * means, and palette re-quantization shifts all means together, so a
  * re-encoded / rescaled / retimed copy of the same clip lands at small
  * Hamming distance — the case content digests structurally cannot catch.
  *
  * Determinism contract (the [[ImageOps]] rules): OUR GIF block-structure
  * walk decides the path — a payload is "video" iff its own bytes carry
  * >= 2 image descriptors — so path selection is a pure function of the
  * payload, never of reader registry order, and single-frame GIFs stay on
  * the still-image path. Frames composite progressively onto the logical
  * screen at their declared offsets (doNotDispose approximation — exact
  * for full-frame encoders, perceptually stable for patch encoders). Any
  * decode failure degrades to [[ImageOps.dhash]] — BIT-IDENTICAL to the
  * image/audio expressions' fallback, so a kind-dispatched hash keeps
  * every synthetic-fixture oracle unchanged.
  *
  * Static-forwarded methods, callable from the generated Java of the
  * wrapping Catalyst expression ([[VideoTHash]]) inside whole-stage
  * codegen.
  */
object VideoOps {

  /** Count GIF image descriptors by walking the block structure — a pure
    * byte function, no decoder consulted. 0 for non-GIF / malformed. */
  def gifFrameCount(b: Array[Byte]): Int = {
    if (b == null || b.length < 14) return 0
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return 0
    var frames = 0
    try {
      var p = 13 // header(6) + logical screen descriptor(7)
      val packed = b(10) & 0xFF
      if ((packed & 0x80) != 0) p += 3 * (1 << ((packed & 7) + 1)) // global color table
      while (p < b.length) {
        (b(p) & 0xFF) match {
          case 0x3B => return frames // trailer
          case 0x21 => // extension: introducer + label, then sub-blocks
            p += 2
            while (p < b.length && (b(p) & 0xFF) != 0) p += (b(p) & 0xFF) + 1
            p += 1
          case 0x2C => // image descriptor
            frames += 1
            val lp = b(p + 9) & 0xFF
            p += 10
            if ((lp & 0x80) != 0) p += 3 * (1 << ((lp & 7) + 1)) // local color table
            p += 1 // LZW minimum code size
            while (p < b.length && (b(p) & 0xFF) != 0) p += (b(p) & 0xFF) + 1
            p += 1
          case _ => return frames // malformed tail: count what parsed
        }
      }
      frames
    } catch { case _: Throwable => frames }
  }

  /** Moving-picture sniff: an animated (>= 2 frame) GIF. */
  def isVideo(b: Array[Byte]): Boolean = gifFrameCount(b) >= 2

  /** ITU-R BT.601 integer luminance (0..255) — [[ImageOps]]' weights. */
  @inline private def lum(argb: Int): Int = {
    val r = (argb >> 16) & 0xFF
    val g = (argb >> 8) & 0xFF
    val bl = argb & 0xFF
    (299 * r + 587 * g + 114 * bl) / 1000
  }

  /** Iterate the composited frames of an animated GIF: each frame patch
    * draws onto the logical-screen canvas at its declared offset
    * (doNotDispose approximation) and `f(index, canvas)` observes the
    * composited state. Returns the frame count, or -1 when the payload is
    * not an animated GIF or the decoder fails partway. */
  private def foreachCompositedFrame(b: Array[Byte])(f: (Int, BufferedImage) => Unit): Int = {
    if (!isVideo(b)) return -1
    var reader: javax.imageio.ImageReader = null
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      val it = ImageIO.getImageReadersByFormatName("gif")
      if (!it.hasNext) return -1
      reader = it.next()
      iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b))
      reader.setInput(iis, false, false)
      val n = reader.getNumImages(true)
      if (n < 2) return -1
      // logical screen size from the descriptor (little-endian u16 pairs)
      var w = (b(6) & 0xFF) | ((b(7) & 0xFF) << 8)
      var h = (b(8) & 0xFF) | ((b(9) & 0xFF) << 8)
      if (w <= 0 || h <= 0) { w = reader.getWidth(0); h = reader.getHeight(0) }
      if (w <= 0 || h <= 0) return -1
      val canvas = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = canvas.createGraphics()
      try {
        var i = 0
        while (i < n) {
          val patch = reader.read(i)
          var left = 0
          var top = 0
          try {
            val tree = reader.getImageMetadata(i)
              .getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[IIOMetadataNode]
            val kids = tree.getChildNodes
            var k = 0
            while (k < kids.getLength) {
              val node = kids.item(k)
              if (node.getNodeName == "ImageDescriptor") {
                val at = node.getAttributes
                left = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
                top = at.getNamedItem("imageTopPosition").getNodeValue.toInt
              }
              k += 1
            }
          } catch { case _: Throwable => } // default 0,0 placement
          g.drawImage(patch, left, top, null)
          f(i, canvas)
          i += 1
        }
      } finally g.dispose()
      n
    } catch { case _: Throwable => -1 }
    finally {
      if (reader != null) try reader.dispose() catch { case _: Throwable => }
      if (iis != null) try iis.close() catch { case _: Throwable => }
    }
  }

  /** Per-frame mean luminance of the composited timeline, or null when the
    * payload is not an animated GIF. */
  def frameMeanLums(b: Array[Byte]): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    val n = foreachCompositedFrame(b) { (_, canvas) =>
      val w = canvas.getWidth
      val h = canvas.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += lum(canvas.getRGB(x, y)); x += 1 }
        y += 1
      }
      out += sum.toDouble / (w.toLong * h)
    }
    if (n < 2) null else out.toArray
  }

  /** 64-bit perceptual video hash: bit k set iff the k-th of 65
    * stride-sampled frames' mean luminance exceeds sample k+1's
    * (difference hash over the temporal luminance envelope). Non-video
    * payloads take [[ImageOps.dhash]] — the shared deterministic fallback
    * (which itself decodes single-frame GIFs as stills), so existing
    * synthetic-payload oracles are unchanged under a kind-dispatched
    * hash. */
  def thash(b: Array[Byte]): Long = {
    val m = frameMeanLums(b)
    if (m == null) ImageOps.dhash(b)
    else {
      val e = Array.tabulate(65)(k => m((k.toLong * m.length / 65).toInt))
      var bits = 0L
      var k = 0
      while (k < 64) {
        if (e(k) > e(k + 1)) bits |= 1L << k
        k += 1
      }
      bits
    }
  }

  /** `dim` stride-sampled mean luminances of the composited timeline
    * scaled to [-0.5, 0.5], or null when the payload is not decodable
    * (the caller falls back to its digest-derived features) — the video
    * analogue of [[ImageOps.features]] / [[AudioOps.features]]. */
  def features(b: Array[Byte], dim: Int): Array[Float] = {
    val m = frameMeanLums(b)
    if (m == null) null
    else Array.tabulate(dim) { i =>
      (m((i.toLong * m.length / dim).toInt) / 255.0 - 0.5).toFloat
    }
  }

  /** Sampled composited frames re-encoded as PNG: (frame_idx, png_bytes)
    * for every `everyN`-th frame, or null when the payload is not an
    * animated GIF (the caller keeps its byte-slice stub). One decode pass
    * per payload regardless of the sampling stride. */
  def sampleFrames(b: Array[Byte], everyN: Int): Array[(Int, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    val n = foreachCompositedFrame(b) { (i, canvas) =>
      if (i % everyN == 0) {
        val baos = new ByteArrayOutputStream()
        ImageIO.write(canvas, "png", baos)
        out += ((i, baos.toByteArray))
      }
    }
    if (n < 2) null else out.toArray
  }
}
