package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** JVM kernels behind the multimodal image expressions: real pixel decode
  * for the formats the in-JDK `javax.imageio` registry ships readers for
  * (PNG / JPEG / GIF / BMP — the java.desktop module is present in this
  * container), with a deterministic byte-sampling FALLBACK for everything
  * else (audio, video, synthetic fixtures, corrupt payloads). The fallback
  * is bit-identical to the pure-expression stub it replaces, so every
  * DuckDB-mirrored oracle over non-image payloads is unchanged, while real
  * encoded images now hash/resize/featurize their PIXELS — a JPEG
  * re-encode of the same image lands at Hamming distance ~0 from the PNG,
  * the case content-digest dedup structurally cannot catch.
  *
  * Determinism contract: decode goes through our OWN magic-byte sniff
  * (strict signatures; BMP additionally requires the four reserved header
  * bytes to be zero, which no UTF-8 text payload can carry) before
  * ImageIO is consulted, so whether a payload takes the pixel path or the
  * fallback is a pure function of its leading bytes — never of reader
  * registry order. Any decode failure degrades to the fallback.
  *
  * These are plain static-forwarded JVM methods so the generated Java of
  * the wrapping Catalyst expressions ([[ImageDHash]], [[ImageResize]])
  * can call them directly inside whole-stage codegen.
  */
object ImageOps {

  ImageIO.setUseCache(false) // no temp-file cache churn on executors

  /** Strict magic-byte sniff for the formats we decode. */
  def isImage(b: Array[Byte]): Boolean =
    if (b == null) false
    else if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') true // PNG
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF) true // JPEG
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a') true // GIF
    else if (b.length >= 10 && b(0) == 'B' && b(1) == 'M' &&
      b(6) == 0 && b(7) == 0 && b(8) == 0 && b(9) == 0) true // BMP (reserved = 0)
    else false

  /** Decode to a BufferedImage, or null when the payload is not a
    * sniffable image or the decoder fails. */
  def decode(b: Array[Byte]): BufferedImage =
    if (!isImage(b)) null
    else
      try {
        val img = ImageIO.read(new ByteArrayInputStream(b))
        if (img != null && img.getWidth > 0 && img.getHeight > 0) img else null
      } catch { case _: Throwable => null }

  /** ITU-R BT.601 integer luminance of an ARGB pixel (0..255). */
  @inline private def lum(argb: Int): Int = {
    val r = (argb >> 16) & 0xFF
    val g = (argb >> 8) & 0xFF
    val b = argb & 0xFF
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** w x h luminance plane, row-major. Real images: nearest-neighbor
    * (top-left) downsample of the decoded pixels. Fallback: cell k samples
    * payload byte floor(k * len / (w*h)) unsigned (0 for empty payloads) —
    * the exact sampling the pure-expression stub used, so non-image
    * payloads keep their historical hashes. */
  def luma(b: Array[Byte], w: Int, h: Int): Array[Int] = {
    val n = w * h
    val out = new Array[Int](n)
    val img = decode(b)
    if (img != null) {
      val sw = img.getWidth
      val sh = img.getHeight
      var y = 0
      while (y < h) {
        val sy = (y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * sw / w).toInt
          out(y * w + x) = lum(img.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
    } else {
      val len = if (b == null) 0 else b.length
      if (len > 0) {
        var k = 0
        while (k < n) {
          out(k) = b((k.toLong * len / n).toInt) & 0xFF
          k += 1
        }
      }
    }
    out
  }

  /** 64-bit dHash (Krawetz's difference hash): bit (r*8+c) is set iff
    * cell (r, c) of the 9x8 luminance plane exceeds its right neighbor —
    * the same bit layout as the expression stub it replaces. */
  def dhash(b: Array[Byte]): Long = {
    val p = luma(b, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (p(r * 9 + c) > p(r * 9 + c + 1)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Resize: real images nearest-neighbor-resample the decoded RGB to
    * w x h and re-encode as PNG (the JDK PNG writer is deterministic);
    * everything else keeps the stub's cyclic byte tiling out[i] =
    * src[i % len] truncated to w*h bytes (zeros for empty payloads). */
  def resizeOrTile(b: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = decode(b)
    if (img != null) {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val sw = img.getWidth
      val sh = img.getHeight
      var y = 0
      while (y < h) {
        val sy = (y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          out.setRGB(x, y, img.getRGB((x.toLong * sw / w).toInt, sy) & 0xFFFFFF)
          x += 1
        }
        y += 1
      }
      val baos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", baos)
      baos.toByteArray
    } else {
      val n = w * h
      val dst = new Array[Byte](n)
      val len = if (b == null) 0 else b.length
      if (len > 0) {
        var i = 0
        while (i < n) { dst(i) = b(i % len); i += 1 }
      }
      dst
    }
  }

  /** `dim` block-mean luminances of a decoded image scaled to [-0.5, 0.5]
    * (feature i = the TRUE mean over the i-th full-height vertical strip),
    * or null when the payload is not decodable (the caller falls back to
    * its digest-derived features). */
  def features(b: Array[Byte], dim: Int): Array[Float] = {
    val img = decode(b)
    if (img == null) null
    else {
      val sw = img.getWidth
      val sh = img.getHeight
      Array.tabulate(dim) { i =>
        val x0 = (i.toLong * sw / dim).toInt
        val x1 = math.max(((i + 1).toLong * sw / dim).toInt, x0 + 1)
        var sum = 0L
        var y = 0
        while (y < sh) {
          var x = x0
          while (x < x1) { sum += lum(img.getRGB(x, y)); x += 1 }
          y += 1
        }
        (sum.toDouble / ((x1 - x0).toLong * sh) / 255.0 - 0.5).toFloat
      }
    }
  }
}
