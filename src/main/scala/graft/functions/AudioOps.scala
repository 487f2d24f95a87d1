package graft.functions

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** JVM kernels behind the multimodal AUDIO expressions: real PCM decode
  * for the containers the in-JDK `javax.sound.sampled` registry reads
  * without external codecs (WAV / AIFF / AIFC / AU — the same
  * `java.desktop` module [[ImageOps]] already relies on), with the SAME
  * deterministic byte-sampling fallback as the image path for everything
  * else (compressed audio, video, synthetic fixtures, corrupt payloads).
  *
  * The perceptual hash is a 64-bit DIFFERENCE hash over the mono energy
  * envelope (the time-domain analogue of the image dHash): the signal
  * splits into 65 equal windows, bit k is set iff window k's RMS energy
  * exceeds window k+1's. Amplitude scaling multiplies every window's
  * energy equally and resampling preserves the envelope's shape, so a
  * gain-changed or resampled or AIFF-re-encoded copy of the same
  * recording lands at small Hamming distance — the case content digests
  * structurally cannot catch (the bytes differ completely).
  *
  * Determinism contract (the [[ImageOps]] rules): OUR magic-byte sniff
  * decides the path before AudioSystem is consulted — RIFF/WAVE,
  * FORM/AIFF|AIFC, `.snd` — so text payloads never reach a decoder and
  * path selection is a pure function of the leading bytes. Any decode
  * failure (or a non-PCM encoding inside a sniffed container) degrades to
  * the fallback, which delegates to [[ImageOps.dhash]] — BIT-IDENTICAL to
  * the image expressions' fallback, so a kind-dispatched hash keeps every
  * existing synthetic-fixture oracle unchanged.
  *
  * Static-forwarded methods, callable from the generated Java of the
  * wrapping Catalyst expression ([[AudioAHash]]) inside whole-stage
  * codegen.
  */
object AudioOps {

  /** Strict magic-byte sniff for the PCM containers we decode. */
  def isAudio(b: Array[Byte]): Boolean =
    if (b == null || b.length < 12) false
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') true // WAV
    else if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
      (b(11) == 'F' || b(11) == 'C')) true // AIFF / AIFC
    else if (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') true // AU
    else false

  /** Decode to mono float samples in [-1, 1], or null when the payload is
    * not a sniffable PCM container or the decoder fails. Channels average
    * into one plane; 8/16/24/32-bit signed, 8-bit unsigned and float PCM
    * unpack per the container's declared endianness. */
  def decodePcm(b: Array[Byte]): Array[Float] =
    if (!isAudio(b)) null
    else
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(b))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val bits = fmt.getSampleSizeInBits
          val ch = fmt.getChannels
          val isFloat = enc == AudioFormat.Encoding.PCM_FLOAT
          val isSigned = enc == AudioFormat.Encoding.PCM_SIGNED
          val isUnsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
          if (!(isFloat && (bits == 32 || bits == 64)) &&
              !((isSigned || isUnsigned) && (bits == 8 || bits == 16 || bits == 24 || bits == 32)))
            return null
          if (ch < 1 || fmt.getFrameSize <= 0) return null
          val raw = in.readAllBytes()
          val bytesPer = bits / 8
          val nFrames = raw.length / fmt.getFrameSize
          if (nFrames == 0) return null
          val out = new Array[Float](nFrames)
          val big = fmt.isBigEndian
          val buf = java.nio.ByteBuffer.wrap(raw).order(
            if (big) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val off = f * fmt.getFrameSize + c * bytesPer
              val v: Double =
                if (isFloat && bits == 32) buf.getFloat(off).toDouble
                else if (isFloat) buf.getDouble(off)
                else bits match {
                  case 8 =>
                    if (isSigned) raw(off) / 128.0
                    else ((raw(off) & 0xFF) - 128) / 128.0
                  case 16 => buf.getShort(off) / 32768.0
                  case 24 =>
                    val b0 = raw(off) & 0xFF; val b1 = raw(off + 1) & 0xFF
                    val b2 = raw(off + 2) & 0xFF
                    val u = if (big) (b0 << 16) | (b1 << 8) | b2
                            else (b2 << 16) | (b1 << 8) | b0
                    ((u << 8) >> 8) / 8388608.0 // sign-extend 24 -> 32
                  case 32 => buf.getInt(off) / 2147483648.0
                }
              acc += v
              c += 1
            }
            out(f) = (acc / ch).toFloat
            f += 1
          }
          out
        } finally in.close()
      } catch { case _: Throwable => null }

  /** RMS energy of `nBands` equal windows over the mono signal. */
  private def bandEnergies(s: Array[Float], nBands: Int): Array[Double] = {
    val out = new Array[Double](nBands)
    val n = s.length
    var k = 0
    while (k < nBands) {
      val from = (k.toLong * n / nBands).toInt
      val to = math.max(((k + 1).toLong * n / nBands).toInt, from + 1)
      var sum = 0.0
      var i = from
      while (i < to && i < n) { sum += s(i).toDouble * s(i); i += 1 }
      out(k) = math.sqrt(sum / math.max(to - from, 1))
      k += 1
    }
    out
  }

  /** 64-bit perceptual audio hash: bit k set iff the k-th of 65 RMS
    * energy windows exceeds window k+1 (difference hash over the energy
    * envelope). Non-audio payloads take [[ImageOps.dhash]] — the shared
    * deterministic fallback, so existing synthetic-payload oracles are
    * unchanged under a kind-dispatched hash. */
  def ahash(b: Array[Byte]): Long = {
    val s = decodePcm(b)
    if (s == null) ImageOps.dhash(b)
    else {
      val e = bandEnergies(s, 65)
      var bits = 0L
      var k = 0
      while (k < 64) {
        if (e(k) > e(k + 1)) bits |= 1L << k
        k += 1
      }
      bits
    }
  }

  /** `dim` banded RMS energies of decoded PCM scaled to [-0.5, 0.5], or
    * null when the payload is not decodable (the caller falls back to its
    * digest-derived features) — the audio analogue of
    * [[ImageOps.features]]. */
  def features(b: Array[Byte], dim: Int): Array[Float] = {
    val s = decodePcm(b)
    if (s == null) null
    else {
      val e = bandEnergies(s, dim)
      Array.tabulate(dim)(i => (math.min(e(i), 1.0) - 0.5).toFloat)
    }
  }
}
