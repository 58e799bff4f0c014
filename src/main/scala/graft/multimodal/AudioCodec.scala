package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Decoded-audio metadata + first-order sample statistic — the audio
  * sibling of [[ImageMeta]]. `ok = false` marks payloads the sound
  * stack rejects (the corrupt tail of a real crawl: countable data,
  * not a task failure). */
final case class AudioMeta(
    media_id: Long,
    n_bytes: Long,
    ok: Boolean,
    sample_rate: Int,
    channels: Int,
    n_samples: Long,
    mean_abs_bp: Long)

/** REAL audio codec over the JDK's own javax.sound.sampled (WAV/AIFF/AU
  * readers and writers ship with Java SE — zero added dependencies),
  * the second real modality next to [[ImageCodec]]: bytes are actually
  * parsed as an audio container, PCM frames are decoded, and statistics
  * are computed from the decoded samples.
  *
  * Determinism: PCM16 WAV is LOSSLESS (decode(encode(s)) == s), sample
  * math is integer-exact (mean absolute amplitude in basis points of
  * full scale via int64 sums and one floor division), so — like the
  * image path — an oracle with no codec can recompute every statistic
  * straight from the source samples and the hash-match pins the whole
  * encode→decode→measure roundtrip (x_media_audio).
  */
object AudioCodec {

  /** Encode signed 16-bit mono PCM samples as a real little-endian WAV
    * container at `sampleRate` Hz. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, sampleRate.toFloat, 16, 1, 2,
      sampleRate.toFloat, false) // little-endian, the WAV convention
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xFF).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val out = new ByteArrayOutputStream()
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode + measure. Frames are pulled through the JDK's parser (the
    * header is PARSED, not probed: sample rate/channels/frame count all
    * come from the decoded stream), samples re-assembled per the
    * stream's declared endianness, and the mean absolute amplitude
    * summed exactly in int64: mean_abs_bp = Σ|s|·10000 DIV (32768·n)
    * over all channels' samples. Non-PCM16 payloads that still parse
    * report their header metadata with mean_abs_bp = 0 rather than
    * guessing at sample layout. */
  def decodeMeta(mediaId: Long, bytes: Array[Byte]): AudioMeta = {
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (ais == null)
      return AudioMeta(mediaId, bytes.length.toLong, ok = false, 0, 0, 0L, 0L)
    try {
      val fmt = ais.getFormat
      val channels = fmt.getChannels
      val rate = math.round(fmt.getSampleRate)
      val pcm16 = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16
      if (pcm16) {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        var sum = 0L
        val big = fmt.isBigEndian
        var i = 0
        while (i < n) {
          val lo = raw(2 * i) & 0xFF
          val hi = raw(2 * i + 1) & 0xFF
          val s = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort
          sum += math.abs(s.toLong)
          i += 1
        }
        AudioMeta(mediaId, bytes.length.toLong, ok = true, rate, channels,
          n.toLong, if (n > 0) sum * 10000L / (32768L * n) else 0L)
      } else {
        // non-PCM16 that still parses: report header metadata only —
        // no full decode (the samples would be discarded anyway), and
        // getFrameLength can be NOT_SPECIFIED (-1) for unknown-length
        // containers, which must not surface as a negative count
        val frames = ais.getFrameLength
        val nSamples = if (frames >= 0) frames * channels else 0L
        AudioMeta(mediaId, bytes.length.toLong, ok = true, rate, channels,
          nSamples, 0L)
      }
    } finally ais.close()
  }
}
