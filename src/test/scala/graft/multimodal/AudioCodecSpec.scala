package graft.multimodal

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The REAL audio codec (JDK javax.sound.sampled): constructed PCM16
  * waveforms pin the WAV roundtrip, header parsing and the integer
  * amplitude arithmetic that the oracle-backed x_media_audio builds on,
  * plus the corrupt-payload contract and streaming parity. */
class AudioCodecSpec extends AnyFunSuite with SparkTestBase {

  test("WAV PCM16 roundtrip: parsed header + exact mean |amplitude|") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 16384)
    val wav = AudioCodec.encodeWavPcm16(samples, 8000)
    // a real RIFF/WAVE container, not a probe
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val m = AudioCodec.decodeMeta(3L, wav)
    assert(m.ok && m.sample_rate == 8000 && m.channels == 1 &&
      m.n_samples == 6L, m.toString)
    val sumAbs = 0L + 1000 + 1000 + 32767 + 32768 + 16384
    assert(m.mean_abs_bp == sumAbs * 10000 / (32768L * 6), m.toString)
    assert(m.n_bytes == wav.length.toLong)
  }

  test("silence and full-scale closed forms") {
    val silent = AudioCodec.decodeMeta(1L,
      AudioCodec.encodeWavPcm16(Array.fill[Short](100)(0), 16000))
    assert(silent.ok && silent.mean_abs_bp == 0L && silent.sample_rate == 16000)
    val full = AudioCodec.decodeMeta(2L,
      AudioCodec.encodeWavPcm16(Array.fill[Short](64)(-32768), 8000))
    assert(full.ok && full.mean_abs_bp == 10000L, full.toString)
  }

  test("non-PCM16 payloads report parsed header metadata, never negative counts") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // real 8-bit unsigned PCM WAV — parses fine, but is not the PCM16
    // layout the amplitude scan understands: the row must carry the
    // PARSED header (rate/channels/frames) with mean 0, and an
    // unknown frame length must not surface as a negative n_samples
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      4000f, 8, 1, 1, 4000f, false)
    val raw = Array.tabulate[Byte](40)(i => (i * 3).toByte)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, raw.length.toLong),
      AudioFileFormat.Type.WAVE, out)
    val m = AudioCodec.decodeMeta(4L, out.toByteArray)
    assert(m.ok && m.sample_rate == 4000 && m.channels == 1 &&
      m.n_samples == 40L && m.mean_abs_bp == 0L, m.toString)
  }

  test("corrupt payloads surface as ok=false rows") {
    val junk = "this is not audio".getBytes("UTF-8")
    val m = AudioCodec.decodeMeta(9L, junk)
    assert(!m.ok && m.sample_rate == 0 && m.n_samples == 0L &&
      m.n_bytes == junk.length)
  }

  test("decodeAudio over a stream matches the batch pass (stateless parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def mk(id: Long, n: Int): (Long, Array[Byte]) =
      id -> AudioCodec.encodeWavPcm16(
        Array.tabulate(n)(i => ((id * 137 + i * 251) % 30000 - 15000).toShort), 8000)
    val rows = Seq(mk(1L, 50), mk(2L, 7), 3L -> "corrupt".getBytes("UTF-8"))
    def asMedia(df: org.apache.spark.sql.DataFrame) = df
      .select($"media_id", org.apache.spark.sql.functions.lit("audio").as("kind"),
        $"media", org.apache.spark.sql.functions.lit(0).as("width"),
        org.apache.spark.sql.functions.lit(0).as("height"))
      .as[MediaRow]

    val mem = MemoryStream[(Long, Array[Byte])]
    val q = MediaPipeline.decodeAudio(asMedia(mem.toDS().toDF("media_id", "media")))
      .toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("auddecode").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val live = spark.table("auddecode").collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getInt(3), r.getInt(4),
          r.getLong(5), r.getLong(6))).sortBy(_._1)
      val batch = MediaPipeline.decodeAudio(asMedia(rows.toDF("media_id", "media")))
        .collect()
        .map(m => (m.media_id, m.ok, m.sample_rate, m.channels, m.n_samples,
          m.mean_abs_bp))
        .sortBy(_._1)
      assert(live.sameElements(batch),
        s"live=${live.mkString(",")} batch=${batch.mkString(",")}")
      assert(batch.count(!_._2) == 1 && batch.count(_._2) == 2)
    } finally q.stop()
  }
}
