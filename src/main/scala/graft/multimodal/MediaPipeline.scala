package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column handling: media as opaque `binary` + typed metadata,
  * processed in batches via mapPartitions (the JVM analogue of a
  * batch-shaped Pandas UDF: the codec amortizes its setup across a batch,
  * rows stream through without driver involvement).
  *
  * The actual byte→pixels/samples decode is a STUB (`FakeCodec`): the
  * image/audio libraries are not in this container, so decode is a
  * clearly-marked deterministic fake — but the Spark-side plumbing
  * (schema, batch shape, partitioning, feature extraction contract) is
  * real and tested, and a real codec drops into `FakeCodec.decode`
  * unchanged.
  */
final case class MediaRow(
    media_id: Long,
    kind: String, // "image" | "audio" | "video" | "text"
    media: Array[Byte], // opaque encoded payload
    width: Int,
    height: Int)

final case class FrameSummary(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    n_frames: Long,
    n_sampled: Long,
    probe_sum: Long)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    checksum: Long,
    width: Int,
    height: Int,
    feat: Array[Float]) // fixed-dim feature vector from the decoded media

/** STUB standing in for a real codec (jpeg/png/ffmpeg decode). Everything
  * here is a deterministic function of the bytes so tests and oracles can
  * pin it down. */
object FakeCodec {
  val FeatureDim = 8

  /** Polynomial rolling checksum over the raw bytes (matches the
    * char-level oracle for ASCII payloads; shared kernel). */
  def checksum(bytes: Array[Byte]): Long = graft.functions.Hashing.poly31(bytes)

  /** STUB resize: a real implementation decodes, scales the pixel grid
    * and re-encodes; the stub derives the output bytes deterministically
    * (every k-th byte, k = area ratio) so tests can pin byte counts and
    * checksums. The signature — (row, targetW, targetH) → row with new
    * dims + re-encoded payload — is the contract a real codec fills. */
  def resize(row: MediaRow, targetW: Int, targetH: Int): MediaRow = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val inArea = math.max(1L, row.width.toLong * row.height)
    val outArea = targetW.toLong * targetH
    // byte budget scales with the area ratio, floor 1 byte
    val outLen = math.max(1L,
      (row.media.length.toLong * outArea) / inArea).min(row.media.length).toInt
    val stride = math.max(1, row.media.length / math.max(1, outLen))
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = row.media(math.min(i * stride, row.media.length - 1)); i += 1 }
    row.copy(media = out, width = targetW, height = targetH)
  }

  /** "Decode + embed": per-dimension byte-stride means, scaled. A real
    * implementation decodes pixels/samples and runs a feature extractor;
    * the signature is the contract. */
  def decode(row: MediaRow): MediaFeatures = {
    val bytes = row.media
    val feat = new Array[Float](FeatureDim)
    var d = 0
    while (d < FeatureDim) {
      var s = 0L
      var i = d
      while (i < bytes.length) { s += (bytes(i) & 0xFF); i += FeatureDim }
      val n = math.max(1, (bytes.length + FeatureDim - 1 - d) / FeatureDim)
      feat(d) = s.toFloat / n / 255f
      d += 1
    }
    MediaFeatures(row.media_id, row.kind, bytes.length.toLong, checksum(bytes),
      row.width, row.height, feat)
  }
}

/** Minimal length-prefixed frame container (the MJPEG shape: one
  * independently-decodable image per frame, 4-byte big-endian length
  * headers) — lets the REAL per-frame decode path run without a video
  * demuxer dependency. Truncated trailing bytes parse to the frames
  * that fit (the crawl-tail contract everywhere else in this module). */
object FrameContainer {
  def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    frames.foreach { f => d.writeInt(f.length); d.write(f) }
    out.toByteArray
  }

  def unpack(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val frames = Seq.newBuilder[Array[Byte]]
    var off = 0
    var ok = true
    while (ok && off + 4 <= bytes.length) {
      val len = ((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
        ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
      // bounds check in LONG arithmetic: a corrupt header near
      // Int.MaxValue would wrap `off + 4 + len` negative, slip past an
      // int comparison and throw out of copyOfRange — the crawl-tail
      // contract says corrupt data parses to the frames that fit
      if (len < 0 || off.toLong + 4 + len > bytes.length) ok = false
      else {
        frames += java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len)
        off += 4 + len
      }
    }
    frames.result()
  }
}

/** Per-payload REAL frame-decode summary: container frames counted,
  * every `stride`-th frame decoded through the actual codec, luma
  * aggregated exactly across the decoded frames. */
final case class FrameDecodeSummary(
    media_id: Long,
    n_frames: Long,
    n_decoded: Long,
    n_bad: Long, // sampled frames the codec rejected
    mean_luma_bp: Long)

object MediaPipeline {

  val BatchSize = 64

  /** Pinned JPEG quality (basis points of 1.0) for the lossy-codec
    * surface — one constant so query, specs and streaming parity all
    * encode identically. 8500 keeps the mean-luma error on the word-
    * salad rasters inside the ImageCodecSpec tolerance band while
    * still exercising real quantization loss (the bytes are NOT a
    * PNG-roundtrip of the raster). */
  val JpegQualityBp = 8500

  /** Batched decode/feature-extract. Narrow (no shuffle): each partition
    * streams its rows through the codec in BatchSize groups. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // batch shape: group rows so a real codec could process a batch at
      // once (GPU/native call), then flatten back to a row iterator
      it.grouped(BatchSize).flatMap { batch => batch.map(FakeCodec.decode) }
    }
  }

  /** Frame/sample selection: keep every `stride`-th media row per kind —
    * the "frame-sample" stage of a video pipeline, expressible as a pure
    * filter (no shuffle). */
  def sample(media: Dataset[MediaRow], stride: Long): Dataset[MediaRow] =
    media.filter(_.media_id % stride == 0)

  /** INTRA-payload frame sampling — the video-decode stage shape: the
    * payload splits into fixed `frameBytes` frames, every `stride`-th
    * frame is "decoded" (stub: its first byte is probed), and the row
    * reduces to a summary the downstream pipeline keys on. Like
    * extractFeatures this is a narrow batched mapPartitions pass — a
    * real frame decoder replaces the probe without touching the plan. */
  def frameSummary(media: Dataset[MediaRow], frameBytes: Int,
      stride: Int): Dataset[FrameSummary] = {
    require(frameBytes > 0 && stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { r =>
        val nb = r.media.length.toLong
        val nf = (nb + frameBytes - 1) / frameBytes
        var i = 0L
        var ns = 0L
        var ps = 0L
        while (i < nf) {
          ns += 1
          ps += (r.media((i * frameBytes).toInt) & 0xFF)
          i += stride
        }
        FrameSummary(r.media_id, r.kind, nb, nf, ns, ps)
      })
    }
  }

  /** Batched resize to a uniform target — the standard normalize-before-
    * embed stage. Narrow like extractFeatures: rows stream through the
    * codec per partition in BatchSize groups, no data movement. */
  def resizeAll(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map(FakeCodec.resize(_, targetW, targetH)))
    }
  }

  /** REAL decode ([[ImageCodec]], JDK ImageIO — PNG/JPEG/BMP/GIF):
    * bytes → pixel raster → integer-exact dimensions/channels/mean-luma.
    * Same narrow batched shape as the stub stages (a GPU codec would
    * take the batch whole); payloads no reader accepts come back as
    * `ok = false` rows instead of failing the task — a crawl's corrupt
    * tail is data, not an outage. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map(r => ImageCodec.decodeMeta(r.media_id, r.media)))
    }
  }

  /** REAL intra-payload frame decode — [[frameSummary]]'s stub probe
    * replaced by the actual codec: the payload parses as a
    * [[FrameContainer]], every `stride`-th frame DECODES through
    * ImageIO, and luma aggregates exactly across the decoded rasters
    * (one division at the end). Undecodable sampled frames are counted
    * (`n_bad`), not thrown. Narrow batched mapPartitions like every
    * stage here — a hardware decoder takes the batch whole. */
  def decodeFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameDecodeSummary] = {
    require(stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { r =>
        val frames = FrameContainer.unpack(r.media)
        var f = 0
        var decoded = 0L
        var bad = 0L
        var pix = 0L
        var luma = 0L
        while (f < frames.length) {
          ImageCodec.decodeStats(frames(f)) match {
            case Some((w, h, _, s)) =>
              decoded += 1; pix += w.toLong * h; luma += s
            case None => bad += 1
          }
          f += stride
        }
        FrameDecodeSummary(r.media_id, frames.length.toLong, decoded, bad,
          if (pix > 0) luma * 10000L / (255L * pix) else 0L)
      })
    }
  }

  /** REAL audio decode ([[AudioCodec]], JDK javax.sound.sampled —
    * WAV/AIFF/AU): bytes → parsed container → PCM frames →
    * integer-exact rate/channels/sample-count/mean-amplitude. Same
    * narrow batched shape and corrupt-row contract as decodeImages. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map(r => AudioCodec.decodeMeta(r.media_id, r.media)))
    }
  }

  /** REAL resize through the codec: decode → nearest-neighbor re-sample
    * (exact index math) → re-encode PNG. Undecodable payloads pass
    * through UNCHANGED with their original dims (observable downstream
    * via decodeImages' ok flag) rather than killing the batch. */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { r =>
        ImageCodec.resizeNearest(r.media, targetW, targetH) match {
          case Some(png) => r.copy(media = png, width = targetW, height = targetH)
          case None      => r
        }
      })
    }
  }
}
