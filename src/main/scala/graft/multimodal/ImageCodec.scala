package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Decoded-image metadata + first-order pixel statistic — the output
  * contract of the REAL decode stage (vs FakeCodec's byte probes).
  * `ok = false` marks payloads no registered reader accepts (the
  * corrupt-file row of a real media crawl: surfaced and countable, not
  * thrown). All statistics are integer-exact so both engines and both
  * regimes (batch/streaming) agree bit-for-bit. */
final case class ImageMeta(
    media_id: Long,
    n_bytes: Long,
    ok: Boolean,
    width: Int,
    height: Int,
    channels: Int,
    mean_luma_bp: Long)

/** REAL image codec over the JDK's own ImageIO (PNG/JPEG/BMP/GIF
  * readers and PNG/BMP writers ship with Java SE — zero added
  * dependencies). This replaces the honest stub that the multimodal
  * pipeline carried through round 9: bytes are actually decoded to a
  * pixel raster, statistics are computed from the raster, and resize
  * re-samples the raster and re-encodes through the real PNG writer.
  *
  * Determinism: all pixel math is integer (Rec.601 luma in thousandths,
  * floor division), nearest-neighbor resize uses exact index arithmetic
  * (`srcX = x·w DIV tw`), and PNG is lossless for 8-bit gray/RGB — so
  * decode(encode(pixels)) == pixels and every statistic below is an
  * exact function of the source bytes, which is what lets x_media_decode
  * / x_media_resize be ORACLE-BACKED even though the oracle engine has
  * no codec: DuckDB recomputes the statistics straight from the source
  * text bytes, and the hash-match pins the whole encode→decode→measure
  * roundtrip.
  *
  * Raster access goes through `Raster.getSample` (raw band values) —
  * never `BufferedImage.getRGB`, whose color-space conversion would
  * gamma-shift gray samples and break exactness.
  */
object ImageCodec {

  // ImageIO defaults to a disk-backed stream cache per decode; media
  // pipelines decode millions of payloads per executor, so keep the
  // scratch in memory (global JVM flag, idempotent)
  ImageIO.setUseCache(false)

  /** Encode an 8-bit grayscale pixel array (row-major, w·h bytes,
    * values used as unsigned) as a real PNG. */
  def encodeGrayPng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} bytes for ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, pixels(y * w + x) & 0xFF)
        x += 1
      }
      y += 1
    }
    toPng(img)
  }

  /** Encode row-major interleaved RGB triples (3·w·h bytes) as PNG. */
  def encodeRgbPng(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"${rgb.length} bytes for ${w}x$h RGB")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = 3 * (y * w + x)
        raster.setSample(x, y, 0, rgb(base) & 0xFF) // band order is R,G,B
        raster.setSample(x, y, 1, rgb(base + 1) & 0xFF)
        raster.setSample(x, y, 2, rgb(base + 2) & 0xFF)
        x += 1
      }
      y += 1
    }
    toPng(img)
  }

  private def toPng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, "png", out)
    require(ok, "no PNG writer registered") // ships with every Java SE
    out.toByteArray
  }

  /** Encode an 8-bit grayscale pixel array as a real JPEG at an explicit
    * quality (basis points of 1.0) — the LOSSY path of the codec family.
    * The JDK's JPEG writer (com.sun.imageio, libjpeg-derived) ships with
    * every Java SE and is DETERMINISTIC for a fixed raster + quality
    * (fixed quantization tables scaled from the quality factor, no
    * randomized rate control) — which is what lets a lossy query sit
    * behind the declared surface's identical-rows contract even though
    * it can never be hash-ORACLE-backed: the oracle engine cannot
    * reproduce quantization loss, so x_media_jpeg is rows-only with a
    * spec-pinned TOLERANCE BAND instead (dims/channels exact, mean luma
    * within a constructed bound of the source mean). */
  def encodeGrayJpeg(pixels: Array[Byte], w: Int, h: Int,
      qualityBp: Int): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} bytes for ${w}x$h")
    require(qualityBp > 0 && qualityBp <= 10000, s"bad quality $qualityBp")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, pixels(y * w + x) & 0xFF)
        x += 1
      }
      y += 1
    }
    toJpeg(img, qualityBp)
  }

  /** RGB sibling of [[encodeGrayJpeg]] (row-major interleaved RGB
    * triples): the writer converts to YCbCr and quantizes chroma too,
    * so per-pixel loss is larger than gray — but decode still yields 3
    * bands and exact dimensions, and the Rec.601 MEAN stays inside a
    * constructed band (spec-measured) because the luma channel is
    * DC-dominated the same way. */
  def encodeRgbJpeg(rgb: Array[Byte], w: Int, h: Int,
      qualityBp: Int): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"${rgb.length} bytes for ${w}x$h RGB")
    require(qualityBp > 0 && qualityBp <= 10000, s"bad quality $qualityBp")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = 3 * (y * w + x)
        raster.setSample(x, y, 0, rgb(base) & 0xFF)
        raster.setSample(x, y, 1, rgb(base + 1) & 0xFF)
        raster.setSample(x, y, 2, rgb(base + 2) & 0xFF)
        x += 1
      }
      y += 1
    }
    toJpeg(img, qualityBp)
  }

  private def toJpeg(img: BufferedImage, qualityBp: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(qualityBp / 10000f)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  private def read(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None } // truncated/corrupt payloads

  /** Decode + measure. Luma is summed exactly in int64 and divided
    * once: gray (1–2 bands) sums band 0 raw; color (≥3 bands) sums
    * R,G,B bands and folds them through integer Rec.601
    * ((299·ΣR + 587·ΣG + 114·ΣB) DIV 1000); alpha is ignored.
    * mean_luma_bp = Σluma·10000 DIV (255·pixels). */
  def decodeMeta(mediaId: Long, bytes: Array[Byte]): ImageMeta =
    decodeStats(bytes) match {
      case None =>
        ImageMeta(mediaId, bytes.length.toLong, ok = false, 0, 0, 0, 0L)
      case Some((w, h, bands, lumaSum)) =>
        ImageMeta(mediaId, bytes.length.toLong, ok = true, w, h, bands,
          lumaSum * 10000L / (255L * w * h))
    }

  /** Raw decode statistics — (width, height, bands, Σluma) — for
    * callers that aggregate ACROSS images (the multi-frame decoder):
    * sums stay exact integers until one final division. */
  def decodeStats(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    read(bytes).map { img =>
      val raster = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
      val lumaBands = if (bands >= 3) 3 else 1
      val sums = new Array[Long](lumaBands)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < lumaBands) {
            sums(b) += raster.getSample(x, y, b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val lumaSum =
        if (lumaBands == 1) sums(0)
        else (299L * sums(0) + 587L * sums(1) + 114L * sums(2)) / 1000L
      (w, h, bands, lumaSum)
    }

  /** Column-sum feature vector from the DECODED raster (gray band 0):
    * f[x] = Σ_y sample(x, y), integer-exact, returned as doubles for
    * the cosine kernel — the embed step of an image-similarity
    * pipeline, computed from real decoded pixels (x_media_knn). None
    * when the payload doesn't decode. */
  def columnFeatures(bytes: Array[Byte]): Option[Array[Double]] =
    read(bytes).map { img =>
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      val f = new Array[Double](w)
      var x = 0
      while (x < w) {
        var s = 0L
        var y = 0
        while (y < h) { s += raster.getSample(x, y, 0); y += 1 }
        f(x) = s.toDouble
        x += 1
      }
      f
    }

  /** Deterministic nearest-neighbor resize through the real codec:
    * decode, re-sample with exact index math (`srcX = x·w DIV tw` —
    * no interpolation, no float), re-encode as PNG preserving the
    * gray/color regime. Returns None when the payload doesn't decode
    * (the caller keeps the corrupt row observable, same as decodeMeta). */
  def resizeNearest(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0, s"bad target ${tw}x$th")
    read(bytes).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val bands = img.getRaster.getNumBands
      val gray = bands < 3
      val out = new BufferedImage(tw, th,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
      val src = img.getRaster
      val dst = out.getRaster
      val nb = if (gray) 1 else 3
      var y = 0
      while (y < th) {
        val sy = (y.toLong * h / th).toInt
        var x = 0
        while (x < tw) {
          val sx = (x.toLong * w / tw).toInt
          var b = 0
          while (b < nb) {
            dst.setSample(x, y, b, src.getSample(sx, sy, b))
            b += 1
          }
          x += 1
        }
        y += 1
      }
      toPng(out)
    }
  }
}
