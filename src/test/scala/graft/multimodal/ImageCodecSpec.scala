package graft.multimodal

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The REAL codec (JDK ImageIO): constructed images of known dimensions
  * and pixel content pin decode, channel handling, luma arithmetic and
  * the nearest-neighbor resize — the properties the oracle-backed
  * x_media_decode / x_media_resize build on — plus the corrupt-payload
  * contract and streaming parity of the pipeline stage. */
class ImageCodecSpec extends AnyFunSuite with SparkTestBase {

  test("gray PNG roundtrip: decode(encode(px)) recovers dims, 1 band, exact mean") {
    // 3x2 with known bytes: sum = 0+51+102+153+204+255 = 765
    val px = Array[Byte](0, 51, 102, -103, -52, -1) // unsigned 0,51,102,153,204,255
    val png = ImageCodec.encodeGrayPng(px, 3, 2)
    // a real PNG container, not a probe: magic bytes present
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val m = ImageCodec.decodeMeta(7L, png)
    assert(m.ok && m.width == 3 && m.height == 2 && m.channels == 1, m.toString)
    assert(m.n_bytes == png.length.toLong)
    assert(m.mean_luma_bp == 765L * 10000 / (255 * 6), m.toString) // = 5000
  }

  test("RGB PNG: 3 bands and integer Rec.601 luma over the band sums") {
    // 1x2 pixels: (255,0,0) and (0,255,0)
    val rgb = Array[Byte](-1, 0, 0, 0, -1, 0)
    val png = ImageCodec.encodeRgbPng(rgb, 1, 2)
    val m = ImageCodec.decodeMeta(8L, png)
    assert(m.ok && m.width == 1 && m.height == 2 && m.channels == 3, m.toString)
    // lumaSum = (299*255 + 587*255 + 114*0) / 1000 = 225930/1000 = 225
    assert(m.mean_luma_bp == 225L * 10000 / (255 * 2), m.toString)
  }

  test("gray JPEG (lossy path): dims/channels exact, luma inside the constructed band") {
    val q = MediaPipeline.JpegQualityBp
    // real JPEG container: SOI marker FF D8
    val flat = Array.fill(100)(100.toByte)
    val fj = ImageCodec.encodeGrayJpeg(flat, 10, 10, q)
    assert((fj(0) & 0xFF) == 0xFF && (fj(1) & 0xFF) == 0xD8, "not a JPEG")
    // flat raster is pure DC — quantization loses nothing: mean EXACT
    val fm = ImageCodec.decodeMeta(1L, fj)
    assert(fm.ok && fm.width == 10 && fm.height == 10 && fm.channels == 1)
    assert(fm.mean_luma_bp == 100L * 100 * 10000 / (255L * 100), fm.toString)
    // corpus-envelope rasters (lowercase ASCII, the query's dim range):
    // dims exact, mean luma within the measured band (tools/JpegProbe:
    // max 15 bp over 2000 rasters at quality 8500 — bound set 3× above)
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      val w = 8 + trial % 5
      val h = 8 + trial % 7
      val px = Array.tabulate(w * h)(_ => (97 + rnd.nextInt(26)).toByte)
      val m = ImageCodec.decodeMeta(trial.toLong,
        ImageCodec.encodeGrayJpeg(px, w, h, q))
      assert(m.ok && m.width == w && m.height == h && m.channels == 1, m.toString)
      val exact = px.map(b => (b & 0xFF).toLong).sum * 10000L / (255L * w * h)
      assert(math.abs(m.mean_luma_bp - exact) <= 50L,
        s"luma err ${math.abs(m.mean_luma_bp - exact)} bp outside band: $m")
    }
    // the payload genuinely exercises LOSS: high-frequency content does
    // NOT roundtrip sample-exact (unlike the PNG twin) — decode and
    // compare pixels of a checkerboard
    val cb = Array.tabulate(64)(i => (if ((i / 8 + i % 8) % 2 == 0) 0 else 255).toByte)
    val cj = ImageCodec.encodeGrayJpeg(cb, 8, 8, q)
    val feats = ImageCodec.columnFeatures(cj).get
    val exactCols = (0 until 8).map(x =>
      (0 until 8).map(y => cb(y * 8 + x) & 0xFF).sum.toDouble)
    assert(feats.toSeq != exactCols, "JPEG path decoded sample-exact — not lossy?")
  }

  test("RGB JPEG: 3 bands, exact dims, Rec.601 mean inside a wider color band") {
    val q = MediaPipeline.JpegQualityBp
    // flat color raster: chroma quantization can't move a constant
    // block's luma — mean exact like the gray case
    val flat = Array.tabulate(3 * 64)(i => (i % 3 match {
      case 0 => 200; case 1 => 100; case _ => 50 }).toByte)
    val fm = ImageCodec.decodeMeta(1L, ImageCodec.encodeRgbJpeg(flat, 8, 8, q))
    assert(fm.ok && fm.width == 8 && fm.height == 8 && fm.channels == 3, fm.toString)
    val flatLuma = (299L * (200 * 64) + 587L * (100 * 64) + 114L * (50 * 64)) / 1000L
    assert(math.abs(fm.mean_luma_bp - flatLuma * 10000 / (255L * 64)) <= 20L,
      s"flat RGB mean moved: $fm")
    // textured color rasters: dims/channels exact, mean luma within a
    // wider measured band (chroma subsampling + two quantized channels)
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 100) {
      val w = 8 + trial % 5
      val h = 8 + trial % 7
      val rgb = Array.tabulate(3 * w * h)(_ => (32 + rnd.nextInt(192)).toByte)
      val m = ImageCodec.decodeMeta(trial.toLong,
        ImageCodec.encodeRgbJpeg(rgb, w, h, q))
      assert(m.ok && m.width == w && m.height == h && m.channels == 3, m.toString)
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < w * h) {
        sr += rgb(3 * i) & 0xFF; sg += rgb(3 * i + 1) & 0xFF
        sb += rgb(3 * i + 2) & 0xFF; i += 1
      }
      val exact = (299L * sr + 587L * sg + 114L * sb) / 1000L * 10000 / (255L * w * h)
      assert(math.abs(m.mean_luma_bp - exact) <= 150L,
        s"RGB luma err ${math.abs(m.mean_luma_bp - exact)} bp outside band: $m")
    }
  }

  test("gray JPEG encode is deterministic (declared-surface rerun contract)") {
    val px = Array.tabulate(120)(i => ((i * 37 + 11) % 251).toByte)
    val a = ImageCodec.encodeGrayJpeg(px, 12, 10, MediaPipeline.JpegQualityBp)
    val b = ImageCodec.encodeGrayJpeg(px, 12, 10, MediaPipeline.JpegQualityBp)
    assert(java.util.Arrays.equals(a, b), "JPEG writer not deterministic")
  }

  test("corrupt JPEG surfaces as ok=false, truncated body too") {
    val px = Array.tabulate(64)(i => i.toByte)
    val jpg = ImageCodec.encodeGrayJpeg(px, 8, 8, MediaPipeline.JpegQualityBp)
    // truncated mid-stream: valid SOI, unreadable body → corrupt row
    val trunc = java.util.Arrays.copyOf(jpg, 20)
    assert(!ImageCodec.decodeMeta(2L, trunc).ok)
  }

  test("corrupt payloads surface as ok=false rows, never as task failures") {
    val junk = "definitely not an image".getBytes("UTF-8")
    val m = ImageCodec.decodeMeta(9L, junk)
    assert(!m.ok && m.width == 0 && m.channels == 0 && m.n_bytes == junk.length)
    // truncated real PNG: valid magic, unreadable body
    val png = ImageCodec.encodeGrayPng(Array[Byte](1, 2, 3, 4), 2, 2)
    val trunc = java.util.Arrays.copyOf(png, 12)
    assert(!ImageCodec.decodeMeta(10L, trunc).ok)
  }

  test("nearest-neighbor resize: exact index math on a constructed gradient") {
    // 4x4 gray ramp 0..15; resize to 2x2 → samples at (x·4 DIV 2, y·4 DIV 2)
    // = src pixels (0,0),(2,0),(0,2),(2,2) = values 0, 2, 8, 10
    val px = Array.tabulate(16)(i => i.toByte)
    val png = ImageCodec.encodeGrayPng(px, 4, 4)
    val out = ImageCodec.resizeNearest(png, 2, 2).get
    val m = ImageCodec.decodeMeta(11L, out)
    assert(m.ok && m.width == 2 && m.height == 2 && m.channels == 1)
    assert(m.mean_luma_bp == (0L + 2 + 8 + 10) * 10000 / (255 * 4), m.toString)
    // undecodable input → None (caller keeps the row observable)
    assert(ImageCodec.resizeNearest("junk".getBytes, 2, 2).isEmpty)
  }

  test("columnFeatures: exact column sums from decoded pixels") {
    // 3x2: rows (10,20,30) / (40,50,60) → column sums (50, 70, 90)
    val png = ImageCodec.encodeGrayPng(Array[Byte](10, 20, 30, 40, 50, 60), 3, 2)
    assert(ImageCodec.columnFeatures(png).get.toSeq == Seq(50.0, 70.0, 90.0))
    assert(ImageCodec.columnFeatures("junk".getBytes).isEmpty)
  }

  test("FrameContainer: roundtrip, truncated tail parses to the frames that fit") {
    val fs = Seq(Array[Byte](1, 2, 3), Array[Byte](), Array[Byte](9))
    val packed = FrameContainer.pack(fs)
    val back = FrameContainer.unpack(packed)
    assert(back.length == 3 && back.zip(fs).forall { case (a, b) => a.sameElements(b) })
    // cut mid-frame: only the complete prefix frames survive
    val cut = FrameContainer.unpack(java.util.Arrays.copyOf(packed, packed.length - 1))
    assert(cut.length == 2)
    assert(FrameContainer.unpack(Array.empty[Byte]).isEmpty)
    // corrupt near-Int.MaxValue length prefix: int arithmetic would
    // wrap the bounds check negative and throw out of copyOfRange —
    // must parse to zero frames instead (the crawl-tail contract)
    val evil = Array[Byte](0x7F, -1, -1, -16, 1, 2, 3)
    assert(FrameContainer.unpack(evil).isEmpty)
  }

  test("decodeFrames: stride sampling, exact cross-frame luma, bad frames counted") {
    import spark.implicits._
    // 3 frames of 2x1: (10,20) (30,40) (junk) — stride 2 decodes f0 + f2
    val good0 = ImageCodec.encodeGrayPng(Array[Byte](10, 20), 2, 1)
    val good1 = ImageCodec.encodeGrayPng(Array[Byte](30, 40), 2, 1)
    val packed = FrameContainer.pack(Seq(good0, good1, "junk".getBytes("UTF-8")))
    val ds = Seq((1L, "video", packed, 0, 0)).toDF(
        "media_id", "kind", "media", "width", "height").as[MediaRow]
    val s = MediaPipeline.decodeFrames(ds, stride = 2).collect().head
    assert(s.n_frames == 3L && s.n_decoded == 1L && s.n_bad == 1L, s.toString)
    // only frame 0 decoded: mean = (10+20)*10000/(255*2)
    assert(s.mean_luma_bp == 30L * 10000 / (255 * 2), s.toString)
    // stride 1 decodes all three, two good
    val s1 = MediaPipeline.decodeFrames(ds, stride = 1).collect().head
    assert(s1.n_decoded == 2L && s1.n_bad == 1L &&
      s1.mean_luma_bp == 100L * 10000 / (255 * 4), s1.toString)
  }

  test("MJPEG container: JPEG frames through decodeFrames — stride math, " +
      "luma band, genuine per-frame loss, truncated-container contract") {
    import spark.implicits._
    val q = MediaPipeline.JpegQualityBp
    // corpus-envelope frames (lowercase ASCII, the query's 8x8 shape):
    // the decoded cross-frame mean must sit inside the x_media_jpeg
    // tolerance band (50 bp — 3x the measured 15 bp max) against the
    // exact source-byte mean of the SAME sampled frames
    val rnd = new scala.util.Random(13)
    val payloads = (0 until 40).map { id =>
      val nf = 4 + id % 3
      val frames = (0 until nf).map { _ =>
        Array.tabulate(64)(_ => (97 + rnd.nextInt(26)).toByte)
      }
      (id.toLong, nf, frames)
    }
    val ds = payloads.map { case (id, _, frames) =>
      (id, "video",
        FrameContainer.pack(frames.map(ImageCodec.encodeGrayJpeg(_, 8, 8, q))),
        8, 8)
    }.toDF("media_id", "kind", "media", "width", "height").as[MediaRow]
    val out = MediaPipeline.decodeFrames(ds, stride = 2).collect()
      .map(s => s.media_id -> s).toMap
    payloads.foreach { case (id, nf, frames) =>
      val s = out(id)
      assert(s.n_frames == nf.toLong && s.n_bad == 0L, s.toString)
      assert(s.n_decoded == (nf + 1L) / 2, s.toString)
      val sampled = frames.indices.filter(_ % 2 == 0).map(frames)
      val exact = sampled.flatten.map(b => (b & 0xFF).toLong).sum *
        10000L / (255L * 64 * sampled.length)
      assert(math.abs(s.mean_luma_bp - exact) <= 50L,
        s"cross-frame luma err ${math.abs(s.mean_luma_bp - exact)} bp: $s")
    }
    // genuine lossiness at frame granularity: a checkerboard frame does
    // NOT roundtrip sample-exact through the container (the anti-PNG
    // check, per frame rather than per image)
    val cb = Array.tabulate(64)(i => (if ((i / 8 + i % 8) % 2 == 0) 0 else 255).toByte)
    val packed = FrameContainer.pack(Seq(ImageCodec.encodeGrayJpeg(cb, 8, 8, q)))
    val frame = FrameContainer.unpack(packed).head
    val feats = ImageCodec.columnFeatures(frame).get
    val exactCols = (0 until 8).map(x =>
      (0 until 8).map(y => cb(y * 8 + x) & 0xFF).sum.toDouble)
    assert(feats.toSeq != exactCols, "MJPEG frame decoded sample-exact — not lossy?")
    // truncated container: complete JPEG prefix frames survive, the cut
    // frame is gone (parse contract), nothing throws
    val two = FrameContainer.pack(Seq(
      ImageCodec.encodeGrayJpeg(cb, 8, 8, q), ImageCodec.encodeGrayJpeg(cb, 8, 8, q)))
    val cutDs = Seq((7L, "video", java.util.Arrays.copyOf(two, two.length - 3), 8, 8))
      .toDF("media_id", "kind", "media", "width", "height").as[MediaRow]
    val cut = MediaPipeline.decodeFrames(cutDs, stride = 1).collect().head
    assert(cut.n_frames == 1L && cut.n_decoded == 1L && cut.n_bad == 0L, cut.toString)
  }

  test("decodeImages over a stream matches the batch pass (stateless parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def mk(id: Long, w: Int, h: Int): (Long, Array[Byte]) =
      id -> ImageCodec.encodeGrayPng(
        Array.tabulate(w * h)(i => ((id * 31 + i) % 251).toByte), w, h)
    // a JPEG row rides along: the decode stage is container-agnostic, so
    // the lossy path gets the same stream≡batch pin as the lossless one
    val rows = Seq(mk(1L, 5, 3), mk(2L, 8, 8), 3L -> "corrupt".getBytes("UTF-8"),
      4L -> ImageCodec.encodeGrayJpeg(
        Array.tabulate(60)(i => ((i * 13 + 5) % 251).toByte), 10, 6,
        MediaPipeline.JpegQualityBp))

    def asMedia(df: org.apache.spark.sql.DataFrame) = df
      .select($"media_id", org.apache.spark.sql.functions.lit("image").as("kind"),
        $"media", org.apache.spark.sql.functions.lit(0).as("width"),
        org.apache.spark.sql.functions.lit(0).as("height"))
      .as[MediaRow]

    val mem = MemoryStream[(Long, Array[Byte])]
    val q = MediaPipeline.decodeImages(asMedia(mem.toDS().toDF("media_id", "media")))
      .toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("imgdecode").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val live = spark.table("imgdecode").collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getInt(3), r.getInt(4),
          r.getInt(5), r.getLong(6))).sortBy(_._1)
      val batch = MediaPipeline.decodeImages(
          asMedia(rows.toDF("media_id", "media")))
        .collect()
        .map(m => (m.media_id, m.ok, m.width, m.height, m.channels, m.mean_luma_bp))
        .sortBy(_._1)
      assert(live.sameElements(batch), s"live=${live.mkString(",")} batch=${batch.mkString(",")}")
      assert(batch.count(!_._2) == 1 && batch.count(_._2) == 3)
    } finally q.stop()
  }
}
