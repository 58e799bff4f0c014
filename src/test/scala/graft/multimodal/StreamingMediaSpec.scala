package graft.multimodal

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The multimodal pipeline stages are narrow batched mapPartitions
  * passes, so the same code runs unchanged under Structured Streaming —
  * media arriving as a stream is decoded/frame-sampled incrementally
  * with zero state. This pins that property (the ingest-time shape of a
  * media pipeline: per-arrival codec work, no shuffle, batch parity). */
class StreamingMediaSpec extends AnyFunSuite with SparkTestBase {

  private def mediaRows(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("media_id", "payload")
      .select($"media_id", org.apache.spark.sql.functions.lit("video").as("kind"),
        $"payload".cast("binary").as("media"),
        org.apache.spark.sql.functions.lit(0).as("width"),
        org.apache.spark.sql.functions.lit(0).as("height"))
      .as[MediaRow]
  }

  test("frameSummary over a media stream reproduces the batch summaries across batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(1L -> ("x" * 200), 2L -> ("ab" * 40))
    val batch2 = Seq(3L -> ("frame payload " * 30), 4L -> "tiny")
    val all = batch1 ++ batch2

    val mem = MemoryStream[(Long, String)]
    val streamed = MediaPipeline.frameSummary(
      mem.toDS().toDF("media_id", "payload")
        .select($"media_id", org.apache.spark.sql.functions.lit("video").as("kind"),
          $"payload".cast("binary").as("media"),
          org.apache.spark.sql.functions.lit(0).as("width"),
          org.apache.spark.sql.functions.lit(0).as("height"))
        .as[MediaRow],
      frameBytes = 64, stride = 2)

    val q = streamed.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("mediastream1").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val live = spark.table("mediastream1").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).sortBy(_._1)
      val batch = MediaPipeline.frameSummary(mediaRows(all), 64, 2)
        .collect()
        .map(f => (f.media_id, f.n_bytes, f.n_frames, f.n_sampled, f.probe_sum))
        .sortBy(_._1)
      assert(live.sameElements(batch),
        s"live=${live.mkString(",")} batch=${batch.mkString(",")}")
      // spot-check one row's arithmetic: 200 bytes → 4 frames → 2 sampled
      val r1 = batch.find(_._1 == 1L).get
      assert(r1 == ((1L, 200L, 4L, 2L, 2L * 'x'.toLong)), r1.toString)
    } finally q.stop()
  }

  test("frameSummary stream survives a query restart (checkpoint resume, no re-emission)") {
    // the stage is stateless, so the restart contract is about the
    // CHECKPOINT's source offsets: rows processed before the stop must
    // not re-emit on resume, rows arriving after must process — i.e.
    // each media payload's codec work happens exactly once across the
    // outage, the property a day-long media ingest actually relies on
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("mediackpt")
    val mem = MemoryStream[(Long, String)]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    def start() = MediaPipeline.frameSummary(
        mem.toDS().toDF("media_id", "payload")
          .select($"media_id", org.apache.spark.sql.functions.lit("video").as("kind"),
            $"payload".cast("binary").as("media"),
            org.apache.spark.sql.functions.lit(0).as("width"),
            org.apache.spark.sql.functions.lit(0).as("height"))
          .as[MediaRow],
        frameBytes = 64, stride = 2)
      .toDF().writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          seen.add((r.getLong(0), r.getLong(2), r.getLong(3))))
      }
      .start()

    val q1 = start()
    try {
      mem.addData(1L -> ("x" * 200), 2L -> ("ab" * 40))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.size == 2, s"first run must emit both rows: $seen")

    val q2 = start()
    try {
      mem.addData(3L -> ("frame payload " * 30))
      q2.processAllAvailable()
      val ids = seen.toArray(Array.empty[(Long, Long, Long)]).toSeq.sortBy(_._1)
      assert(ids.map(_._1) == Seq(1L, 2L, 3L),
        s"resume must process exactly the new row, once: $ids")
      // and the resumed row's summary matches the batch pipeline's
      val want = MediaPipeline.frameSummary(
          mediaRows(Seq(3L -> ("frame payload " * 30))), 64, 2)
        .collect().map(f => (f.media_id, f.n_bytes, f.n_frames)).head
      assert(ids.last == want, s"got ${ids.last}, want $want")
    } finally q2.stop()
  }

  test("streaming resize + extractFeatures stay stateless and match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(10L -> ("abcd" * 32), 11L -> ("zzzz" * 8))
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDS().toDF("media_id", "payload")
      .select($"media_id", org.apache.spark.sql.functions.lit("image").as("kind"),
        $"payload".cast("binary").as("media"),
        org.apache.spark.sql.functions.lit(8).as("width"),
        org.apache.spark.sql.functions.lit(4).as("height"))
      .as[MediaRow]
    val live = MediaPipeline.extractFeatures(
      MediaPipeline.resizeAll(src, targetW = 4, targetH = 2))

    val q = live.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("mediastream2").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("mediastream2").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
      val batchSrc = rows.toDF("media_id", "payload")
        .select($"media_id", org.apache.spark.sql.functions.lit("image").as("kind"),
          $"payload".cast("binary").as("media"),
          org.apache.spark.sql.functions.lit(8).as("width"),
          org.apache.spark.sql.functions.lit(4).as("height"))
        .as[MediaRow]
      val want = MediaPipeline.extractFeatures(
        MediaPipeline.resizeAll(batchSrc, 4, 2)).collect()
        .map(f => (f.media_id, f.n_bytes, f.checksum)).sortBy(_._1)
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("decodeFrames over an MJPEG stream matches the batch pass (lossy-video parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // real MJPEG payloads (JPEG frames in the length-prefixed
    // container) + one corrupt-frame payload: the REAL per-frame lossy
    // decode runs incrementally with zero state, batch-identical
    def mk(id: Long, nf: Int): (Long, Array[Byte]) = {
      val frames = (0 until nf).map { f =>
        ImageCodec.encodeGrayJpeg(
          Array.tabulate(64)(i => ((id * 31 + f * 7 + i) % 251).toByte), 8, 8,
          MediaPipeline.JpegQualityBp)
      }
      id -> FrameContainer.pack(frames)
    }
    val rows = Seq(mk(1L, 4), mk(2L, 5),
      3L -> FrameContainer.pack(Seq(
        ImageCodec.encodeGrayJpeg(Array.fill(64)(50.toByte), 8, 8,
          MediaPipeline.JpegQualityBp),
        "not a jpeg".getBytes("UTF-8"))))

    def asMedia(df: org.apache.spark.sql.DataFrame) = df
      .select($"media_id", org.apache.spark.sql.functions.lit("video").as("kind"),
        $"media", org.apache.spark.sql.functions.lit(8).as("width"),
        org.apache.spark.sql.functions.lit(8).as("height"))
      .as[MediaRow]

    val mem = MemoryStream[(Long, Array[Byte])]
    val q = MediaPipeline.decodeFrames(
        asMedia(mem.toDS().toDF("media_id", "media")), stride = 1)
      .toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("mjpegstream").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val live = spark.table("mjpegstream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).sortBy(_._1)
      val batch = MediaPipeline.decodeFrames(
          asMedia(rows.toDF("media_id", "media")), stride = 1)
        .collect()
        .map(s => (s.media_id, s.n_frames, s.n_decoded, s.n_bad, s.mean_luma_bp))
        .sortBy(_._1)
      assert(live.sameElements(batch),
        s"live=${live.mkString(",")} batch=${batch.mkString(",")}")
      // the corrupt frame is a counted row, not a failure
      assert(batch.find(_._1 == 3L).exists(s => s._3 == 1L && s._4 == 1L))
    } finally q.stop()
  }

  test("StreamingMjpegMonitor: the x_media_mjpeg |err| band as a LIVE artifact " +
      "(snapshot commits, batch parity, corrupt tail excluded)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the x_media_mjpeg construction: per payload, frames rendered from
    // a deterministic source array, encoded as REAL JPEGs; the expected
    // side is the SOURCE-byte mean over the same sampled frames
    // (stride 2) — no codec on that side
    val stride = 2
    def src(id: Long, f: Int, i: Int): Int = ((id * 31 + f * 7 + i) % 251).toInt
    def mk(id: Long, nf: Int): (Long, Array[Byte]) =
      id -> FrameContainer.pack((0 until nf).map { f =>
        ImageCodec.encodeGrayJpeg(
          Array.tabulate(64)(i => src(id, f, i).toByte), 8, 8,
          MediaPipeline.JpegQualityBp)
      })
    def expectedBp(id: Long, nf: Int): Long = {
      var s = 0L; var nd = 0L; var f = 0
      while (f < nf) {
        var i = 0
        while (i < 64) { s += src(id, f, i); i += 1 }
        nd += 1; f += stride
      }
      s * 10000L / (255L * 64L * nd)
    }
    val batch1 = Seq(mk(1L, 4), mk(2L, 5))
    val batch2 = Seq(mk(4L, 6),
      // corrupt payload: bad frame FIRST so stride-2 sampling (frame 0)
      // actually decodes it — must count into n_bad/n_frames but stay
      // OUT of the error band
      3L -> FrameContainer.pack(Seq(
        "not a jpeg".getBytes("UTF-8"),
        ImageCodec.encodeGrayJpeg(Array.fill(64)(50.toByte), 8, 8,
          MediaPipeline.JpegQualityBp))))
    val expected = Seq((1L, expectedBp(1L, 4)), (2L, expectedBp(2L, 5)),
      (4L, expectedBp(4L, 6)), (3L, 0L))
      .toDF("media_id", "exact_luma_bp")

    def asMedia(df: org.apache.spark.sql.DataFrame) = df
      .select($"media_id", org.apache.spark.sql.functions.lit("video").as("kind"),
        $"media", org.apache.spark.sql.functions.lit(8).as("width"),
        org.apache.spark.sql.functions.lit(8).as("height"))
      .as[MediaRow]

    val outDir = tmpDir("mjpegband")
    val ckpt = tmpDir("mjpegbandckpt")
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamingMjpegMonitor.start(
      asMedia(mem.toDS().toDF("media_id", "media")), expected, stride,
      outDir, ckpt)
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      val mid = graft.streaming.StreamingMjpegMonitor.band(spark, outDir)
        .collect().head
      assert(mid.getLong(0) == 2L, s"mid-stream n_payloads: $mid")

      mem.addData(batch2: _*)
      q.processAllAvailable()
      val fin = graft.streaming.StreamingMjpegMonitor.band(spark, outDir)
        .collect().head
      // accounting: all 4 payloads, 4+5+6+2 frames, the corrupt frame
      // counted (stride 2 samples frames 0 for payload 3 → its bad
      // frame at index 1 is NOT sampled — so build the expectation from
      // the decode pass itself for the counts)
      val allRows = batch1 ++ batch2
      val batchDecoded = MediaPipeline.decodeFrames(
          asMedia(allRows.toDF("media_id", "media")), stride)
        .toDF().join(expected, "media_id")
        .select($"media_id", $"n_frames", $"n_decoded", $"n_bad",
          org.apache.spark.sql.functions.abs(
            $"mean_luma_bp" - $"exact_luma_bp").as("err"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(fin.getLong(0) == 4L)
      assert(fin.getLong(1) == batchDecoded.map(_._2).sum)
      assert(fin.getLong(2) == batchDecoded.map(_._3).sum)
      assert(fin.getLong(3) == batchDecoded.map(_._4).sum)
      // live band ≡ batch band over the same rows (clean payloads only)
      val clean = batchDecoded.filter(_._4 == 0L)
      assert(fin.getLong(4) == clean.map(_._5).max,
        s"max_err_bp live=${fin.getLong(4)} batch=${clean.map(_._5).max}")
      assert(fin.getLong(5) == clean.map(_._5).sum / clean.length)
      // the trust band itself: inside the x_media_mjpeg spec band
      assert(fin.getLong(4) <= 50L,
        s"live lossy band escaped the ≤50 bp spec: ${fin.getLong(4)}")
    } finally q.stop()
  }
}
