package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Live HLL sketch maintenance: the artifact built from a stream must
  * be indistinguishable from the batch-built one (HLL state is a
  * set-function of the inputs — batching-invariant), and survive a
  * checkpoint restart without re-counting or losing arrivals. */
class StreamingSketchSpec extends AnyFunSuite with SparkTestBase {

  private def eventsAll = {
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("user_id"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getTimestamp(0), r.getString(1), r.getLong(2)))

  test("streamed sketch table: estimates equal the batch-built artifact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val e = eventsAll
    val dir = tmpDir("sketchstream")
    val expected = e
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val mem = MemoryStream[(Timestamp, String, Long)]
    val q = StreamingSketch.start(
      mem.toDS().toDF("ts", "event_type", "user_id"),
      outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      val all = rows(e)
      val (h, t) = all.splitAt(all.length / 3)
      mem.addData(h.toIndexedSeq); q.processAllAvailable()
      mem.addData(t.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val got = StreamingSketch.estimates(spark, s"$dir/out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"live artifact diverged from batch artifact: $got vs $expected")
  }

  test("snapshot isolation: uncommitted newer version invisible, read grace of one batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("sketchsnap")
    val mem = MemoryStream[(Timestamp, String, Long)]
    val q = StreamingSketch.start(
      mem.toDS().toDF("ts", "event_type", "user_id"),
      outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    def versions() = new java.io.File(s"$dir/out").listFiles
      .filter(_.getName.startsWith("v=")).map(_.getName).toSet
    val grace = try {
      mem.addData(rows(eventsAll).take(50).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows(eventsAll).slice(50, 100).toIndexedSeq)
      q.processAllAvailable()
      // retention keeps the PREVIOUS committed snapshot (read grace):
      // after batches 0 and 1 both dirs survive
      assert(versions() == Set("v=0", "v=1"),
        s"expected current+previous snapshots, got ${versions()}")
      // a reader that resolved v=1 BEFORE batch 2 commits must finish
      // its action on intact files afterward
      val pinned = StreamingSketch.estimates(spark, s"$dir/out")
      mem.addData(rows(eventsAll).slice(100, 150).toIndexedSeq)
      q.processAllAvailable()
      assert(versions() == Set("v=1", "v=2"),
        s"expected v=0 pruned at batch 2, got ${versions()}")
      pinned.collect().map(_.toString).toSeq // would FNF under prune-to-one
    } finally q.stop()
    assert(grace.nonEmpty, "pinned pre-commit reader lost its snapshot")
    val before = StreamingSketch.estimates(spark, s"$dir/out")
      .collect().map(_.toString).toSeq
    // an in-flight (no _SUCCESS) newer snapshot must be invisible to
    // readers — simulate a crash mid-write
    val inflight = new java.io.File(s"$dir/out/v=999")
    assert(inflight.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/out/v=999/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    val after = StreamingSketch.estimates(spark, s"$dir/out")
      .collect().map(_.toString).toSeq
    assert(after == before, "reader saw an uncommitted snapshot")
  }

  test("estimates before any commit: clear error, not FNF/empty-maxBy") {
    val dir = tmpDir("sketchempty")
    val eAbsent = intercept[IllegalArgumentException] {
      StreamingSketch.estimates(spark, s"$dir/nonexistent")
    }
    assert(eAbsent.getMessage.contains("no committed sketch snapshot"))
    // root exists but only an uncommitted dir inside
    assert(new java.io.File(s"$dir/out/v=0").mkdirs())
    val eUncommitted = intercept[IllegalArgumentException] {
      StreamingSketch.estimates(spark, s"$dir/out")
    }
    assert(eUncommitted.getMessage.contains("no committed sketch snapshot"))
  }

  test("restart from checkpoint: state resumes, post-restart arrivals still count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val e = eventsAll
    val dir = tmpDir("sketchrestart")
    val mem = MemoryStream[(Timestamp, String, Long)]
    def start() = StreamingSketch.start(
      mem.toDS().toDF("ts", "event_type", "user_id"),
      outDir = s"$dir/out", checkpoint = s"$dir/ckpt")

    val all = rows(e)
    val (h, t) = all.splitAt(all.length / 2)
    val q1 = start()
    try { mem.addData(h.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { mem.addData(t.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()

    val expected = e
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = StreamingSketch.estimates(spark, s"$dir/out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"restarted artifact diverged: $got vs $expected")
  }
}
