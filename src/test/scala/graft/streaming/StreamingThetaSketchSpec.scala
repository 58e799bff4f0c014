package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Live theta-sketch maintenance (the 18th streaming twin): the
  * audience-overlap artifact built from a stream must equal the
  * batch-built one — and in theta's exact mode (every test SF) equal
  * BRUTE-FORCE set ops, the independent spelling that doesn't reuse
  * the operator's code — and survive a checkpoint restart. */
class StreamingThetaSketchSpec extends AnyFunSuite with SparkTestBase {

  private def eventsAll =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("user_id"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1)))

  private def bruteForce: Map[(String, String), (Long, Long, Long)] = {
    val tu = eventsAll.distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val types = tu.keys.toSeq.sorted
    (for (ta <- types; tb <- types if ta < tb) yield (ta, tb) -> (
      (tu(ta) & tu(tb)).size.toLong,
      (tu(ta) -- tu(tb)).size.toLong,
      (tu(ta) | tu(tb)).size.toLong)).toMap
  }

  private def collectOverlap(dir: String) =
    StreamingThetaSketch.overlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("streamed theta artifact: set-op estimates equal brute force (exact mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("thetastream")
    val mem = MemoryStream[(String, Long)]
    val q = StreamingThetaSketch.start(
      mem.toDS().toDF("event_type", "user_id"),
      outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      val all = rows(eventsAll)
      val (h, t) = all.splitAt(all.length / 3)
      mem.addData(h.toIndexedSeq); q.processAllAvailable()
      mem.addData(t.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val got = collectOverlap(s"$dir/out")
    val exact = bruteForce
    assert(got == exact, s"live theta diverged: $got vs $exact")
  }

  test("restart from checkpoint: state resumes, post-restart arrivals still count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("thetarestart")
    val mem = MemoryStream[(String, Long)]
    def start() = StreamingThetaSketch.start(
      mem.toDS().toDF("event_type", "user_id"),
      outDir = s"$dir/out", checkpoint = s"$dir/ckpt")

    val all = rows(eventsAll)
    val (h, t) = all.splitAt(all.length / 2)
    val q1 = start()
    try { mem.addData(h.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { mem.addData(t.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    assert(collectOverlap(s"$dir/out") == bruteForce,
      "restarted theta artifact diverged from brute force")
  }
}
