package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Live quantile-sketch maintenance (the 19th streaming twin): bucket
  * counts are an exact additive set-function of the inputs, so the
  * live artifact must EQUAL the batch x_sketch_quantiles rows over the
  * same events — exact equality, not a tolerance — across micro-batch
  * splits and a checkpoint restart. The reference values come from the
  * DECLARED batch query (its own correctness is oracle-pinned), which
  * does not share the streaming code path. */
class StreamingQuantileSketchSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def eventsAll =
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("value"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDouble(1)))

  private def batchExpected =
    graft.SparkEntry.queries("x_sketch_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  private def liveQuantiles(dir: String) =
    StreamingQuantileSketch.quantiles(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("streamed quantile artifact EQUALS the batch query's rows (exact)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("qsketchstream")
    val mem = MemoryStream[(String, Double)]
    val q = StreamingQuantileSketch.start(
      mem.toDS().toDF("event_type", "value"),
      outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      val all = rows(eventsAll)
      val (h, t) = all.splitAt(all.length / 3)
      mem.addData(h.toIndexedSeq); q.processAllAvailable()
      mem.addData(t.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    assert(liveQuantiles(s"$dir/out") == batchExpected,
      "live quantile artifact diverged from the batch query")
  }

  test("restart from checkpoint: state resumes, post-restart arrivals still count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("qsketchrestart")
    val mem = MemoryStream[(String, Double)]
    def start() = StreamingQuantileSketch.start(
      mem.toDS().toDF("event_type", "value"),
      outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    val all = rows(eventsAll)
    val (h, t) = all.splitAt(all.length / 2)
    val q1 = start()
    try { mem.addData(h.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { mem.addData(t.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    assert(liveQuantiles(s"$dir/out") == batchExpected,
      "restarted quantile artifact diverged from the batch query")
  }
}
