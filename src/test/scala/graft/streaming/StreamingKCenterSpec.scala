package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Live coreset cover monitor (the 23rd streaming twin, the third over
  * a TRAINED model): the live (n_vectors, cover_d2) rollup must EQUAL
  * the batch x_kcenter_coreset query's cover_d2 over the same vectors
  * — exact integer equality, and the batch side is itself
  * oracle-hash-matched, so the pin chains stream ≡ batch ≡ DuckDB —
  * across micro-batch splits and a checkpoint restart. */
class StreamingKCenterSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def embRows =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

  /** Batch reference: the oracle-pinned declared query's cover_d2
    * (constant across its rows) and the corpus row count. */
  private def batchExpected: (Long, Long) = {
    val cover = graft.SparkEntry.queries("x_kcenter_coreset")(spark, sf)
      .collect().map(_.getLong(3)).distinct
    assert(cover.length == 1, s"cover_d2 not constant: ${cover.mkString(",")}")
    (embRows.length.toLong, cover.head)
  }

  private def live(dir: String): (Long, Long) = {
    val r = StreamingKCenterCover.cover(spark, dir).collect().head
    (r.getLong(0), r.getLong(1))
  }

  private def model = graft.queries.VectorOps.kcenterState(spark, sf)
    .map(_._4)

  test("streamed cover rollup EQUALS the oracle-pinned batch cover_d2 (exact)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("kcstream")
    val sel = model
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingKCenterCover.start(
      mem.toDS().toDF("vec_id", "embedding"),
      sel, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      val all = embRows
      val (h, t) = all.splitAt(all.length / 3)
      mem.addData(h.toIndexedSeq); q.processAllAvailable()
      mem.addData(t.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    assert(live(s"$dir/out") == batchExpected,
      "live cover rollup diverged from the oracle-pinned batch query")
  }

  test("restart from checkpoint: the max resumes, post-restart arrivals count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("kcrestart")
    val sel = model
    val mem = MemoryStream[(Long, Seq[Float])]
    def start() = StreamingKCenterCover.start(
      mem.toDS().toDF("vec_id", "embedding"),
      sel, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    val all = embRows
    val (h, t) = all.splitAt(all.length / 2)
    val q1 = start()
    try { mem.addData(h.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { mem.addData(t.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    assert(live(s"$dir/out") == batchExpected,
      "post-restart cover rollup diverged from the batch reference")
  }

  test("a vector far outside the coreset RAISES cover_d2 (the retrain signal)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("kcdrift")
    val sel = model
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingKCenterCover.start(
      mem.toDS().toDF("vec_id", "embedding"),
      sel, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      mem.addData(embRows.toIndexedSeq); q.processAllAvailable()
      val base = live(s"$dir/out")
      // an off-manifold arrival: constant 5.0 per dim quantizes to 500,
      // far outside the corpus envelope (|q| <= ~60 at sf0.001)
      mem.addData(Seq((999999L, Seq.fill(64)(5.0f))))
      q.processAllAvailable()
      val drift = live(s"$dir/out")
      assert(drift._1 == base._1 + 1)
      assert(drift._2 > base._2,
        s"outlier arrival did not raise cover_d2: $base -> $drift")
    } finally q.stop()
  }

  test("an EMPTY first micro-batch serves (0, 0), never a NULL cover " +
      "(ADVICE r14: max over zero rows is NULL in Complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("kcempty")
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingKCenterCover.start(
      mem.toDS().toDF("vec_id", "embedding"),
      model, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      mem.addData(Seq.empty[(Long, Seq[Float])]) // zero-row micro-batch
      q.processAllAvailable()
      // cover() must not NPE and must serve the empty-set cover radius 0
      assert(live(s"$dir/out") == (0L, 0L),
        "empty-batch snapshot did not serve (n_vectors=0, cover_d2=0)")
    } finally q.stop()
  }
}
