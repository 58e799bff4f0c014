package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Online PCA projection (the 22nd streaming twin, the second over a
  * TRAINED model): the live per-dim projection rollup must EQUAL the
  * batch x_pca_oracle's proj_sum column over the same vectors — exact
  * equality, and the batch side is itself oracle-hash-matched, so the
  * pin chains stream ≡ batch ≡ DuckDB — across micro-batch splits and
  * a checkpoint restart. */
class StreamingPcaSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def embRows =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

  /** Batch reference: the oracle-pinned declared query's
    * (dim, proj_sum) pairs. */
  private def batchExpected =
    graft.SparkEntry.queries("x_pca_oracle")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(3))
      .toMap

  private def liveProjections(dir: String) =
    StreamingPcaProject.projections(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  private def model = graft.queries.VectorOps.pcaArithState(spark, sf)

  test("streamed projection rollup EQUALS the oracle-pinned batch query (exact)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("pcastream")
    val (m, v) = model
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingPcaProject.start(
      mem.toDS().toDF("vec_id", "embedding"),
      m, v, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      val all = embRows
      val (h, t) = all.splitAt(all.length / 3)
      mem.addData(h.toIndexedSeq); q.processAllAvailable()
      mem.addData(t.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    assert(liveProjections(s"$dir/out") == batchExpected,
      "live projection rollup diverged from the oracle-pinned batch query")
  }

  test("restart from checkpoint: state resumes, post-restart arrivals still count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("pcarestart")
    val (m, v) = model
    val mem = MemoryStream[(Long, Seq[Float])]
    def start() = StreamingPcaProject.start(
      mem.toDS().toDF("vec_id", "embedding"),
      m, v, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    val all = embRows
    val (h, t) = all.splitAt(all.length / 2)
    val q1 = start()
    try { mem.addData(h.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { mem.addData(t.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    assert(liveProjections(s"$dir/out") == batchExpected,
      "post-restart rollup diverged from the batch reference")
  }

  test("an off-envelope arrival FAILS LOUDLY instead of rounding silently " +
      "(ADVICE r14: per-row exactness needs |c|∞ within the trained envelope)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("pcaenv")
    val (m, v) = model
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingPcaProject.start(
      mem.toDS().toDF("vec_id", "embedding"),
      m, v, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      // |q| = floor(4e5·100) = 4e7 per dim — the ADVICE scenario: the
      // double product c[d]·u would exceed 2^53 and round BEFORE the
      // BIGINT cast; the guard must kill the query, not serve the row
      mem.addData(Seq((999999L, Seq.fill(64)(4.0e5f))))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(ex).exists(t => Option(t.getMessage)
          .exists(_.contains("trained exact-double envelope"))),
        s"query failed for the wrong reason: $ex")
    } finally q.stop()
  }
}
