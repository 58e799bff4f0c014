package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Online cluster assignment (the 20th streaming twin, the first over
  * a TRAINED model): the live per-cell rollup must EQUAL the batch
  * x_kmeans_oracle rows over the same vectors — exact equality, and
  * the batch side is itself oracle-hash-matched, so the pin chains
  * stream ≡ batch ≡ DuckDB — across micro-batch splits and a
  * checkpoint restart. The assignment expression is the batch query's
  * own column; the reference values come from the DECLARED query,
  * which does not share the streaming sink path. */
class StreamingKMeansSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def embRows =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

  /** Batch reference: the oracle-pinned declared query's nonempty
    * cells (the streaming groupBy only materializes seen cids). */
  private def batchExpected =
    graft.SparkEntry.queries("x_kmeans_oracle")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 > 0L)
      .map { case (cid, n, ids) => cid -> (n, ids) }
      .toMap

  private def liveRollup(dir: String) =
    StreamingKMeansAssign.assignments(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  private def cents = graft.queries.VectorOps.kmeansArithCents(spark, sf)

  test("streamed assignment rollup EQUALS the oracle-pinned batch query (exact)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("kmstream")
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingKMeansAssign.start(
      mem.toDS().toDF("vec_id", "embedding"),
      cents, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      val all = embRows
      val (h, t) = all.splitAt(all.length / 3)
      mem.addData(h.toIndexedSeq); q.processAllAvailable()
      mem.addData(t.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    assert(liveRollup(s"$dir/out") == batchExpected,
      "live assignment rollup diverged from the oracle-pinned batch query")
  }

  test("restart from checkpoint: state resumes, post-restart arrivals still count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("kmrestart")
    val mem = MemoryStream[(Long, Seq[Float])]
    def start() = StreamingKMeansAssign.start(
      mem.toDS().toDF("vec_id", "embedding"),
      cents, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    val all = embRows
    val (h, t) = all.splitAt(all.length / 2)
    val q1 = start()
    try { mem.addData(h.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { mem.addData(t.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    assert(liveRollup(s"$dir/out") == batchExpected,
      "post-restart rollup diverged from the batch reference")
  }
}
