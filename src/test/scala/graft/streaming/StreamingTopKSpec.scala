package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** StreamingTopK parity with the batch x_freq_items contract: corpus
  * fed as a 3-batch token stream; the final candidate union, exactly
  * rescored (the batch query's own second pass), reproduces the exact
  * top-10, with bounded per-bucket state and lower-bound estimates. */
class StreamingTopKSpec extends AnyFunSuite with SparkTestBase {

  test("3-batch stream: rescored candidate union = exact top-10; state bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val toks = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", explode(expr(
        "filter(split(lower(text), ' +'), x -> x != '')")).as("token"))
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTotal = exact.valuesIterator.sum
    val top10 = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(10)

    val batches = (0 until 3).map(i =>
      toks.where($"doc_id" % 3 === i).select($"token").as[String].collect())

    val mem = MemoryStream[String]
    val q = StreamingTopK.candidates(mem.toDS().toDF("token"),
        buckets = 8, k = 64)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("topk1").start()
    try {
      batches.foreach { b => mem.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    val rows = spark.table("topk1")
      .select($"bucket", $"gen", $"token", $"est", $"n_bucket").collect()
    val maxGen = rows.groupBy(_.getInt(0)).map { case (b, rs) =>
      b -> rs.map(_.getLong(1)).max }
    val finals = rows.filter(r => r.getLong(1) == maxGen(r.getInt(0)))

    // exact stream length conserved across bucket states
    val bucketTotals = finals.map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(bucketTotals.values.sum == nTotal,
      s"bucket totals ${bucketTotals.values.sum} != corpus tokens $nTotal")

    // bounded state: ≤ k candidates per bucket
    finals.groupBy(_.getInt(0)).foreach { case (b, rs) =>
      assert(rs.length <= 64, s"bucket $b holds ${rs.length} > k candidates")
    }

    // MG lower-bound property
    finals.foreach { r =>
      assert(r.getLong(3) <= exact(r.getString(2)),
        s"estimate exceeds exact count for ${r.getString(2)}")
    }

    // rescored union reproduces the exact top-10 (the batch contract)
    val union = finals.map(_.getString(2)).toSet
    top10.foreach { case (t, _) =>
      assert(union.contains(t), s"heavy hitter '$t' missing from candidates")
    }
    val rescored = union.toSeq.map(t => t -> exact(t))
      .sortBy { case (t, n) => (-n, t) }.take(10)
    assert(rescored == top10, s"rescored top-10 diverged:\n$rescored\n$top10")
  }
}
