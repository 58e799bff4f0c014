package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The curation signals are plain codegen expressions, so the same
  * filter chain that runs over the batch corpus drops into Structured
  * Streaming unchanged — documents arriving as a stream are scored,
  * gated and deduplicated incrementally. This pins that property (the
  * shape an ingest-time curation pipeline runs at scale: filters are
  * per-row/narrow, dedup state is keyed by content hash).
  */
class StreamingCurationSpec extends AnyFunSuite with SparkTestBase {

  test("quality/lang/length gates + exact dedup run incrementally over a document stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.TokenCounts.register(spark)

    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDS().toDF("doc_id", "text")

    // the same signals as x_filter_chain / x_lang_id, per-row kernels;
    // exact dedup keyed by content hash via dropDuplicates (streaming
    // state store holds one hash per seen document)
    val curated = docs
      .withColumn("n_toks", expr("ws_token_count(text)"))
      .withColumn("stop_hits", expr("stop_token_count(text)"))
      .where($"n_toks" >= 3 &&
        ($"stop_hits" * 10000.0) / $"n_toks" >= 300)
      .withColumn("content_hash", sha2($"text", 256))
      .dropDuplicates("content_hash")

    val q = curated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("curated1").start()
    try {
      mem.addData(
        (1L, "the cat sat on the mat"),          // passes (stop ratio high)
        (2L, "alpha beta gamma delta"),          // fails lang gate (no stop words)
        (3L, "to be"))                           // fails length gate (2 tokens)
      q.processAllAvailable()
      mem.addData(
        (4L, "the cat sat on the mat"),          // exact dup of 1 across batches
        (5L, "a dog in the yard is happy"))      // passes
      q.processAllAvailable()
      val ids = spark.table("curated1").collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 5L)),
        s"expected docs 1 and 5 to survive, got ${ids.mkString(",")}")
    } finally q.stop()
  }
}
