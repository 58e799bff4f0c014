package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The streaming twin of the persisted exact-dedup index: first arrival
  * keeps, later verbatim copies report against the original keeper —
  * across micro-batches and across a checkpoint restart. */
class StreamingExactDedupSpec extends AnyFunSuite with SparkTestBase {

  test("duplicates detected across batch splits with first-arrival keeper") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingExactDedup.dups(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("exactdup1").start()
    try {
      // batch 1: two distinct texts plus an intra-batch copy
      mem.addData((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      q.processAllAvailable()
      // batch 2: cross-batch copy of each + one fresh text
      mem.addData((10L, "gamma delta"), (11L, "alpha beta"), (12L, "fresh text"))
      q.processAllAvailable()
      val got = spark.table("exactdup1").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((3L, 1L), (10L, 2L), (11L, 1L)))
    } finally q.stop()
  }

  test("matches the batch operator on the testdata corpus streamed in thirds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // batch ground truth: every doc whose text appeared under a smaller id
    val batch = docs.as("a").join(docs.as("b"),
        $"a.text" === $"b.text" && $"a.doc_id" > $"b.doc_id")
      .groupBy($"a.doc_id".as("dup_id"))
      .agg(min($"b.doc_id").as("keeper_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingExactDedup.dups(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("exactdup2").start()
    try {
      val third = rows.length / 3
      mem.addData(rows.take(third).toIndexedSeq); q.processAllAvailable()
      mem.addData(rows.slice(third, 2 * third).toIndexedSeq); q.processAllAvailable()
      mem.addData(rows.drop(2 * third).toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("exactdup2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch,
        s"streamed ${streamed.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("stream bootstrapped from an ExactDedup index resolves to index keepers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "indexed text one"), (2L, "indexed text two"))
      .toDF("doc_id", "text")
    val dir = tmpDir("exactboot")
    graft.operators.ExactDedup.saveIndex(corpus, "doc_id", "text", s"$dir/idx")

    val mem = MemoryStream[(Long, String)]
    val q = StreamingExactDedup.dups(
        mem.toDS().toDF("doc_id", "text"),
        bootstrapIndex = Some(s"$dir/idx"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("exactboot").start()
    try {
      // first batch: copies of indexed docs report against INDEX keepers
      // without the corpus ever streaming; a fresh text keeps silently
      mem.addData((100L, "indexed text two"), (101L, "brand new text"))
      q.processAllAvailable()
      val got = spark.table("exactboot").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((100L, 2L)))
    } finally q.stop()
  }

  test("keeper state survives a query restart (checkpoint resume)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("exactdupckpt")
    val mem = MemoryStream[(Long, String)]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = StreamingExactDedup.dups(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[StreamingExactDedup.Dup], _: Long) =>
          batch.collect().foreach(d => seen.add(d.dup_id -> d.keeper_id))
      }
      .start()

    val q1 = start()
    try {
      mem.addData((1L, "persistent text")); q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.isEmpty, s"keeper must not self-report: $seen")

    // run 2, same checkpoint: a copy of the pre-restart doc must resolve
    // to the ORIGINAL keeper — only the resumed digest state knows id 1
    val q2 = start()
    try {
      mem.addData((50L, "persistent text")); q2.processAllAvailable()
      assert(seen.contains(50L -> 1L), s"state not resumed across restart: $seen")
    } finally q2.stop()
  }
}
