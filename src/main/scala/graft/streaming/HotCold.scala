package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}

import graft.eventstore.Event

/** Live delivery modes over the event log (reference streams.clj:340-405):
  *
  *  - cold      → batch read (graft.eventstore.Replay)
  *  - hot-cold  → a Structured Streaming file source over the log dir:
  *                it replays every existing file, then tails new ones —
  *                the reference's drain-then-tap loop (streams.clj:368-397)
  *                collapses into the source's own offset tracking, and its
  *                best-effort switchover gap (sliding-buffer drops, §3.3.6)
  *                becomes checkpointed exactly-once. Deliberate upgrade
  *                (SURVEY.md §4.4).
  *  - hot       → a tail of the HOT TOPIC: ingest dual-writes each
  *                stamped batch to the log AND a small rolling topic dir
  *                (exactly the reference's publish-to-subscribers +
  *                persist fan-out, streams.clj:305-307), and hot
  *                subscriptions stream from the topic — so a live-only
  *                subscribe lists the retention window (minutes of
  *                files), never the 100 TB log history. The event_time
  *                >= subscribe-time predicate keeps delivery exact for
  *                retained pre-subscribe events.
  *
  * (A checkpoint-seeding alternative — pre-committing the log's listing
  * so the file source skips history — was rejected: a seeded committed
  * batch makes any STATEFUL consumer fail state recovery, and an
  * uncommitted seed still replays history into batch 0.)
  */
object HotCold {

  import org.apache.spark.sql.types._

  /** The on-log schema (readStream needs it declared). */
  val eventSchema: StructType = StructType(Seq(
    StructField("stream_name", StringType),
    StructField("order_id", LongType),
    StructField("event_time", TimestampType),
    StructField("service_id", StringType),
    StructField("local_id", StringType),
    StructField("schema_version", StringType),
    StructField("payload", StringType),
    StructField("provenance", StructType(Seq(
      StructField("service_id", StringType),
      StructField("local_id", StringType),
      StructField("relationship", StringType))))))

  private def source(
      spark: SparkSession,
      logDir: String,
      stream: String,
      maxFilesPerTrigger: Option[Int] = Some(32)): DataFrame = {
    var reader = spark.readStream.schema(eventSchema)
    // bound per-microbatch work on the tailing path; the listing
    // snapshot wants one batch instead
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(logDir)
    if (stream == "__all__") src else src.where(col("stream_name") === stream)
  }

  def hotCold(spark: SparkSession, logDir: String, stream: String = "__all__"): DataFrame =
    source(spark, logDir, stream)

  /** Live-only tail (reference "hot", streams.clj:399-405) over the hot
    * topic dir maintained by Ingest (`hotDir`): the subscribe cost is
    * the topic's retention window, independent of log history size.
    * Retention (Ingest.pruneHotTopic) must exceed the slowest
    * subscriber's catch-up lag. */
  def hot(spark: SparkSession, hotTopicDir: String, stream: String = "__all__",
      subscribeAtMs: Long): DataFrame =
    source(spark, hotTopicDir, stream)
      .where(unix_millis(col("event_time")) >= subscribeAtMs)

  def typed(df: DataFrame): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.select("stream_name", "order_id", "event_time", "service_id",
      "local_id", "schema_version", "payload", "provenance").as[Event]
  }

  /** A continuously-maintained projection value: streaming per-stream
    * aggregate in update mode (the live analogue of photon's projection
    * descriptor updates, streams.clj:125-145). State shards by
    * stream_name — never a single global blob (SURVEY.md §7.4). */
  def countProjection(events: DataFrame): DataFrame =
    events.groupBy(col("stream_name")).agg(count(lit(1)).as("processed"))

  /** Tumbling-window streaming aggregate with watermarking — late data
    * beyond the watermark is dropped, state is bounded. */
  def windowedCounts(events: DataFrame, window_ : String, watermark: String): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("stream_name"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup on the client idempotency key: events with
    * the same (service_id, local_id) are one logical event (the
    * reference's required ingest identity fields, doc/schemas.md:19-43).
    * dropDuplicatesWithinWatermark keeps per-key state only until the
    * watermark passes — bounded state at any scale, unlike an unbounded
    * dropDuplicates. */
  def dedupStream(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("service_id", "local_id")

  /** Start a projection query into an in-memory sink (tests/local); in
    * production the same writer targets a real sink with a checkpoint. */
  def startMemorySink(df: DataFrame, name: String, mode: OutputMode): StreamingQuery =
    df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
}
