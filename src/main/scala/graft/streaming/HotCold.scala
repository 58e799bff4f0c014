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
  *  - hot       → same source, restricted to events ingested from "now":
  *                the file source has no latest-offsets knob, so hot =
  *                hot-cold + event_time >= subscription time (equivalent
  *                observable behavior: only events appended after
  *                subscribe are delivered).
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

  def hotCold(spark: SparkSession, logDir: String, stream: String = "__all__"): DataFrame = {
    val src = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", 32) // bound per-microbatch work
      .parquet(logDir)
    if (stream == "__all__") src else src.where(col("stream_name") === stream)
  }

  def hot(spark: SparkSession, logDir: String, stream: String = "__all__",
      subscribeAtMs: Long): DataFrame =
    hotCold(spark, logDir, stream)
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
