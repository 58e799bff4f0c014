package graft.eventstore

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Replay = reads over the event log (reference streams.clj:340-405).
  *
  * Cold scan (O1), stream filter (O4), from-timestamp (O5), limit (O6),
  * point lookup (O14), distinct streams (O13), delete-stream (O15).
  * The hot/hot-cold live paths are in graft.streaming.HotCold.
  */
object Replay {

  val AllStreams = "__all__"

  /** Open the log. `__all__` is just the unfiltered log — stream_name is
    * an ordinary (partition) column, exactly SURVEY.md §1.6. */
  def open(spark: SparkSession, logDir: String): DataFrame =
    spark.read.parquet(logDir)

  def typed(spark: SparkSession, logDir: String): Dataset[Event] = {
    import spark.implicits._
    // partitionBy writes stream_name last; restore canonical column order
    open(spark, logDir)
      .select("stream_name", "order_id", "event_time", "service_id",
        "local_id", "schema_version", "payload", "provenance")
      .as[Event]
  }

  /** Bounded cold replay: stream + from-ts + limit, totally ordered by
    * order_id (reference streams.clj:340-366: walks db/lazy-events from
    * `from`, applies `limit`, then closes). Filters prune parquet
    * partitions (stream) and row groups (event_time min/max). */
  def cold(
      log: DataFrame,
      stream: String = AllStreams,
      fromMs: Long = 0L,
      limit: Option[Int] = None): DataFrame = {
    val byStream =
      if (stream == AllStreams) log
      else log.where(col("stream_name") === stream)
    val scanned = byStream
      .where(unix_millis(col("event_time")) >= fromMs)
      .orderBy("order_id")
    limit.fold(scanned)(scanned.limit)
  }

  /** Point lookup by (stream, order_id) (reference streams.clj:322). */
  def pointGet(log: DataFrame, stream: String, orderId: Long): DataFrame =
    log.where(col("stream_name") === stream && col("order_id") === orderId)

  /** Boot catalog: distinct stream names (reference streams.clj:163-165).
    * With the partitioned layout this is metadata-only at scale. */
  def distinctStreams(log: DataFrame): DataFrame =
    log.select("stream_name").distinct().orderBy("stream_name")

  /** Per-stream totals — the `__streams__` catalog view (O25). */
  def streamsCatalog(log: DataFrame): DataFrame =
    log.groupBy("stream_name")
      .agg(count(lit(1)).as("total_events"),
        min("order_id").as("min_order_id"),
        max("order_id").as("max_order_id"))
      .orderBy("stream_name")

  /** Compact one stream's partition: streaming ingest appends one small
    * file per micro-batch, and at 100 TB a day of 5-second triggers is
    * ~17k files per stream — scan planning and open() costs dominate.
    * Rewrite the partition into files of ~targetRows each (sorted by
    * order_id so min-max stats stay tight for cold-scan pruning), then
    * swap directories. A date-bucketed stream (Ingest.append byDate=true:
    * `event_date=` dirs under the stream) is re-written WITH
    * partitionBy(event_date), preserving the layout — flattening it
    * would leave mixed partition schemes under the log root and break
    * whole-log partition discovery. Returns the new file count.
    *
    * Concurrency contract: SINGLE WRITER, no concurrent readers of this
    * stream during the swap — between the two renames the stream's
    * partition is briefly absent, so a concurrent reader would observe
    * an empty stream (correct reads resume after the swap; no data is
    * ever lost). Run compaction in the ingest's maintenance window, and
    * call [[recoverCompaction]] at open time to heal a crashed swap. */
  def compactStream(
      spark: SparkSession,
      logDir: String,
      stream: String,
      targetRows: Long = 5000000L): Int = {
    val part = new Path(s"$logDir/stream_name=$stream")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(spark, logDir, stream) // heal any crashed prior swap
    require(fs.exists(part), s"no such stream partition: $part")
    val byDate = fs.listStatus(part)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("event_date="))
    val df = spark.read.parquet(part.toString)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val tmp = new Path(s"$logDir/.compact_tmp_$stream")
    if (byDate)
      // event_date surfaces as a discovered partition column; write it
      // back as a partition level (partitionBy drops it from the data
      // files), range-clustered so a task writes few date dirs
      df.repartitionByRange(files, col("event_date"), col("order_id"))
        .sortWithinPartitions("event_date", "order_id")
        .write.mode("overwrite").partitionBy("event_date").parquet(tmp.toString)
    else
      df.repartitionByRange(files, col("order_id"))
        .sortWithinPartitions("order_id")
        .write.mode("overwrite").parquet(tmp.toString)
    // two renames, never delete-then-rename: a crash between steps
    // leaves either the original or the compacted copy addressable —
    // the stream is recoverable at every point (see recoverCompaction)
    val old = new Path(s"$logDir/.compact_old_$stream")
    fs.delete(old, true) // clear leftover from a prior COMPLETED swap
    require(fs.rename(part, old), s"rename $part -> $old failed")
    if (!fs.rename(tmp, part)) {
      fs.rename(old, part) // roll back
      throw new IllegalStateException(s"rename $tmp -> $part failed; rolled back")
    }
    fs.delete(old, true)
    // recursive: byDate layouts keep their files under event_date= subdirs
    val it = fs.listFiles(part, true)
    var count = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) count += 1
    count
  }

  /** Open-time recovery for a compaction swap that crashed between
    * renames: if the stream partition is missing but its .compact_old
    * backup exists, restore the backup (and drop the half-written tmp).
    * Idempotent; no-op when the partition is healthy. Returns true if a
    * restore happened. */
  def recoverCompaction(spark: SparkSession, logDir: String, stream: String): Boolean = {
    val part = new Path(s"$logDir/stream_name=$stream")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$logDir/.compact_old_$stream")
    if (!fs.exists(part) && fs.exists(old)) {
      require(fs.rename(old, part), s"recovery rename $old -> $part failed")
      fs.delete(new Path(s"$logDir/.compact_tmp_$stream"), true)
      true
    } else false
  }

  /** Delete a stream (reference api.clj:131-147 loops scan-and-delete
    * until empty; with a stream-partitioned log it is one partition-dir
    * drop — O(1) instead of O(n)). */
  def deleteStream(spark: SparkSession, logDir: String, stream: String): Boolean = {
    val p = new Path(s"$logDir/stream_name=$stream")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
