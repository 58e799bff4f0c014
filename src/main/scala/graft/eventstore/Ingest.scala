package graft.eventstore

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event ingest: validate → stamp → append (reference streams.clj:290-308).
  *
  * Stamping semantics vs the reference: photon stamps each event with the
  * server wall-clock ms and `order_id = 1000*ms + counter(0..999)` — a hard
  * 1000 events/ms ceiling with key collisions beyond it (streams.clj:
  * 298-301). Here a whole micro-batch is stamped at its ingest time and the
  * in-batch sequence OVERFLOWS into the next millisecond instead of
  * colliding (`ms += seq/1000`), a documented upgrade (SURVEY.md §4.4).
  * The batch-local sequence comes from a deterministic total sort of the
  * batch, so re-stamping the same batch yields identical order_ids.
  *
  * Durability ordering is also the upgraded store-THEN-publish (the
  * reference publishes to hot subscribers before persisting,
  * streams.clj:292,305-307 — its own TODO flags this).
  */
object Ingest {

  val OrderPerMs = 1000L

  private val required =
    Seq("stream_name", "service_id", "local_id", "schema_version", "payload")

  /** Split a raw batch into (valid, invalid) on the EventTemplate-required
    * fields (reference api.clj:35-36: invalid events are rejected at the
    * API edge, not stored). */
  def validate(raw: DataFrame): (DataFrame, DataFrame) = {
    val missing = required.filterNot(raw.columns.contains)
    require(missing.isEmpty, s"raw events missing required columns: $missing")
    val ok = required.map(col(_).isNotNull).reduce(_ && _)
    (raw.where(ok), raw.where(!ok))
  }

  /** Stamp `event_time` + `order_id` onto a validated batch.
    *
    * The global row_number is a single-partition window over ONE
    * micro-batch (not the log); at cluster scale ingest batches are
    * bounded by the trigger interval, so this stays small. A fully
    * shuffle-free alternative (partition_id-prefixed sequence) would
    * break the reference's dense `1000*ms + seq` encoding.
    *
    * `orderCols` defines the in-batch sequence; the default includes
    * `payload` as the final tiebreaker so the sort is total (two events
    * sharing the identity columns but differing in payload must stamp
    * deterministically). Callers that know the original order (e.g.
    * import re-stamping) pass their own ordering column.
    */
  def stamp(
      raw: DataFrame,
      ingestTimeMs: Long,
      orderCols: Seq[String] =
        Seq("stream_name", "service_id", "local_id", "payload")): DataFrame = {
    val w = Window.orderBy(orderCols.map(col): _*)
    raw
      .withColumn("seq", row_number().over(w).cast("long") - 1L)
      .withColumn("event_time_ms", lit(ingestTimeMs) + expr("seq DIV 1000"))
      .withColumn("event_time", timestamp_millis(col("event_time_ms")))
      .withColumn("order_id", col("event_time_ms") * OrderPerMs + col("seq") % OrderPerMs)
      .drop("seq", "event_time_ms")
  }

  /** Append a stamped batch to the log, partitioned by stream so stream
    * filters prune at the file level (the columnar analogue of the
    * reference's per-stream `db/lazy-events` pushdown, streams.clj:325-327).
    *
    * `byDate = true` adds an `event_date` partition level below the
    * stream — the 100 TB layout (SCALING.md): one stream's years of
    * history aren't a single giant directory, and `from`-bounded cold
    * scans prune whole days before reading a footer.
    */
  def append(stamped: DataFrame, logDir: String, byDate: Boolean = false): Unit =
    if (byDate)
      stamped.withColumn("event_date", to_date(col("event_time")))
        .write.mode("append").partitionBy("stream_name", "event_date").parquet(logDir)
    else
      stamped.write.mode("append").partitionBy("stream_name").parquet(logDir)

  /** validate → stamp → append in one call; returns the invalid rows. */
  def ingest(raw: DataFrame, logDir: String, ingestTimeMs: Long): DataFrame = {
    val (ok, bad) = validate(raw)
    append(stamp(ok, ingestTimeMs), logDir)
    bad
  }
}
