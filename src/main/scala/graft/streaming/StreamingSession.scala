package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live session windows — the streaming twin of r_stream_session
  * (queries/Windows.scala): per-user sessions closed by an inactivity
  * gap, emitted once the watermark passes a session's end. Completes
  * the live-twin family (funnel / retention / spike / pack / near-dup),
  * which the batch session query was the last member missing.
  *
  * Semantics match the batch query exactly: timestamps are floored to
  * whole seconds BEFORE windowing (so a sub-second difference can never
  * flip a gap boundary between the two paths), and Spark's
  * `session_window` merges on the touch point — an event at exactly
  * last + gap extends the session — which is the same `> gap` break
  * rule the batch oracle spells. A closed session therefore produces a
  * (user_id, session_start_s, n_events) row identical to the batch
  * result over the same events.
  *
  * Scale shape: state is one open interval per in-flight (user,
  * session) in the state store, merged incrementally and evicted when
  * the watermark passes — bounded by concurrently-ACTIVE users, not by
  * history length or event volume. The shuffle key is user_id (same as
  * the batch exchange), so a 1000-executor cluster partitions session
  * state exactly like the batch aggregation.
  */
object StreamingSession {

  /** `events` needs `user_id` and an event-time `ts` (timestamp).
    * Append-mode output: rows appear only for sessions the watermark
    * has closed — the contract a downstream sink can rely on (no
    * retractions). */
  def sessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_sec", expr("timestamp_seconds(unix_millis(ts) DIV 1000)"))
      .withWatermark("ts_sec", watermark)
      .groupBy(session_window($"ts_sec", gap).as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        expr("unix_millis(w.start) DIV 1000").as("session_start_s"),
        $"n_events")
  }
}
