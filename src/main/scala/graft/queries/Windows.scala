package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group R — window functions and the batch twins of the streaming
  * windowed aggregations (SURVEY.md §7.1 M3: the same expressions run
  * under Structured Streaming in graft.streaming).
  */
object Windows extends QueryModule {

  /** Ranking: top-3 orders per customer by totalprice. row_number gets a
    * unique tiebreaker; dense_rank ranks by value only (both orders are
    * deterministic). */
  private val windowRank = Q(
    "r_window_rank",
    Some("""SELECT o_custkey, o_orderkey, o_totalprice AS price, rn, dr
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
                    CAST(dense_rank() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC) AS BIGINT) AS dr
                  FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, rn"""),
    (spark, dir) => {
      import spark.implicits._
      val wRn = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      val wDr = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
      t(spark, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          row_number().over(wRn).cast("long").as("rn"),
          dense_rank().over(wDr).cast("long").as("dr"))
        .where($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice".as("price"),
          $"rn", $"dr")
        .orderBy($"o_custkey", $"rn")
    })

  /** Frame: 7-day moving average of the daily event-value total
    * (RANGE BETWEEN 6 PRECEDING AND CURRENT ROW over a day number).
    * The unpartitioned window is fine: it runs over the *daily rollup*,
    * which is tiny regardless of input scale. */
  private val windowFrame = Q(
    "r_window_frame",
    Some("""WITH daily AS (
              SELECT date_trunc('day', ts) AS dt, sum(value) AS dsum
              FROM events GROUP BY date_trunc('day', ts))
            SELECT strftime(dt, '%Y-%m-%d') AS day,
              round(dsum, 4) AS daily_value,
              round(avg(dsum) OVER (ORDER BY dt
                RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 4) AS avg_7d
            FROM daily ORDER BY day"""),
    (spark, dir) => {
      import spark.implicits._
      val daily = t(spark, dir, "events")
        .groupBy(date_trunc("day", $"ts").as("dt"))
        .agg(sum($"value").as("dsum"))
        .withColumn("day_num", expr("unix_millis(dt) DIV 86400000"))
      val w = Window.orderBy($"day_num").rangeBetween(-6, 0)
      daily
        .select(date_format($"dt", "yyyy-MM-dd").as("day"),
          round($"dsum", 4).as("daily_value"),
          round(avg($"dsum").over(w), 4).as("avg_7d"))
        .orderBy($"day")
    })

  /** Analytic lag: per-user inter-event gap in whole milliseconds. */
  private val windowLag = Q(
    "r_window_lag",
    Some("""SELECT user_id, event_id,
            epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS gap_ms
            FROM events ORDER BY user_id, event_id"""),
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(spark, dir, "events")
        .select($"user_id", $"event_id",
          (unix_millis($"ts") - lag(unix_millis($"ts"), 1).over(w)).as("gap_ms"))
        .orderBy($"user_id", $"event_id")
    })

  /** Tumbling 1-hour window aggregate — batch twin of the streaming
    * windowed count/sum (same `window()` expression works on readStream). */
  private val streamTumbling = Q(
    "r_stream_tumbling",
    Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS ws_ms, event_type,
            count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY ws_ms, event_type"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select(unix_millis($"w.start").as("ws_ms"), $"event_type", $"n", $"sum_value")
        .orderBy($"ws_ms", $"event_type")
    })

  /** Session window (30-minute gap) per user — batch twin of the streaming
    * session aggregation. Timestamps are floored to whole seconds in BOTH
    * engines so the gap boundary can never be flipped by sub-second
    * precision differences. Oracle is the classic gaps-and-islands SQL
    * (DuckDB has no session_window builtin). A session breaks only when
    * the gap EXCEEDS 30 min: Spark's session intervals [t, t+gap) merge
    * on the touch point too — an event at exactly last+gap extends the
    * session (verified against the one exact-1800s gap in the sf0.1
    * corpus, where `>=` split what Spark merged). */
  private val streamSession = Q(
    "r_stream_session",
    Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_s
                       FROM events),
            g AS (SELECT user_id, event_id, ts_s,
                    CASE WHEN lag(ts_s) OVER w IS NULL
                           OR ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
            s AS (SELECT user_id, ts_s,
                    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                  FROM g)
            SELECT user_id, min(ts_s) AS session_start_s, count(*) AS n_events
            FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_s"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .withColumn("ts_sec", expr("timestamp_seconds(unix_millis(ts) DIV 1000)"))
        .groupBy(session_window($"ts_sec", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", expr("unix_millis(w.start) DIV 1000").as("session_start_s"),
          $"n_events")
        .orderBy($"user_id", $"session_start_s")
    })

  /** ntile + first/last value over per-user event values. first/last
    * use the full-partition frame and value-ordering with an event_id
    * tiebreaker so both engines agree on ties. */
  private val windowNtile = Q(
    "r_window_ntile",
    Some("""SELECT user_id, event_id,
            CAST(ntile(4) OVER w AS BIGINT) AS quartile,
            first_value(event_id) OVER w AS cheapest_event,
            last_value(event_id) OVER (PARTITION BY user_id ORDER BY value, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_event
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
            ORDER BY user_id, event_id"""),
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"value", $"event_id")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(spark, dir, "events")
        .select($"user_id", $"event_id",
          ntile(4).over(w).cast("long").as("quartile"),
          first($"event_id").over(w).as("cheapest_event"),
          last($"event_id").over(wFull).as("priciest_event"))
        .orderBy($"user_id", $"event_id")
    })

  /** Sliding window (1 h window, 15 min slide) — the overlapping-window
    * streaming shape (each event lands in 4 windows), run batch-side
    * like r_stream_tumbling. Oracle replicates Spark's epoch-aligned
    * window assignment: an event in 15-min slot s belongs to windows
    * starting at slots s-3..s — pure integer slot math, so both engines
    * enumerate identical (window, event) pairs. The 4× row expansion
    * happens BEFORE the partial aggregate, so the shuffle carries only
    * (window, type) cells, not expanded events. */
  private val streamSliding = Q(
    "r_stream_sliding",
    Some("""WITH e AS (SELECT event_type, value, epoch_ms(ts) // 900000 AS slot
                       FROM events),
            x AS (SELECT event_type, value, (slot - k) * 900000 AS ws_ms
                  FROM e, unnest([0, 1, 2, 3]) AS t(k))
            SELECT ws_ms, event_type, CAST(count(*) AS BIGINT) AS n,
              round(sum(value), 4) AS sum_value
            FROM x GROUP BY 1, 2 ORDER BY ws_ms, event_type"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select(unix_millis($"w.start").as("ws_ms"), $"event_type", $"n",
          $"sum_value")
        .orderBy($"ws_ms", $"event_type")
    })

  /** Distribution-position windows: cume_dist and percent_rank per
    * nation over supplier account balances. The (s_acctbal, s_suppkey)
    * ordering is total, so every row is its own peer group and both
    * functions reduce to exact rank ratios — one IEEE division each,
    * floored to basis points (the cross-engine float rule). */
  private val windowCume = Q(
    "r_window_cume",
    Some("""SELECT s_nationkey, s_suppkey,
              CAST(floor(cume_dist() OVER (PARTITION BY s_nationkey
                ORDER BY s_acctbal, s_suppkey) * 10000) AS BIGINT) AS cume_bp,
              CAST(floor(percent_rank() OVER (PARTITION BY s_nationkey
                ORDER BY s_acctbal, s_suppkey) * 10000) AS BIGINT) AS prank_bp
            FROM supplier ORDER BY s_nationkey, s_suppkey"""),
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"s_nationkey")
        .orderBy($"s_acctbal", $"s_suppkey")
      t(spark, dir, "supplier")
        .select($"s_nationkey", $"s_suppkey",
          floor(cume_dist().over(w) * 10000).cast("long").as("cume_bp"),
          floor(percent_rank().over(w) * 10000).cast("long").as("prank_bp"))
        .orderBy($"s_nationkey", $"s_suppkey")
    })

  override def all: Seq[Q] = Seq(windowRank, windowFrame, windowLag,
    streamTumbling, streamSession, windowNtile, streamSliding, windowCume)
}
