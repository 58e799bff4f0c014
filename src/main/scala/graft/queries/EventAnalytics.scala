package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group X — event-stream analytics over the `events` table: the
  * workloads an event-store user (the reference's audience) actually
  * runs on their streams — conversion funnels and cohort retention.
  * In the reference these would be hand-written projection folds over
  * a replay (`doc/index.adoc:163-172`: projections are "fundamentally
  * the _reduce_ from the well known _map/reduce_ pattern",
  * `streams.clj:147-161`); here they are declarative relational plans
  * Catalyst can parallelize, with StreamingFunnel/StreamingRetention
  * as the live stateful twins.
  * Both are pure relational compositions (filter → min-aggregate →
  * equi-join chains), so Catalyst plans them with map-side partial
  * aggregates and one shuffle per stage key.
  *
  * Determinism: timestamps compare as epoch-ms BIGINTs (`unix_millis` ↔
  * `epoch_ms`, both floor-to-ms — the established cross-engine rule);
  * day/week bucketing is integer floor division on those ms values.
  */
object EventAnalytics extends QueryModule {

  /** Three-stage conversion funnel with per-stage time windows: first
    * `view`, then the first `click` within 24 h of it, then the first
    * `purchase` within 72 h of that click. Output: users surviving each
    * stage. Each stage is a filtered scan + per-user min — the funnel
    * never materializes event pairs, so cost is 3 scans + 3 keyed
    * aggregates regardless of per-user event counts (the pattern-match
    * formulations that self-join events blow up on power users). */
  private val funnel = Q(
    "x_funnel",
    Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
            v AS (SELECT user_id, min(ms) AS t1 FROM e
                  WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(ms) AS t2 FROM e
                  JOIN v ON e.user_id = v.user_id
                    AND e.ms > v.t1 AND e.ms <= v.t1 + 86400000
                  WHERE event_type = 'click' GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(ms) AS t3 FROM e
                  JOIN c ON e.user_id = c.user_id
                    AND e.ms > c.t2 AND e.ms <= c.t2 + 259200000
                  WHERE event_type = 'purchase' GROUP BY e.user_id)
            SELECT stage, n_users FROM (
              SELECT 'stage1_view' AS stage, CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
              UNION ALL
              SELECT 'stage2_click', CAST((SELECT count(*) FROM c) AS BIGINT)
              UNION ALL
              SELECT 'stage3_purchase', CAST((SELECT count(*) FROM p) AS BIGINT))
            ORDER BY stage"""),
    (spark, dir) => {
      import spark.implicits._
      val e = t(spark, dir, "events")
        .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
      val v = e.where($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ms").as("t1"))
      val c = e.where($"event_type" === "click")
        .join(v, "user_id")
        .where($"ms" > $"t1" && $"ms" <= $"t1" + 86400000L)
        .groupBy($"user_id").agg(min($"ms").as("t2"))
      val p = e.where($"event_type" === "purchase")
        .join(c, "user_id")
        .where($"ms" > $"t2" && $"ms" <= $"t2" + 259200000L)
        .groupBy($"user_id").agg(min($"ms").as("t3"))
      v.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("stage1_view"))
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .withColumn("stage", lit("stage2_click")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .withColumn("stage", lit("stage3_purchase")))
        .select($"stage", $"n_users")
        .orderBy($"stage")
    })

  /** Cohort retention: users grouped by first-seen day; for each
    * (cohort day, week offset), how many of the cohort were active.
    * Distinct (user, day) first — per-user event volume never inflates
    * the aggregate — then one keyed min for the cohort and one
    * (cohort, offset) count-distinct. Output is cohorts × offsets
    * (calendar-bounded), tiny at any corpus scale. */
  private val retention = Q(
    "x_retention",
    Some("""WITH d AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
                       FROM events),
            co AS (SELECT user_id, min(day) AS c_day FROM d GROUP BY user_id),
            a AS (SELECT DISTINCT d.user_id, c_day, (day - c_day) // 7 AS off_w
                  FROM d JOIN co ON d.user_id = co.user_id),
            act AS (SELECT c_day, off_w, CAST(count(*) AS BIGINT) AS n_active
                    FROM a GROUP BY c_day, off_w),
            sz AS (SELECT c_day AS s_day, CAST(count(*) AS BIGINT) AS n_cohort
                   FROM co GROUP BY c_day)
            SELECT c_day, off_w, n_cohort, n_active
            FROM act JOIN sz ON act.c_day = sz.s_day
            ORDER BY c_day, off_w"""),
    (spark, dir) => {
      import spark.implicits._
      val days = t(spark, dir, "events")
        .select($"user_id", expr("unix_millis(ts) DIV 86400000").as("day"))
        .distinct()
      val cohort = days.groupBy($"user_id").agg(min($"day").as("c_day"))
      val act = days.join(cohort, "user_id")
        .select($"user_id", $"c_day",
          expr("(day - c_day) DIV 7").as("off_w"))
        .distinct()
        .groupBy($"c_day", $"off_w")
        .agg(count(lit(1)).as("n_active"))
      val sz = cohort.groupBy($"c_day").agg(count(lit(1)).as("n_cohort"))
      act.join(sz, "c_day")
        .select($"c_day", $"off_w", $"n_cohort", $"n_active")
        .orderBy($"c_day", $"off_w")
    })

  /** Rate-spike detection — the monitoring read an event-store
    * dashboard runs continuously: hours where an event type's count
    * exceeds 1.5× its trailing 6-hour mean (expressed shuffle-free in
    * integers: 2·n·trail_cnt > 3·trail_sum, requiring ≥ 3 trailing
    * hours so cold starts don't flag; 1.5× keeps real output at every
    * test SF — denser corpora smooth 2× spikes away entirely). One hourly pre-aggregate
    * (map-side combined, calendar-bounded output) then a per-type
    * window — state shards by event_type; no float division anywhere,
    * so both engines flag identical hours. */
  private val spikes = Q(
    "x_spike_detect",
    Some("""WITH h AS (SELECT event_type, epoch_ms(ts) // 3600000 AS hour,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            w AS (SELECT event_type, hour, n,
                CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hour
                  ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail_sum,
                CAST(count(*) OVER (PARTITION BY event_type ORDER BY hour
                  ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail_cnt
              FROM h)
            SELECT event_type, hour * 3600000 AS hour_ms, n, trail_sum, trail_cnt
            FROM w WHERE trail_cnt >= 3 AND n * trail_cnt * 2 > 3 * trail_sum
            ORDER BY event_type, hour_ms"""),
    (spark, dir) => {
      import spark.implicits._
      val h = t(spark, dir, "events")
        .select($"event_type", expr("unix_millis(ts) DIV 3600000").as("hour"))
        .groupBy($"event_type", $"hour")
        .agg(count(lit(1)).as("n"))
      val wTrail = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"hour")
        .rowsBetween(-6, -1)
      h.withColumn("trail_sum", sum($"n").over(wTrail))
        .withColumn("trail_cnt", count(lit(1)).over(wTrail))
        .where($"trail_cnt" >= 3 && $"n" * $"trail_cnt" * 2 > $"trail_sum" * 3)
        .select($"event_type", ($"hour" * 3600000L).as("hour_ms"), $"n",
          $"trail_sum", $"trail_cnt")
        .orderBy($"event_type", $"hour_ms")
    })

  /** Rolling engagement: DAU, trailing-7-day WAU and the DAU/WAU
    * stickiness ratio per day — the standard product-analytics
    * dashboard triple. Plan shape for scale: distinct (user, day) FIRST
    * (per-user event volume never inflates anything downstream), then
    * each active day contributes to the 7 window-end days via a
    * sequence explode — a 7× blowup of the distinct PAIRS, not the raw
    * events — and one count-distinct per end day. Output is
    * calendar-bounded. Integer day buckets and basis points keep both
    * engines bit-identical. */
  private val dauRolling = Q(
    "x_dau_rolling",
    Some("""WITH d AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
                       FROM events),
            dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                    FROM d GROUP BY day),
            w AS (SELECT e_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
                  FROM (SELECT user_id, unnest(range(day, day + 7)) AS e_day FROM d)
                  GROUP BY e_day)
            SELECT dau.day AS day, dau.dau AS dau, w.wau AS wau,
              CAST((dau.dau * 10000) // w.wau AS BIGINT) AS stickiness_bp
            FROM dau JOIN w ON dau.day = w.e_day
            ORDER BY day"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"user_id", expr("unix_millis(ts) DIV 86400000").as("day"))
        .distinct()
      val dau = d.groupBy($"day").agg(count(lit(1)).as("dau"))
      val w = d.select($"user_id", explode(expr("sequence(day, day + 6)")).as("e_day"))
        .groupBy($"e_day").agg(count_distinct($"user_id").as("wau"))
      dau.join(w, $"day" === $"e_day")
        .select($"day", $"dau", $"wau",
          expr("(dau * 10000) DIV wau").as("stickiness_bp"))
        .orderBy($"day")
    })

  /** Path mining: the top-20 event-type trigram paths across per-user
    * event-time-ordered histories — the "how do users actually move"
    * read behind funnel design. Spelled as lead()/lead(2) over a
    * (user_id | ts, event_id) window rather than a per-user
    * collect_list: the window sorter is spill-safe and its state is a
    * TWO-ROW lookahead, so one pathological bot user with millions of
    * events can never blow a task's memory the way a materialized
    * history array would. Trigram counting is a map-side-combined
    * aggregate and the top-20 is a TakeOrdered — no pair joins
    * anywhere. (ts, event_id) ordering makes every path deterministic
    * in both engines. */
  private val eventPaths = Q(
    "x_event_paths",
    Some("""WITH tri AS (SELECT concat_ws('>', event_type,
                lead(event_type, 1) OVER w, lead(event_type, 2) OVER w) AS path,
                lead(event_type, 2) OVER w AS t2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT path, CAST(count(*) AS BIGINT) AS n
            FROM tri WHERE t2 IS NOT NULL
            GROUP BY path ORDER BY n DESC, path LIMIT 20"""),
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(spark, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("t1", lead($"event_type", 1).over(w))
        .withColumn("t2", lead($"event_type", 2).over(w))
        .where($"t1".isNotNull && $"t2".isNotNull)
        .select(concat_ws(">", $"event_type", $"t1", $"t2").as("path"))
        .groupBy($"path")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"path")
        .limit(20)
    })

  /** Power-user skew report: per event type, the distribution of
    * events-per-user (p50/p99/max) and max-vs-mean in basis points —
    * THE read before sizing shuffle partitions or choosing
    * r_join_salted's bucket count, because a 100×-mean hot user is
    * exactly what melts a keyed aggregate at scale. One (type, user)
    * pre-aggregate (map-side combined) then a per-type summary;
    * percentiles route through QueryModule.pct — exact (the
    * quantile_cont mapping r_agg_percentile established) for the
    * oracle, approx_percentile via [[userSkewApprox]] as the
    * constant-state 100 TB path (PercentileScaleSpec pins the twins
    * rank-exact at gate scale) — and the skew ratio is all-integer. */
  private def userSkewBody(spark: SparkSession, dir: String, exact: Boolean)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_users"),
        sum($"n").as("n_events"),
        round(pct("n", 0.5, exact), 4).as("p50"),
        round(pct("n", 0.99, exact), 4).as("p99"),
        max($"n").as("max_per_user"))
      .select($"event_type", $"n_users", $"n_events", $"p50", $"p99",
        $"max_per_user",
        expr("(max_per_user * 10000) DIV greatest(n_events DIV n_users, 1)")
          .as("skew_bp"))
      .orderBy($"event_type")
  }

  /** Constant-state-per-group scale twin (see QueryModule.pct). */
  private[graft] def userSkewApprox(spark: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = userSkewBody(spark, dir, exact = false)

  /** DECLARED scale twins (VERDICT r10 task #2): the approx_percentile
    * spellings of the buffered-percentile queries, promoted from
    * private helpers to graded rows-only queries — the 100 TB
    * percentile path is a driver-run artifact, not a flag. The exact
    * spellings stay declared for the hash oracle (quantile_cont has no
    * mergeable twin in the oracle engine with identical sketch
    * geometry); PercentileScaleSpec pins these twins rank-exact against
    * them at gate scale, and every non-percentile column is
    * parity-identical by construction (same body, one flag).
    * Registered AT the body site (x_session_stats_approx /
    * x_value_outliers_approx / x_doc_diversity_approx likewise) so
    * grep for the id lands here. */
  private val userSkewApproxQ =
    Q("x_user_skew_approx", None, userSkewApprox)

  private val userSkew = Q(
    "x_user_skew",
    Some("""WITH c AS (SELECT event_type, user_id,
              CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
              CAST(sum(n) AS BIGINT) AS n_events,
              round(quantile_cont(n, 0.5), 4) AS p50,
              round(quantile_cont(n, 0.99), 4) AS p99,
              CAST(max(n) AS BIGINT) AS max_per_user,
              CAST((max(n) * 10000) // greatest(sum(n) // count(*), 1) AS BIGINT)
                AS skew_bp
            FROM c GROUP BY event_type ORDER BY event_type"""),
    (spark, dir) => userSkewBody(spark, dir, exact = true))

  /** Bot/abuse burstiness screen — the user-generated-content hygiene
    * read before training on event-derived text: humans leave ragged
    * inter-event gaps, scripted clients fire in tight bursts. Per user:
    * gap count, bursty gaps (< 10 min — the threshold keeps non-trivial
    * output at every test SF: 21/142/1478 burst gaps at sf0.001/0.01/
    * 0.1), tightest gap, and burstiness in basis points; output is the
    * top-20 burstiest users (total order: burst_bp DESC, n_gaps DESC,
    * user_id). Scale shape: the lag() window keeps ONE row of state per
    * user (spill-safe for any event volume), the per-user aggregate is
    * map-side combined, and the top-20 is a TakeOrdered — no pair
    * joins, calendar-unbounded safe. Gaps compare as epoch-ms BIGINTs
    * ordered by (ms, event_id) in both engines. */
  private val botBurst = Q(
    "x_bot_burst",
    Some("""WITH g AS (SELECT user_id,
                epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                  PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
              FROM events),
            u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                CAST(count(*) FILTER (WHERE gap < 600000) AS BIGINT) AS n_burst,
                CAST(min(gap) AS BIGINT) AS min_gap_ms
              FROM g WHERE gap IS NOT NULL GROUP BY user_id)
            SELECT user_id, n_gaps, n_burst, min_gap_ms,
              CAST(n_burst * 10000 // n_gaps AS BIGINT) AS burst_bp
            FROM u
            ORDER BY burst_bp DESC, n_gaps DESC, user_id LIMIT 20"""),
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      t(spark, dir, "events")
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
        .withColumn("gap", $"ms" - lag($"ms", 1).over(w))
        .where($"gap".isNotNull)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_gaps"),
          count(when($"gap" < 600000L, 1)).as("n_burst"),
          min($"gap").as("min_gap_ms"))
        .select($"user_id", $"n_gaps", $"n_burst", $"min_gap_ms",
          expr("n_burst * 10000 DIV n_gaps").as("burst_bp"))
        .orderBy($"burst_bp".desc, $"n_gaps".desc, $"user_id")
        .limit(20)
    })

  /** Session depth/duration distribution — the aggregate read on top of
    * r_stream_session's per-session rows (which expose starts and
    * depths but not durations or distribution shape): sessionize by the
    * same 30-min whole-second gap rule, then one summary row with
    * session count, users, and p50/p99 of events-per-session and
    * session duration. Plan: one lag() window (one-row state) + one
    * running-sum window on the same (user | ts_s, event_id) sort — ONE
    * exchange serves both — then a (user, sid) aggregate and a global
    * roll-up of the tiny per-session table. Percentiles route through
    * QueryModule.pct: exact (quantile_cont ↔ percentile, the
    * r_agg_percentile recipe) for the oracle, approx_percentile via
    * [[sessionStatsApprox]] as the constant-state 100 TB path
    * (PercentileScaleSpec pins the twins rank-exact at gate scale). */
  private def sessionTable(spark: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select($"user_id", $"event_id", expr("unix_millis(ts) DIV 1000").as("ts_s"))
      .withColumn("new_s",
        when(lag($"ts_s", 1).over(wOrd).isNull
          || $"ts_s" - lag($"ts_s", 1).over(wOrd) > 1800, 1).otherwise(0))
      .withColumn("sid", sum($"new_s").over(wRun))
      .groupBy($"user_id", $"sid")
      .agg(count(lit(1)).as("n_events"),
        (max($"ts_s") - min($"ts_s")).as("dur_s"))
  }

  private def sessionStatsBody(spark: SparkSession, dir: String, exact: Boolean)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // n_users rides a SEPARATE 1-row aggregate over the session table,
    // not a count_distinct inside the percentile agg: mixing DISTINCT
    // with the percentile aggregates triggers Spark's distinct-rewrite,
    // which re-groups the sessions BY USER_ID and instantiates one
    // percentile buffer per user before the final merge — measured
    // 3.2 s vs 0.4 s at sf0.1 on the approx twin (4 QuantileSummaries
    // × ~20k users); the rewrite taxes the exact spelling's array
    // buffers too. Both consumers read the SAME per-session frame: the
    // lag/running-sum WINDOW PAIR shares one user-keyed exchange, and
    // the standalone distinct branch plans its own user-keyed partial
    // (PlanShapeSpec pins ≤2 user-keyed exchanges total — window pair
    // shared, distinct on its own branch); its merge exchange is
    // SinglePartition. The crossJoin is the 1-row × 1-row scalar-join
    // house pattern.
    val sess = sessionTable(spark, dir)
    sess
      .agg(count(lit(1)).as("n_sessions"),
        round(pct("n_events", 0.5, exact), 4).as("p50_events"),
        round(pct("n_events", 0.99, exact), 4).as("p99_events"),
        round(pct("dur_s", 0.5, exact), 4).as("p50_dur_s"),
        round(pct("dur_s", 0.99, exact), 4).as("p99_dur_s"),
        max($"dur_s").as("max_dur_s"))
      .crossJoin(sess.agg(count_distinct($"user_id").as("n_users")))
      .select($"n_sessions", $"n_users", $"p50_events", $"p99_events",
        $"p50_dur_s", $"p99_dur_s", $"max_dur_s")
  }

  /** Constant-state-per-group scale twin (see QueryModule.pct). */
  private[graft] def sessionStatsApprox(spark: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = sessionStatsBody(spark, dir, exact = false)

  /** DECLARED scale twin — see userSkewApproxQ's scaladoc. */
  private val sessionStatsApproxQ =
    Q("x_session_stats_approx", None, sessionStatsApprox)

  private val sessionStats = Q(
    "x_session_stats",
    Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_s
                       FROM events),
            g AS (SELECT user_id, event_id, ts_s,
                    CASE WHEN lag(ts_s) OVER w IS NULL
                           OR ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
            s AS (SELECT user_id, ts_s,
                    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                  FROM g),
            p AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
                    CAST(max(ts_s) - min(ts_s) AS BIGINT) AS dur_s
                  FROM s GROUP BY user_id, sid)
            SELECT CAST(count(*) AS BIGINT) AS n_sessions,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              round(quantile_cont(n_events, 0.5), 4) AS p50_events,
              round(quantile_cont(n_events, 0.99), 4) AS p99_events,
              round(quantile_cont(dur_s, 0.5), 4) AS p50_dur_s,
              round(quantile_cont(dur_s, 0.99), 4) AS p99_dur_s,
              CAST(max(dur_s) AS BIGINT) AS max_dur_s
            FROM p"""),
    (spark, dir) => sessionStatsBody(spark, dir, exact = true))

  /** Robust anomaly screen on the event `value` stream: per event type,
    * flag values more than 5 median-absolute-deviations from the
    * median — the outlier rule that (unlike mean/stddev z-scores)
    * doesn't let the outliers themselves inflate the yardstick. The
    * per-type outlier rate and max robust-z are the data-quality read
    * that decides whether a metrics stream needs clamping before it
    * feeds training or billing.
    *
    * Determinism: median and MAD are exact interpolated percentiles
    * (the x_session_stats recipe); dev, 5·mad and dev·10000/mad are
    * single IEEE double ops identical in both engines, and floor /
    * comparisons are exact. mad = 0 (constant stream) yields NULL
    * max_z_bp rather than an Inf cast.
    *
    * Scale shape: two passes over (event_type, value) — median, then
    * MAD of deviations — each a type-cardinality aggregate joined back
    * by BROADCAST (the per-type stats table is tiny by declaration).
    * Percentiles route through QueryModule.pct: exact for the oracle,
    * approx_percentile via [[valueOutliersApprox]] as the
    * constant-state 100 TB path (PercentileScaleSpec pins the twins
    * rank-exact at gate scale). */
  private def valueOutliersBody(spark: SparkSession, dir: String, exact: Boolean)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events").select($"event_type", $"value")
    val m = ev.groupBy($"event_type")
      .agg(pct("value", 0.5, exact).as("med"))
    val d = ev.join(broadcast(m), "event_type")
      .withColumn("dev", abs($"value" - $"med"))
    val a = d.groupBy($"event_type")
      .agg(pct("dev", 0.5, exact).as("mad"))
    d.join(broadcast(a), "event_type")
      .groupBy($"event_type", $"med", $"mad")
      .agg(count(lit(1)).as("n"),
        count(when($"dev" > lit(5) * $"mad", 1)).as("n_outlier"),
        max(when($"mad" > 0,
          expr("CAST(floor(dev * 10000 / mad) AS BIGINT)"))).as("max_z_bp"))
      .select($"event_type", $"n", round($"med", 4).as("med"),
        round($"mad", 4).as("mad"), $"n_outlier",
        expr("n_outlier * 10000 DIV n").as("outlier_bp"), $"max_z_bp")
      .orderBy($"event_type")
  }

  /** Constant-state-per-group scale twin (see QueryModule.pct). */
  private[graft] def valueOutliersApprox(spark: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = valueOutliersBody(spark, dir, exact = false)

  /** DECLARED scale twin — see userSkewApproxQ's scaladoc. */
  private val valueOutliersApproxQ =
    Q("x_value_outliers_approx", None, valueOutliersApprox)

  private val valueOutliers = Q(
    "x_value_outliers",
    Some("""WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                       FROM events GROUP BY event_type),
            d AS (SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
                  FROM events e JOIN m USING (event_type)),
            a AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
                  FROM d GROUP BY event_type)
            SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
              round(d.med, 4) AS med, round(a.mad, 4) AS mad,
              CAST(count(*) FILTER (WHERE d.dev > 5 * a.mad) AS BIGINT) AS n_outlier,
              CAST((count(*) FILTER (WHERE d.dev > 5 * a.mad)) * 10000 // count(*)
                AS BIGINT) AS outlier_bp,
              max(CASE WHEN a.mad > 0
                THEN CAST(floor(d.dev * 10000 / a.mad) AS BIGINT) END) AS max_z_bp
            FROM d JOIN a USING (event_type)
            GROUP BY d.event_type, d.med, a.mad
            ORDER BY d.event_type"""),
    (spark, dir) => valueOutliersBody(spark, dir, exact = true))

  /** First-order Markov transition matrix over per-user event
    * histories: for each (prev → next) event-type pair, the count and
    * the conditional probability in basis points — the behavioral-model
    * read behind funnel design and bot heuristics (a user base whose
    * `view → purchase` probability moves is news; x_event_paths' raw
    * trigram counts can't answer "given a view, what fraction
    * purchase?").
    *
    * Determinism: ordering is (µs-floored ts, event_id) — `unix_micros`
    * in Spark ≡ `epoch_us` on DuckDB's ns timestamps, so both engines
    * see identical successor pairs; probabilities are exact int64
    * floor-division basis points.
    *
    * Scale shape: one user-keyed window (lag 1 — a single row of sorter
    * lookahead state, bot-user-proof like x_bot_burst) into a
    * type²-cardinality map-side-combined aggregate; the normalizing
    * total rides a window over that TINY matrix, and top-20 is a
    * TakeOrdered. No pair joins, nothing driver-side. */
  private val eventTransitions = Q(
    "x_event_transitions",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
                         epoch_us(ts) AS ts_us FROM events),
            p AS (SELECT lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type,
                    event_type AS next_type
                  FROM e),
            c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE prev_type IS NOT NULL
                  GROUP BY prev_type, next_type),
            tt AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
                   FROM c GROUP BY prev_type)
            SELECT c.prev_type, c.next_type, c.n,
              CAST((c.n * 10000) // tt.tot AS BIGINT) AS p_bp
            FROM c JOIN tt USING (prev_type)
            ORDER BY n DESC, prev_type, next_type LIMIT 20"""),
    (spark, dir) => {
      import spark.implicits._
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val wP = Window.partitionBy($"prev_type")
      t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("prev_type", lag($"event_type", 1).over(wU))
        .where($"prev_type".isNotNull)
        .select($"prev_type", $"event_type".as("next_type"))
        .groupBy($"prev_type", $"next_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum($"n").over(wP))
        .select($"prev_type", $"next_type", $"n",
          expr("(n * 10000) DIV tot").as("p_bp"))
        .orderBy($"n".desc, $"prev_type", $"next_type")
        .limit(20)
    })

  /** Last-touch revenue attribution: each purchase's value is credited
    * to the last non-purchase event type the user performed strictly
    * before it (their most recent "channel"); purchases with no prior
    * event credit `direct`. The marketing read every event-store
    * dashboard ships — and the reference's projection-fold idiom
    * (doc/index.adoc:163-172) restated as one declarative window.
    *
    * Determinism: per-user order is (µs-floored ts, event_id) — a total
    * order both engines share; revenue is exact DECIMAL(18,2) summed
    * before the final DOUBLE cast (order-independent), counts int64.
    *
    * Scale shape: ONE user-keyed window (last-ignoreNulls carries a
    * single value of state per user, bot-proof like lag) feeding a
    * channel-cardinality map-side-combined aggregate. No self-join of
    * purchases against history — the pattern-match formulation that
    * explodes on power users. */
  private val attribution = Q(
    "x_attribution",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
                         CAST(value AS DECIMAL(18,2)) AS v,
                         epoch_us(ts) AS ts_us FROM events),
            a AS (SELECT event_type, v,
                    last_value(CASE WHEN event_type <> 'purchase'
                                    THEN event_type END IGNORE NULLS) OVER
                      (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS prev_ch
                  FROM e)
            SELECT coalesce(prev_ch, 'direct') AS channel,
              CAST(count(*) AS BIGINT) AS n_purch,
              CAST(CAST(sum(v) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
            FROM a WHERE event_type = 'purchase'
            GROUP BY 1 ORDER BY channel"""),
    (spark, dir) => {
      import spark.implicits._
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          money($"value").as("v"), expr("unix_micros(ts)").as("ts_us"))
        .withColumn("prev_ch",
          last(when($"event_type" =!= "purchase", $"event_type"),
            ignoreNulls = true).over(wU))
        .where($"event_type" === "purchase")
        .groupBy(coalesce($"prev_ch", lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purch"),
          dbl(sum($"v").cast("decimal(18,2)")).as("revenue"))
        .orderBy($"channel")
    })

  /** Linear multi-touch attribution — x_attribution's last-touch rule
    * spread over EVERY prior touch: each purchase divides its credit
    * across the user's earlier non-purchase events in proportion to
    * per-channel touch counts (the classic linear model; last-touch
    * over-credits the final click). Credit is exact integer
    * arithmetic: purchase credit in bp (n_c·10000 DIV n_tot) and
    * revenue in floored integer cents (cents·n_c DIV n_tot) — both
    * engines produce identical splits, with the sub-cent remainder
    * dropped (documented, bounded by n_channels−1 cents/purchase).
    * Touchless purchases credit 'direct' in full. Channels are the
    * explicit non-purchase type list (the r_pivot value-list
    * convention).
    *
    * Scale shape: ONE user-keyed window sort carries four conditional
    * running counts (constant state per row); each purchase then emits
    * ≤ 5 bounded credit rows via stack — no purchase×history self-join
    * at any scale. */
  private val attribLinear = Q(
    "x_attrib_linear",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                epoch_us(ts) AS ts_us FROM events),
            r AS (SELECT event_type, cents,
                    count(*) FILTER (WHERE event_type = 'click') OVER w AS n_click,
                    count(*) FILTER (WHERE event_type = 'error') OVER w AS n_error,
                    count(*) FILTER (WHERE event_type = 'signup') OVER w AS n_signup,
                    count(*) FILTER (WHERE event_type = 'view') OVER w AS n_view
                  FROM e
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
            p AS (SELECT cents, n_click, n_error, n_signup, n_view,
                    n_click + n_error + n_signup + n_view AS n_tot
                  FROM r WHERE event_type = 'purchase'),
            c AS (SELECT 'click' AS channel, n_click AS n_c, cents, n_tot FROM p
                  UNION ALL SELECT 'error', n_error, cents, n_tot FROM p
                  UNION ALL SELECT 'signup', n_signup, cents, n_tot FROM p
                  UNION ALL SELECT 'view', n_view, cents, n_tot FROM p
                  UNION ALL SELECT 'direct',
                    CASE WHEN n_tot = 0 THEN 1 ELSE 0 END,
                    cents, CASE WHEN n_tot = 0 THEN 1 ELSE 0 END FROM p)
            SELECT channel,
              CAST(count(*) FILTER (WHERE n_c > 0) AS BIGINT) AS touched_purchases,
              CAST(sum((n_c * 10000) // n_tot) FILTER (WHERE n_c > 0) AS BIGINT)
                AS credit_purch_bp,
              CAST(CAST(sum((cents * n_c) // n_tot) FILTER (WHERE n_c > 0)
                AS DOUBLE) / 100 AS DOUBLE) AS credited_revenue
            FROM c WHERE n_tot > 0 GROUP BY channel ORDER BY channel"""),
    (spark, dir) => {
      import spark.implicits._
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val e = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          (money($"value") * 100).cast("long").as("cents"),
          expr("unix_micros(ts)").as("ts_us"))
      val r = e
        .withColumn("n_click", count(when($"event_type" === "click", 1)).over(wU))
        .withColumn("n_error", count(when($"event_type" === "error", 1)).over(wU))
        .withColumn("n_signup", count(when($"event_type" === "signup", 1)).over(wU))
        .withColumn("n_view", count(when($"event_type" === "view", 1)).over(wU))
        .where($"event_type" === "purchase")
        .withColumn("n_tot", $"n_click" + $"n_error" + $"n_signup" + $"n_view")
      val c = r.select(expr(
        """stack(5,
             'click',  n_click,  cents, n_tot,
             'error',  n_error,  cents, n_tot,
             'signup', n_signup, cents, n_tot,
             'view',   n_view,   cents, n_tot,
             'direct', CASE WHEN n_tot = 0 THEN 1L ELSE 0L END, cents,
                       CASE WHEN n_tot = 0 THEN 1L ELSE 0L END)
           AS (channel, n_c, p_cents, p_tot)"""))
      c.where($"p_tot" > 0)
        .groupBy($"channel")
        .agg(count(when($"n_c" > 0, 1)).cast("long").as("touched_purchases"),
          sum(when($"n_c" > 0, expr("(n_c * 10000) DIV p_tot"))).cast("long")
            .as("credit_purch_bp"),
          (sum(when($"n_c" > 0, expr("(p_cents * n_c) DIV p_tot")))
            .cast("double") / 100).as("credited_revenue"))
        .orderBy($"channel")
    })

  /** CUSUM changepoint detection on the per-type daily event series:
    * the day where the cumulative deviation from the series mean peaks
    * — the "when did the rate shift" read that complements
    * x_spike_detect's "which hours are anomalous". For day k of D with
    * prefix sum S_k and total T, the classic CUSUM statistic
    * |S_k − k·(T/D)| is computed as the INTEGER |D·S_k − k·T| (scaled
    * by D — argmax is unchanged, and no float division means both
    * engines flag the identical day). Ties break to the earliest day.
    *
    * Scale shape: calendar-bounded daily rollup (map-side combined) →
    * per-type windows over ≤ days rows → an equality join against the
    * per-type max on exact integers. State shards by event_type; the
    * windowed table is days × types regardless of event volume. */
  private val changepoint = Q(
    "x_changepoint",
    Some("""WITH dc AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                          CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            agg AS (SELECT event_type, day,
                      CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day)
                        AS BIGINT) AS s,
                      CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                        AS BIGINT) AS k,
                      CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS t_all,
                      CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS d_all
                    FROM dc),
            cu AS (SELECT event_type, day, d_all,
                     abs(d_all * s - k * t_all) AS cusum
                   FROM agg WHERE k < d_all),
            m AS (SELECT event_type, max(cusum) AS mc FROM cu GROUP BY 1)
            SELECT cu.event_type AS event_type,
              CAST(min(cu.day) AS BIGINT) AS cp_day,
              CAST(m.mc AS BIGINT) AS cusum_abs,
              CAST(min(cu.d_all) AS BIGINT) AS n_days
            FROM cu JOIN m ON cu.event_type = m.event_type AND cu.cusum = m.mc
            GROUP BY cu.event_type, m.mc
            ORDER BY cu.event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val wCum = Window.partitionBy($"event_type").orderBy($"day")
      val wAll = Window.partitionBy($"event_type")
      val cu = t(spark, dir, "events")
        .select($"event_type", expr("unix_millis(ts) DIV 86400000").as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("c"))
        .withColumn("s", sum($"c").over(wCum))
        .withColumn("k", row_number().over(wCum).cast("long"))
        .withColumn("t_all", sum($"c").over(wAll))
        .withColumn("d_all", count(lit(1)).over(wAll))
        .where($"k" < $"d_all")
        .select($"event_type", $"day", $"d_all",
          abs($"d_all" * $"s" - $"k" * $"t_all").as("cusum"))
      val m = cu.groupBy($"event_type").agg(max($"cusum").as("mc"))
      cu.as("c").join(m.as("m"),
          col("c.event_type") === col("m.event_type") &&
            col("c.cusum") === col("m.mc"))
        .groupBy(col("c.event_type").as("event_type"), col("m.mc").as("mc"))
        .agg(min(col("c.day")).as("cp_day"), min(col("c.d_all")).as("n_days"))
        .select($"event_type", $"cp_day", $"mc".as("cusum_abs"), $"n_days")
        .orderBy($"event_type")
    })

  /** Cohort lifetime value: purchase revenue laid out as (cohort week ×
    * week offset) — x_retention's activity matrix value-weighted, the
    * "do newer cohorts monetize faster" read. Cohort week is the
    * epoch-week of the user's first event of any type; revenue is exact
    * DECIMAL(18,2) summed before the final DOUBLE cast.
    *
    * Scale shape: per-user min (map-side combined) for the cohort day,
    * one user-keyed equi-join of the purchase stream against that
    * user-cardinality table, then a calendar-bounded (cohort, offset)
    * aggregate — the output is weeks², constant in event volume. */
  private val cohortLtv = Q(
    "x_cohort_ltv",
    Some("""WITH f AS (SELECT user_id,
                         min(epoch_ms(ts) // 86400000) AS c_day
                       FROM events GROUP BY user_id),
            p AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
                    CAST(value AS DECIMAL(18,2)) AS v
                  FROM events WHERE event_type = 'purchase')
            SELECT CAST(f.c_day // 7 AS BIGINT) AS c_week,
              CAST((p.day - f.c_day) // 7 AS BIGINT) AS off_w,
              CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_buyers,
              CAST(CAST(sum(p.v) AS DECIMAL(18,2)) AS DOUBLE) AS rev
            FROM p JOIN f USING (user_id)
            GROUP BY 1, 2 ORDER BY c_week, off_w"""),
    (spark, dir) => {
      import spark.implicits._
      val e = t(spark, dir, "events")
      val first = e
        .select($"user_id", expr("unix_millis(ts) DIV 86400000").as("day"))
        .groupBy($"user_id").agg(min($"day").as("c_day"))
      e.where($"event_type" === "purchase")
        .select($"user_id", expr("unix_millis(ts) DIV 86400000").as("day"),
          money($"value").as("v"))
        .join(first, "user_id")
        .groupBy(expr("c_day DIV 7").as("c_week"),
          expr("(day - c_day) DIV 7").as("off_w"))
        .agg(countDistinct($"user_id").as("n_buyers"),
          dbl(sum($"v").cast("decimal(18,2)")).as("rev"))
        .orderBy($"c_week", $"off_w")
    })

  /** Lag-1 / lag-7 autocorrelation of the daily count series per event
    * type — the "is this stream bursty day-over-day, and does it have a
    * weekly rhythm" monitoring read. The Pearson numerator and both
    * variance terms are computed as exact BIGINT moments over the
    * aligned-pair set (m·Σab − Σa·Σb etc.), so the only floating-point
    * steps are two IEEE sqrts, one division and one multiply — identical
    * bit patterns in any engine, floored to basis points. The pair
    * alignment is an equi-join on (type, day + k), so days missing from
    * the series simply contribute no pair.
    *
    * Scale shape: one (type, day) count aggregate (map-side combined,
    * output is calendar-bounded), then a self-join and a type-cardinality
    * rollup over it — cost is independent of raw event volume past the
    * first aggregate. The BIGINT moments hold to ~1e9 events/day; past
    * that the sums want DECIMAL(38,0), noted here rather than paid now. */
  private val autocorr = Q(
    "x_autocorr",
    Some("""WITH dc AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                          CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            p AS (SELECT a.event_type, l.lag_d, a.c AS ca, b.c AS cb
                  FROM (SELECT CAST(1 AS BIGINT) AS lag_d
                        UNION ALL SELECT 7) l
                  CROSS JOIN dc a
                  JOIN dc b ON b.event_type = a.event_type
                    AND b.day = a.day + l.lag_d),
            s AS (SELECT event_type, lag_d, CAST(count(*) AS BIGINT) AS m,
                    CAST(sum(ca) AS BIGINT) AS sa, CAST(sum(cb) AS BIGINT) AS sb,
                    sum(CAST(ca AS HUGEINT) * ca) AS saa,
                    sum(CAST(cb AS HUGEINT) * cb) AS sbb,
                    sum(CAST(ca AS HUGEINT) * cb) AS sab
                  FROM p GROUP BY 1, 2)
            SELECT event_type, lag_d, m AS n_pairs,
              CASE WHEN CAST(m AS HUGEINT) * saa - CAST(sa AS HUGEINT) * sa > 0
                    AND CAST(m AS HUGEINT) * sbb - CAST(sb AS HUGEINT) * sb > 0
                THEN CAST(floor((10000.0
                    * CAST(CAST(m AS HUGEINT) * sab
                         - CAST(sa AS HUGEINT) * sb AS DOUBLE))
                  / (sqrt(CAST(CAST(m AS HUGEINT) * saa
                            - CAST(sa AS HUGEINT) * sa AS DOUBLE))
                     * sqrt(CAST(CAST(m AS HUGEINT) * sbb
                              - CAST(sb AS HUGEINT) * sb AS DOUBLE))))
                  AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS autocorr_bp
            FROM s ORDER BY event_type, lag_d"""),
    (spark, dir) => {
      import spark.implicits._
      val dc = t(spark, dir, "events")
        .select($"event_type", expr("unix_millis(ts) DIV 86400000").as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("c"))
      val lags = Seq(1L, 7L).toDF("lag_d")
      val b = dc.select($"event_type".as("b_type"), $"day".as("b_day"),
        $"c".as("cb"))
      dc.crossJoin(broadcast(lags))
        .join(b, $"b_type" === $"event_type" &&
          $"b_day" === $"day" + $"lag_d")
        .select($"event_type", $"lag_d", $"c".as("ca"), $"cb")
        .groupBy($"event_type", $"lag_d")
        .agg(count(lit(1)).as("m"),
          sum($"ca").as("sa"), sum($"cb").as("sb"),
          // DECIMAL(38,0) quadratic chain (r18, the x_weekday_anova
          // widening verbatim): m·saa − sa² reaches 2⁶³ at the
          // family's 10⁷-events/day envelope — the guard must stay
          // integer-EXACT there, not wrap or raise
          sum(expr("CAST(ca AS DECIMAL(38,0)) * ca")).as("saa"),
          sum(expr("CAST(cb AS DECIMAL(38,0)) * cb")).as("sbb"),
          sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("sab"))
        .withColumn("vza", expr("CAST(m AS DECIMAL(38,0)) * saa"
          + " - CAST(sa AS DECIMAL(38,0)) * sa"))
        .withColumn("vzb", expr("CAST(m AS DECIMAL(38,0)) * sbb"
          + " - CAST(sb AS DECIMAL(38,0)) * sb"))
        .select($"event_type", $"lag_d", $"m".as("n_pairs"),
          when($"vza" > 0 && $"vzb" > 0,
            floor((lit(10000.0)
                * expr("CAST(CAST(m AS DECIMAL(38,0)) * sab"
                  + " - CAST(sa AS DECIMAL(38,0)) * sb AS DOUBLE)"))
              / (sqrt($"vza".cast("double"))
                 * sqrt($"vzb".cast("double"))))
              .cast("long"))
            .otherwise(lit(0L)).as("autocorr_bp"))
        .orderBy($"event_type", $"lag_d")
    })

  /** Weekly drift of the event-type mix vs the first (baseline) epoch
    * week, as total-variation distance in basis points — the
    * distribution-shift alarm a training-data ingest watches. Every
    * ratio is cross-multiplied into exact BIGINT arithmetic
    * (|obs·base_total − base_count·week_total| scaled then integer-DIV),
    * so there is no floating point anywhere; the per-type term keeps its
    * magnitude and sign separately because signed integer division
    * floors differently across engines. Types absent from a week or the
    * baseline drop out of the inner join identically in any engine.
    *
    * Scale shape: one (type, week) aggregate (calendar-bounded output),
    * a broadcast of the type-cardinality baseline, and a window sum over
    * the type-cardinality week groups — nothing downstream of the first
    * aggregate depends on event volume. */
  private val driftTvd = Q(
    "x_drift_tvd",
    Some("""WITH wc AS (SELECT event_type, epoch_ms(ts) // 604800000 AS w,
                          CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            mw AS (SELECT min(w) AS w0 FROM wc),
            base AS (SELECT event_type, c AS bc FROM wc, mw WHERE w = w0),
            bt AS (SELECT CAST(sum(bc) AS BIGINT) AS btot FROM base),
            wk AS (SELECT w, CAST(sum(c) AS BIGINT) AS wtot FROM wc
                   GROUP BY w),
            term AS (SELECT wc.w - mw.w0 AS week_idx, wc.event_type,
                       wc.c AS obs,
                       (abs(CAST(wc.c AS HUGEINT) * bt.btot
                          - CAST(base.bc AS HUGEINT) * wk.wtot) * 10000)
                         // (CAST(wk.wtot AS HUGEINT) * bt.btot)
                         AS abs_drift_bp,
                       CASE WHEN CAST(wc.c AS HUGEINT) * bt.btot
                                 > CAST(base.bc AS HUGEINT) * wk.wtot THEN 1
                            WHEN CAST(wc.c AS HUGEINT) * bt.btot
                                 < CAST(base.bc AS HUGEINT) * wk.wtot THEN -1
                            ELSE 0 END AS drift_sign
                     FROM wc
                     JOIN base ON base.event_type = wc.event_type
                     JOIN wk ON wk.w = wc.w
                     CROSS JOIN bt CROSS JOIN mw
                     WHERE wc.w > mw.w0)
            SELECT week_idx, event_type, obs,
              CAST(abs_drift_bp AS BIGINT) AS abs_drift_bp,
              CAST(drift_sign AS BIGINT) AS drift_sign,
              CAST((sum(abs_drift_bp) OVER (PARTITION BY week_idx)) // 2
                AS BIGINT) AS tvd_bp
            FROM term ORDER BY week_idx, event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val wc = t(spark, dir, "events")
        .select($"event_type", expr("unix_millis(ts) DIV 604800000").as("w"))
        .groupBy($"event_type", $"w")
        .agg(count(lit(1)).as("c"))
      // r20 (§2.4): the four tiny derived tables (min week, baseline
      // counts, baseline total, weekly totals) were each a separate
      // consumer of wc, and pruning divergence defeats ReusedExchange —
      // the old plan recomputed the scan + (type, week) aggregate
      // SEVEN times (17 Exchanges). All four are now windows over ONE
      // wc frame: w0/btot global (single-partition exchange of the
      // (type × week)-bounded aggregate — NOT corpus-sized), wtot
      // week-keyed, bc type-keyed. `bc IS NOT NULL` reproduces the old
      // INNER join's drop of types absent from the baseline week.
      // Same-run A/B (ScratchAB, rows hash-identical): 0.354 vs
      // 0.637 s at sf0.1 (0.56×); a persist() of wc instead read
      // 0.803 s — materialization overhead loses to windows here.
      val wG = Window.partitionBy()
      val wW = Window.partitionBy($"w")
      val wTy = Window.partitionBy($"event_type")
      val e = wc
        .withColumn("w0", min($"w").over(wG))
        .withColumn("wtot", sum($"c").over(wW))
        .withColumn("bc", max(when($"w" === $"w0", $"c")).over(wTy))
        .withColumn("btot", sum(when($"w" === $"w0", $"c")).over(wG))
        .where($"w" > $"w0" && $"bc".isNotNull)
      // DECIMAL(38,0) cross terms (r18, the DriftArith rule): c·btot
      // raises past 9.2·10¹⁸ in Long; wide is exact to 10³⁴ and loud
      val diff = expr(DriftArith.crossTermSql("c", "btot", "bc", "wtot"))
      val term = e
        .select(($"w" - $"w0").as("week_idx"), $"event_type",
          $"c".as("obs"),
          expr("(abs(CAST(c AS DECIMAL(38,0)) * btot"
            + " - CAST(bc AS DECIMAL(38,0)) * wtot) * 10000)"
            + " DIV (CAST(wtot AS DECIMAL(38,0)) * btot)")
            .as("abs_drift_bp"),
          when(diff > 0, 1L).when(diff < 0, -1L).otherwise(0L)
            .as("drift_sign"))
      term
        .withColumn("tvd_bp",
          expr("sum(abs_drift_bp) OVER (PARTITION BY week_idx) DIV 2"))
        .orderBy($"week_idx", $"event_type")
    })

  /** Two-sample Kolmogorov–Smirnov drift test — x_drift_tvd's
    * distribution-level sibling (TVD compares binned type MIX across
    * weeks; this compares the full VALUE DISTRIBUTION's shape): per
    * event type, the KS distance between the early-half and late-half
    * value distributions (split at the calendar midpoint
    * (d0 + d1) DIV 2 — integer, both engines), in EXACT INTEGERS
    * throughout: values quantize to cents (the declared bucketing —
    * floor(value·100), the kmQuantized rule), the ECDF difference at
    * every distinct cent level is cross-multiplied
    * |cumE·n_late − cumL·n_early| (never divided per level), the KS
    * sup is an integer max, and ONE trunc division at the end scales
    * to bp: ks_bp = max·10⁴ DIV (n_early·n_late). ks_at_cents = the
    * SMALLEST cent level achieving the max (deterministic tie rule) —
    * where the two distributions diverge most, the level a drift
    * investigation starts at. Types with an empty half drop out
    * identically in both engines (the x_hill_tail rule; never a
    * division by zero). (Kolmogorov 1933 / Smirnov 1939.)
    *
    * Overflow envelope (r18, the loud-or-exact respelling — see
    * [[DriftArith]]): the ECDF cross-multiplies run in DECIMAL(38,0)
    * ↔ DuckDB HUGEINT, so every cross term is EXACT for any BIGINT
    * count (cumE·nl ≤ ne·nl ≤ 8.5·10³⁷ < 10³⁸ always — the old
    * Long spelling's ne·nl < 9.2·10¹⁴ boundary is gone). The one
    * residual boundary is the terminal scaling mx·10⁴, exact while
    * ne·nl < 10³⁴ (per-type pooled rows ≲ 2·10¹⁷, five orders beyond
    * a 100 TB corpus); at that boundary BOTH engines raise loudly
    * (Spark ANSI decimal overflow / DuckDB HUGEINT OutOfRange) —
    * never a silently wrong number. The straddle pins live in
    * DegenerateInputSpec ("drift overflow straddle").
    *
    * Scale shape: one (type, cents) aggregate (map-side combined), ONE
    * type-keyed window over the distinct-cent rows (partition size =
    * distinct value levels — the cents quantization is what bounds it;
    * a wider-valued corpus coarsens the quantizer, same plan), a
    * type-cardinality rollup. Nothing downstream of the first
    * aggregate depends on event volume. */
  private val driftKs = Q(
    "x_drift_ks",
    Some("""WITH d AS (SELECT event_type,
                         CAST(floor(value * 100.0) AS BIGINT) AS cents,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dr AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
            s AS (SELECT event_type, cents,
                    CAST(sum(CASE WHEN day <= (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS ea,
                    CAST(sum(CASE WHEN day > (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS la
                  FROM d CROSS JOIN dr GROUP BY 1, 2),
            c AS (SELECT event_type, cents,
                    CAST(sum(ea) OVER w AS BIGINT) AS cume,
                    CAST(sum(la) OVER w AS BIGINT) AS cuml,
                    CAST(sum(ea) OVER t AS BIGINT) AS ne,
                    CAST(sum(la) OVER t AS BIGINT) AS nl
                  FROM s
                  WINDOW w AS (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY event_type)),
            m AS (SELECT event_type, cents, ne, nl,
                    abs(CAST(cume AS HUGEINT) * nl
                      - CAST(cuml AS HUGEINT) * ne) AS term,
                    max(abs(CAST(cume AS HUGEINT) * nl
                      - CAST(cuml AS HUGEINT) * ne))
                      OVER (PARTITION BY event_type) AS mx
                  FROM c WHERE ne > 0 AND nl > 0)
            SELECT event_type, CAST(ne AS BIGINT) AS n_early,
              CAST(nl AS BIGINT) AS n_late,
              CAST(min(cents) AS BIGINT) AS ks_at_cents,
              CAST(mx * 10000 // (CAST(ne AS HUGEINT) * nl) AS BIGINT)
                AS ks_bp
            FROM m WHERE term = mx
            GROUP BY event_type, ne, nl, mx
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      val wC = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r20 (§2.4): totals ride wC's spec with an unbounded-unbounded
      // frame so cume/cuml/ne/nl fuse into ONE Window operator (same
      // values — the frame covers the whole partition). mx stays a
      // second Window by necessity: it aggregates `term`, which is an
      // output of the first.
      val wT = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wM = Window.partitionBy($"event_type")
      val c = s.select($"event_type", $"cents",
        sum($"ea").over(wC).as("cume"), sum($"la").over(wC).as("cuml"),
        sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"))
        .where($"ne" > 0 && $"nl" > 0)
        .withColumn("term",
          expr(DriftArith.absCrossTermSql("cume", "nl", "cuml", "ne")))
        .withColumn("mx", max($"term").over(wM))
      c.where($"term" === $"mx")
        .groupBy($"event_type", $"ne", $"nl", $"mx")
        .agg(min($"cents").as("ks_at_cents"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          $"ks_at_cents",
          expr(DriftArith.scaleBpSql("mx", "ne", "nl")).as("ks_bp"))
        .orderBy($"event_type")
    })

  /** Population Stability Index per event type — the third member of
    * the drift trio (x_drift_tvd = binned type mix, x_drift_ks = full
    * value-distribution shape, PSI = the banded drift score model
    * monitoring teams actually threshold on: <0.1 stable, 0.1–0.25
    * moderate, >0.25 significant). Same calendar-midpoint split and
    * cents quantization as x_drift_ks; bins = TEN equal-population
    * bands of the EARLY (reference) distribution, assigned to each
    * distinct cent level by integer ECDF arithmetic — b = least(9,
    * greatest(0, (cumE−1)·10 DIV n_early)) — so the banding is exact
    * and engine-identical (the greatest(0,·) normalizes the cumE = 0
    * rows, the one place floor-vs-trunc division could diverge on a
    * negative operand; everything else is nonnegative). Late-only
    * levels above the early support land in the top band BY
    * CONSTRUCTION — the documented reference-binned-PSI blindness
    * (x_drift_ks is the shape-sensitive complement; that is why the
    * trio ships together). PSI = Σ_b (q_b − p_b)·ln(q_b/p_b) with the
    * industry ε = 10⁻⁴ clamp on both proportions; bands with no mass
    * at all are OMITTED, which equals the clamped convention exactly
    * ((ε − ε)·ln 1 = 0). Types with an empty half drop identically in
    * both engines (the x_drift_ks rule). Float policy = the
    * x_token_kl envelope: exact integer counts until one ln-sum over
    * ≤ 10 bands, identical operand trees, round-4 absorbing the
    * sub-1e-12 order skew.
    *
    * Scale shape: the same (type, cents) aggregate and type-keyed
    * window as x_drift_ks (volume only in the first map-side-combined
    * exchange), then a ≤ 10-row-per-type rollup. */
  private val driftPsi = Q(
    "x_drift_psi",
    Some("""WITH d AS (SELECT event_type,
                         CAST(floor(value * 100.0) AS BIGINT) AS cents,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dr AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
            s AS (SELECT event_type, cents,
                    CAST(sum(CASE WHEN day <= (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS ea,
                    CAST(sum(CASE WHEN day > (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS la
                  FROM d CROSS JOIN dr GROUP BY 1, 2),
            c AS (SELECT event_type, ea, la,
                    CAST(sum(ea) OVER w AS BIGINT) AS cume,
                    CAST(sum(ea) OVER t AS BIGINT) AS ne,
                    CAST(sum(la) OVER t AS BIGINT) AS nl
                  FROM s
                  WINDOW w AS (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY event_type)),
            b AS (SELECT event_type, ne, nl,
                    least(9, greatest(0,
                      (CAST(cume - 1 AS HUGEINT) * 10) // ne)) AS bin,
                    CAST(sum(ea) AS BIGINT) AS ce,
                    CAST(sum(la) AS BIGINT) AS cl
                  FROM c WHERE ne > 0 AND nl > 0
                  GROUP BY 1, 2, 3, 4)
            SELECT event_type, CAST(ne AS BIGINT) AS n_early,
              CAST(nl AS BIGINT) AS n_late,
              CAST(count(*) AS BIGINT) AS n_bins,
              round(sum((greatest(CAST(cl AS DOUBLE) / nl, 0.0001)
                       - greatest(CAST(ce AS DOUBLE) / ne, 0.0001))
                    * ln(greatest(CAST(cl AS DOUBLE) / nl, 0.0001)
                       / greatest(CAST(ce AS DOUBLE) / ne, 0.0001))), 4)
                AS psi
            FROM b GROUP BY event_type, ne, nl
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      val wC = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r20 (§2.4, one fewer operator pass): the totals window shares
      // wC's (partition, order) spec with an unbounded-unbounded frame,
      // so Spark fuses ALL the frames into ONE Window operator instead
      // of stacking a second partition-only Window behind the first —
      // same values (the frame covers the whole partition regardless of
      // order), one fewer buffered pass over every type partition.
      val wT = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      s.select($"event_type", $"ea", $"la",
          sum($"ea").over(wC).as("cume"),
          sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"))
        .where($"ne" > 0 && $"nl" > 0)
        .withColumn("bin",
          expr("least(9, greatest(0,"
            + " (CAST(cume - 1 AS DECIMAL(38,0)) * 10) DIV ne))"))
        .groupBy($"event_type", $"ne", $"nl", $"bin")
        .agg(sum($"ea").as("ce"), sum($"la").as("cl"))
        .groupBy($"event_type", $"ne", $"nl")
        .agg(count(lit(1)).as("n_bins"),
          round(sum(
            (greatest($"cl".cast("double") / $"nl", lit(0.0001))
              - greatest($"ce".cast("double") / $"ne", lit(0.0001)))
            * log(greatest($"cl".cast("double") / $"nl", lit(0.0001))
              / greatest($"ce".cast("double") / $"ne", lit(0.0001)))), 4)
            .as("psi"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          $"n_bins", $"psi")
        .orderBy($"event_type")
    })

  /** Two-sample chi-square drift test over the PSI bands — completing
    * the banded side of the drift family (PSI = the thresholded score;
    * χ² = the variance-weighted statistic a significance test reads,
    * with dof alongside): same calendar-midpoint split, cents
    * quantization and TEN equal-population early-reference bands as
    * x_drift_psi, then the 2×B-table identity χ² = Σ_b
    * (ce·nl − cl·ne)²·(ne+nl) / (ne·nl·(ce+cl)). The cross term
    * ce·nl − cl·ne is EXACT BIGINT (≤ ne·nl ≪ 2^53, so its double
    * image is exact) and is squared IN DOUBLE — squaring in int64
    * would overflow at (10¹⁰)²; the per-band term then follows the
    * x_token_kl float envelope (identical operand trees in both
    * engines, one ln-free ratio chain, round-4 absorbing aggregation
    * -order skew). dof = n_bins − 1 rides along so the row is directly
    * threshold-able against a χ² table. Empty bands are absent from
    * the rollup and contribute exactly 0 (ce = cl = 0 ⇒ numerator 0)
    * — omission ≡ the zero term, the PSI rule's χ² analogue.
    *
    * Scale shape: identical to x_drift_psi — the same (type, cents)
    * aggregate and type-keyed window, a ≤ 10-row-per-type rollup. */
  private val driftChi2 = Q(
    "x_drift_chi2",
    Some("""WITH d AS (SELECT event_type,
                         CAST(floor(value * 100.0) AS BIGINT) AS cents,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dr AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
            s AS (SELECT event_type, cents,
                    CAST(sum(CASE WHEN day <= (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS ea,
                    CAST(sum(CASE WHEN day > (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS la
                  FROM d CROSS JOIN dr GROUP BY 1, 2),
            c AS (SELECT event_type, ea, la,
                    CAST(sum(ea) OVER w AS BIGINT) AS cume,
                    CAST(sum(ea) OVER t AS BIGINT) AS ne,
                    CAST(sum(la) OVER t AS BIGINT) AS nl
                  FROM s
                  WINDOW w AS (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY event_type)),
            b AS (SELECT event_type, ne, nl,
                    least(9, greatest(0,
                      (CAST(cume - 1 AS HUGEINT) * 10) // ne)) AS bin,
                    CAST(sum(ea) AS BIGINT) AS ce,
                    CAST(sum(la) AS BIGINT) AS cl
                  FROM c WHERE ne > 0 AND nl > 0
                  GROUP BY 1, 2, 3, 4)
            SELECT event_type, CAST(ne AS BIGINT) AS n_early,
              CAST(nl AS BIGINT) AS n_late,
              CAST(count(*) - 1 AS BIGINT) AS dof,
              round(sum(CAST(CAST(ce AS HUGEINT) * nl
                          - CAST(cl AS HUGEINT) * ne AS DOUBLE)
                      * CAST(CAST(ce AS HUGEINT) * nl
                          - CAST(cl AS HUGEINT) * ne AS DOUBLE) * (ne + nl)
                    / (CAST(ne AS DOUBLE) * nl * (ce + cl))), 4) AS chi2
            FROM b GROUP BY event_type, ne, nl
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      val wC = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r20 (§2.4, one fewer operator pass): the totals window shares
      // wC's (partition, order) spec with an unbounded-unbounded frame,
      // so Spark fuses ALL the frames into ONE Window operator instead
      // of stacking a second partition-only Window behind the first —
      // same values (the frame covers the whole partition regardless of
      // order), one fewer buffered pass over every type partition.
      val wT = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      s.select($"event_type", $"ea", $"la",
          sum($"ea").over(wC).as("cume"),
          sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"))
        .where($"ne" > 0 && $"nl" > 0)
        .withColumn("bin",
          expr("least(9, greatest(0,"
            + " (CAST(cume - 1 AS DECIMAL(38,0)) * 10) DIV ne))"))
        .groupBy($"event_type", $"ne", $"nl", $"bin")
        .agg(sum($"ea").as("ce"), sum($"la").as("cl"))
        .groupBy($"event_type", $"ne", $"nl")
        .agg((count(lit(1)) - 1).as("dof"),
          round(sum(
            expr(DriftArith.crossTermSql("ce", "nl", "cl", "ne"))
              .cast("double")
              * expr(DriftArith.crossTermSql("ce", "nl", "cl", "ne"))
                .cast("double")
              * ($"ne" + $"nl")
              / ($"ne".cast("double") * $"nl" * ($"ce" + $"cl"))), 4)
            .as("chi2"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          $"dof", $"chi2")
        .orderBy($"event_type")
    })

  /** Cramér–von Mises two-sample drift — the drift family's
    * INTEGRATED-shape member (KS reads the WORST single level; CvM
    * reads the L² integral of the ECDF gap under the pooled empirical
    * measure, so many moderate level gaps register where KS sees only
    * the one extreme — the classical sup-vs-integral pairing; Cramér
    * 1928, von Mises 1931, two-sample form Anderson 1962). Same
    * calendar-midpoint split and cents quantizer as x_drift_ks; with
    * D = cumE·nl − cumL·ne at each distinct cent level and the level's
    * pooled weight w = ea + la, the tie-aware statistic is
    *   T = Σ_levels w·D² / ((ne+nl)²·ne·nl)
    * (the textbook T = ne·nl/(ne+nl)²·Σ_obs (F_E − F_L)² with the sum
    * over observations grouped by level and the cross-multiplied gap
    * substituted — every operand before the one division is an exact
    * integer).
    *
    * Float policy: the x_drift_chi2 envelope verbatim — D is an exact
    * wide integer (DECIMAL(38,0) ↔ HUGEINT since r18, [[DriftArith]]:
    * the cross-multiply never wraps at ANY BIGINT count; the old
    * Long spelling raised past ne·nl ≈ 9.2·10¹⁸) whose DOUBLE image
    * is exact while |D| ≤ ne·nl ≪ 2^53 — the float envelope, distinct
    * from and unchanged by the integer respelling — and the
    * square lives in DOUBLE because D² would overflow int64 at
    * (10¹⁰)²; identical operand trees both engines, one ln-free
    * division per level, round-4 (nonnegative throughout — no
    * signed-zero term needed). Empty-half types drop identically (the
    * x_drift_ks rule). Closed forms pinned: identical halves → every
    * D = 0 → 0.0 exactly; the KS pin's 10-level disjoint shift →
    * 100·(Σ₁¹⁰k² + Σ₁⁹k²)/(20²·10·10) = 67000/40000 = EXACTLY 1.675.
    *
    * Scale shape: identical to x_drift_ks/chi2 — one map-side-combined
    * (type, cents) aggregate, one type-keyed window over the distinct
    * levels, a type-cardinality rollup. */
  private val driftCvm = Q(
    "x_drift_cvm",
    Some("""WITH d AS (SELECT event_type,
                         CAST(floor(value * 100.0) AS BIGINT) AS cents,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dr AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
            s AS (SELECT event_type, cents,
                    CAST(sum(CASE WHEN day <= (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS ea,
                    CAST(sum(CASE WHEN day > (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS la
                  FROM d CROSS JOIN dr GROUP BY 1, 2),
            c AS (SELECT event_type, ea, la,
                    CAST(sum(ea) OVER w AS BIGINT) AS cume,
                    CAST(sum(la) OVER w AS BIGINT) AS cuml,
                    CAST(sum(ea) OVER t AS BIGINT) AS ne,
                    CAST(sum(la) OVER t AS BIGINT) AS nl
                  FROM s
                  WINDOW w AS (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY event_type))
            SELECT event_type, CAST(ne AS BIGINT) AS n_early,
              CAST(nl AS BIGINT) AS n_late,
              round(sum((ea + la)
                      * CAST(CAST(cume AS HUGEINT) * nl
                          - CAST(cuml AS HUGEINT) * ne AS DOUBLE)
                      * CAST(CAST(cume AS HUGEINT) * nl
                          - CAST(cuml AS HUGEINT) * ne AS DOUBLE))
                    / (CAST(ne + nl AS DOUBLE) * (ne + nl) * ne * nl), 4)
                AS cvm
            FROM c WHERE ne > 0 AND nl > 0
            GROUP BY event_type, ne, nl
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      val wC = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r20 (§2.4, one fewer operator pass): the totals window shares
      // wC's (partition, order) spec with an unbounded-unbounded frame,
      // so Spark fuses ALL the frames into ONE Window operator instead
      // of stacking a second partition-only Window behind the first —
      // same values (the frame covers the whole partition regardless of
      // order), one fewer buffered pass over every type partition.
      val wT = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      s.select($"event_type", $"ea", $"la",
          sum($"ea").over(wC).as("cume"), sum($"la").over(wC).as("cuml"),
          sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"))
        .where($"ne" > 0 && $"nl" > 0)
        .groupBy($"event_type", $"ne", $"nl")
        .agg(round(sum(($"ea" + $"la")
            * expr(DriftArith.crossTermSql("cume", "nl", "cuml", "ne"))
                .cast("double")
            * expr(DriftArith.crossTermSql("cume", "nl", "cuml", "ne"))
                .cast("double"))
          / (($"ne" + $"nl").cast("double") * ($"ne" + $"nl")
            * $"ne" * $"nl"), 4).as("cvm"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          $"cvm")
        .orderBy($"event_type")
    })

  /** Anderson–Darling two-sample drift — the drift family's
    * TAIL-WEIGHTED member and the worksheet the r17 candidates list
    * asked for before it could ship (delivered here): CvM integrates
    * the squared ECDF gap uniformly; AD divides each level's term by
    * H(1−H) of the pooled ECDF, so gaps in the TAILS — where H(1−H)
    * vanishes — are amplified, the property that makes AD the
    * standard screen for tail drift that CvM/KS under-weight
    * (Anderson & Darling 1952; two-sample form Pettitt 1976). The
    * discrete tie-grouped spelling over the same merged cent levels:
    *   A² = Σ_{levels, cumN < N} w·D² / (ne·nl·cumN·(N−cumN))
    * with D = cumE·nl − cumL·ne, w = ea + la, N = ne + nl, cumN the
    * pooled cumulative count — which REDUCES EXACTLY to Pettitt's
    * per-observation formula (1/(mn))·Σ_j D_j²/(j(N−j)) when every
    * level is untied (w ≡ 1), the citable anchor. The last merged
    * level (cumN = N) is excluded structurally (its D is 0 AND its AD
    * weight is 1/0 — the 0·∞ limit every AD treatment drops). Since
    * r18 (ADVICE fix) the exclusion is PER-TERM (a CASE inside the
    * sum), not a row filter: a type whose merged early∪late support
    * is a single cent level keeps its group and emits ad = 0.0,
    * preserving the drift family's shared-type-domain invariant and
    * matching StreamingDriftAd, which already emitted the zero row.
    *
    * FLOAT WORKSHEET (why this is admissible where mid-algebra
    * division is not): the per-level division is TERMINAL — its
    * quotient feeds a sum and one round-4, never subsequent integer
    * state — so the x_drift_chi2 envelope applies verbatim: D and w
    * are exact BIGINTs with exact double images (≪ 2^53), the square
    * and the denominator product live in DOUBLE with identical operand
    * trees in both engines, and the ≤ levels-count sum's ~10⁻¹⁶
    * relative skew is absorbed by the 10⁻⁴ rounding contract. What
    * the candidates-list boundary actually protected was quotients
    * FEEDING the next fold step (the multiplicative-HW failure); a
    * terminal ratio never was the problem.
    *
    * Closed forms pinned: identical halves → 0.0; disjoint point
    * masses with ne = nl = m → EXACTLY m (one live level: w = m,
    * D = m², term = m·m⁴/(m²·m·m)); the 10-level disjoint shift →
    * 7.7509 (the test replays the exact sum). Empty-half types drop
    * identically (the x_drift_ks rule).
    *
    * Scale shape: identical to x_drift_ks/cvm — one map-side-combined
    * (type, cents) aggregate, one type-keyed window pass, a
    * type-cardinality rollup. */
  private val driftAd = Q(
    "x_drift_ad",
    Some("""WITH d AS (SELECT event_type,
                         CAST(floor(value * 100.0) AS BIGINT) AS cents,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dr AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
            s AS (SELECT event_type, cents,
                    CAST(sum(CASE WHEN day <= (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS ea,
                    CAST(sum(CASE WHEN day > (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS la
                  FROM d CROSS JOIN dr GROUP BY 1, 2),
            c AS (SELECT event_type, ea, la,
                    CAST(sum(ea) OVER w AS BIGINT) AS cume,
                    CAST(sum(la) OVER w AS BIGINT) AS cuml,
                    CAST(sum(ea) OVER t AS BIGINT) AS ne,
                    CAST(sum(la) OVER t AS BIGINT) AS nl
                  FROM s
                  WINDOW w AS (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY event_type)),
            m AS (SELECT event_type, ne, nl, ea, la, cume, cuml,
                    cume + cuml AS cumn
                  FROM c WHERE ne > 0 AND nl > 0)
            SELECT event_type, CAST(ne AS BIGINT) AS n_early,
              CAST(nl AS BIGINT) AS n_late,
              round(sum(CASE WHEN cumn < ne + nl THEN
                      (ea + la)
                      * CAST(CAST(cume AS HUGEINT) * nl
                          - CAST(cuml AS HUGEINT) * ne AS DOUBLE)
                      * CAST(CAST(cume AS HUGEINT) * nl
                          - CAST(cuml AS HUGEINT) * ne AS DOUBLE)
                      / (CAST(ne AS DOUBLE) * nl * cumn
                          * (ne + nl - cumn))
                    ELSE 0.0 END),
                4) AS ad
            FROM m
            GROUP BY event_type, ne, nl
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      val wC = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r20 (§2.4, one fewer operator pass): the totals window shares
      // wC's (partition, order) spec with an unbounded-unbounded frame,
      // so Spark fuses ALL the frames into ONE Window operator instead
      // of stacking a second partition-only Window behind the first —
      // same values (the frame covers the whole partition regardless of
      // order), one fewer buffered pass over every type partition.
      val wT = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      s.select($"event_type", $"ea", $"la",
          sum($"ea").over(wC).as("cume"), sum($"la").over(wC).as("cuml"),
          sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"))
        .where($"ne" > 0 && $"nl" > 0)
        .withColumn("cumn", $"cume" + $"cuml")
        .groupBy($"event_type", $"ne", $"nl")
        .agg(round(sum(when($"cumn" < $"ne" + $"nl",
          ($"ea" + $"la")
            * expr(DriftArith.crossTermSql("cume", "nl", "cuml", "ne"))
                .cast("double")
            * expr(DriftArith.crossTermSql("cume", "nl", "cuml", "ne"))
                .cast("double")
          / ($"ne".cast("double") * $"nl" * $"cumn"
            * ($"ne" + $"nl" - $"cumn"))).otherwise(lit(0.0))), 4)
          .as("ad"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          $"ad")
        .orderBy($"event_type")
    })

  /** Mann–Whitney rank-sum drift test — the drift family's
    * NONPARAMETRIC LOCATION member (TVD = type mix, KS = worst-point
    * shape gap, PSI = banded score; MW answers the direction question
    * none of those do: "did values systematically move UP or DOWN
    * between the halves?"). Same calendar-midpoint split and cents
    * quantization as x_drift_ks; per type, the rank-sum U statistic of
    * the early half vs the late half in EXACT INTEGERS throughout: ties
    * take midranks, and every midrank is carried DOUBLED so the
    * half-integers never materialize — at a cent level with cb values
    * below it and c = ea + la values tied at it, each value's doubled
    * midrank is 2·cb + c + 1, so the early half's doubled rank sum is
    * 2R = Σ ea·(2·cb + ea + la + 1) (one window prefix sum, the KS
    * spelling), u2 = 2U = 2R − ne·(ne+1), and the common-language
    * effect size P(early > late) + ½P(tie) lands in bp by ONE trunc
    * division: cles_bp = u2·10⁴ DIV (2·ne·nl) ≡ floor(U·10⁴/(ne·nl))
    * (numerator and denominator share the factor 2 exactly). 5000 bp =
    * no shift; 0 / 10000 = every late value above / below every early
    * value — and identical half-multisets give EXACTLY 5000 by the
    * pairing symmetry (u2 = ne·nl), not just in expectation — the
    * DegenerateInputSpec pins. Types with an empty half drop
    * identically in both engines (the x_drift_ks rule).
    * (Mann & Whitney 1947; Wilcoxon 1945.)
    *
    * Overflow envelope (r18, loud-or-exact — [[DriftArith]]): the
    * rank-sum accumulates in DECIMAL(38,0) ↔ HUGEINT, so r2 ≈ 2n² is
    * exact to n ≈ 7·10¹⁸ per type (any BIGINT-countable corpus; the
    * old Long boundary n < 2·10⁷ is gone). Residual boundaries, both
    * LOUD (ANSI decimal / HUGEINT overflow raise, never a wrap): the
    * u2 OUTPUT column is BIGINT-wide (binds at u2 = 2·ne·nl ≥ 2⁶³ —
    * mixed per-type rows ≳ 3·10⁹; the internal value stays exact) and
    * the cles_bp scaling u2·10⁴ (binds at ne·nl ≈ 5·10³³).
    *
    * Scale shape: identical to x_drift_ks — one map-side-combined
    * (type, cents) aggregate, ONE type-keyed window over the
    * distinct-cent rows (bounded by the cents quantizer), a
    * type-cardinality rollup. Nothing downstream of the first
    * aggregate depends on event volume. */
  private val driftMw = Q(
    "x_drift_mw",
    Some("""WITH d AS (SELECT event_type,
                         CAST(floor(value * 100.0) AS BIGINT) AS cents,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dr AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
            s AS (SELECT event_type, cents,
                    CAST(sum(CASE WHEN day <= (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS ea,
                    CAST(sum(CASE WHEN day > (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS la
                  FROM d CROSS JOIN dr GROUP BY 1, 2),
            c AS (SELECT event_type, ea, la,
                    CAST(sum(ea + la) OVER w - (ea + la) AS BIGINT) AS cb,
                    CAST(sum(ea) OVER t AS BIGINT) AS ne,
                    CAST(sum(la) OVER t AS BIGINT) AS nl
                  FROM s
                  WINDOW w AS (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY event_type))
            SELECT event_type, CAST(ne AS BIGINT) AS n_early,
              CAST(nl AS BIGINT) AS n_late,
              CAST(sum(CAST(ea AS HUGEINT) * (2 * cb + ea + la + 1))
                - CAST(ne AS HUGEINT) * (ne + 1) AS BIGINT) AS u2,
              CAST((sum(CAST(ea AS HUGEINT) * (2 * cb + ea + la + 1))
                - CAST(ne AS HUGEINT) * (ne + 1))
                * 10000 // (2 * CAST(ne AS HUGEINT) * nl) AS BIGINT)
                AS cles_bp
            FROM c WHERE ne > 0 AND nl > 0
            GROUP BY event_type, ne, nl
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      val wC = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r20 (§2.4, one fewer operator pass): the totals window shares
      // wC's (partition, order) spec with an unbounded-unbounded frame,
      // so Spark fuses ALL the frames into ONE Window operator instead
      // of stacking a second partition-only Window behind the first —
      // same values (the frame covers the whole partition regardless of
      // order), one fewer buffered pass over every type partition.
      val wT = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      s.select($"event_type", $"ea", $"la",
          (sum($"ea" + $"la").over(wC) - ($"ea" + $"la")).as("cb"),
          sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"))
        .where($"ne" > 0 && $"nl" > 0)
        .groupBy($"event_type", $"ne", $"nl")
        .agg(sum(expr(DriftArith.mwR2TermSql("ea", "cb", "la"))).as("r2"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          expr(DriftArith.mwU2Sql("r2", "ne")).as("u2"),
          expr(DriftArith.mwClesBpSql("r2", "ne", "nl")).as("cles_bp"))
        .orderBy($"event_type")
    })

  /** Inter-arrival-time histogram per event type: the gap between a
    * user's consecutive events of the same type, bucketed into seven
    * fixed spans (sub-second through ≥ 1 day) — the cadence profile
    * that separates heartbeat-like streams from human-paced ones, and
    * the read that sizes session-gap and burst thresholds from data
    * instead of folklore. Buckets are CASE chains on integer ms (both
    * engines branch identically; bucket labels carry a sort prefix so
    * the output ordering is total without any float).
    *
    * Scale shape: one (user, type)-keyed lag window (per-group size
    * bounded by a user's events of one type — the same spill envelope
    * as every per-user window here) into a types×7 aggregate. */
  private val interarrival = Q(
    "x_interarrival",
    Some("""WITH e AS (SELECT user_id, event_type, event_id,
                         epoch_ms(ts) AS ms FROM events),
            g AS (SELECT event_type,
                    ms - lag(ms) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ms, event_id) AS gap
                  FROM e),
            b AS (SELECT event_type,
                    CASE WHEN gap < 1000 THEN 'a_lt_1s'
                         WHEN gap < 60000 THEN 'b_lt_1m'
                         WHEN gap < 600000 THEN 'c_lt_10m'
                         WHEN gap < 3600000 THEN 'd_lt_1h'
                         WHEN gap < 21600000 THEN 'e_lt_6h'
                         WHEN gap < 86400000 THEN 'f_lt_1d'
                         ELSE 'g_ge_1d' END AS bucket
                  FROM g WHERE gap IS NOT NULL)
            SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
            FROM b GROUP BY 1, 2 ORDER BY event_type, bucket"""),
    (spark, dir) => {
      import spark.implicits._
      val wUT = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ms", $"event_id")
      t(spark, dir, "events")
        .select($"user_id", $"event_type", $"event_id",
          unix_millis($"ts").as("ms"))
        .withColumn("gap", $"ms" - lag($"ms", 1).over(wUT))
        .where($"gap".isNotNull)
        .select($"event_type",
          when($"gap" < 1000, "a_lt_1s")
            .when($"gap" < 60000, "b_lt_1m")
            .when($"gap" < 600000, "c_lt_10m")
            .when($"gap" < 3600000, "d_lt_1h")
            .when($"gap" < 21600000, "e_lt_6h")
            .when($"gap" < 86400000, "f_lt_1d")
            .otherwise("g_ge_1d").as("bucket"))
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type", $"bucket")
    })

  /** Per-type Gini coefficient of events-per-user — the concentration
    * read behind both capacity planning (is 1% of users 90% of load?)
    * and the salting decision x_user_skew's p99/max preview feeds.
    * Computed from the COUNT HISTOGRAM, not the user list: per-user
    * counts collapse to (count value → user frequency) first, so the
    * cumulative-sum window runs over the distinct-count-value
    * histogram — a post-aggregation of a post-aggregation whose row
    * count is bounded by the largest per-user count, not by users or
    * events. On sorted values v with frequency f and items-before C,
    * Σ rank·x over a tied run is v·(f·C + f(f+1)/2) exactly, and
    * G = 2·Σ/(n·S) − (n+1)/n = (2·Σ − (n+1)·S)/(n·S) is non-negative,
    * so basis points come out of ONE integer floor-division — no
    * floating point anywhere (the round()-on-exact-ties trap). The
    * BIGINT numerator holds to ~10¹⁴ user·events; past that it wants
    * DECIMAL(38,0), noted rather than paid (same envelope as
    * x_autocorr's moments). */
  private val gini = Q(
    "x_gini",
    Some("""WITH c AS (SELECT event_type, user_id,
                         CAST(count(*) AS BIGINT) AS cnt
                       FROM events GROUP BY 1, 2),
            h AS (SELECT event_type, cnt AS v, CAST(count(*) AS BIGINT) AS f
                  FROM c GROUP BY 1, 2),
            w AS (SELECT event_type, v, f,
                    CAST(coalesce(sum(f) OVER (PARTITION BY event_type
                      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS BIGINT) AS cum0
                  FROM h),
            t AS (SELECT event_type,
                    CAST(sum(v * (f * cum0 + (f * (f + 1)) // 2)) AS BIGINT) AS a,
                    CAST(sum(f) AS BIGINT) AS n_users,
                    CAST(sum(v * f) AS BIGINT) AS n_events
                  FROM w GROUP BY 1)
            SELECT event_type, n_users, n_events,
              CAST((10000 * (2 * a - (n_users + 1) * n_events))
                   // (n_users * n_events) AS BIGINT) AS gini_bp
            FROM t ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val hist = t(spark, dir, "events")
        .groupBy($"event_type", $"user_id")
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"event_type", $"cnt".as("v"))
        .agg(count(lit(1)).as("f"))
      val wCum = Window.partitionBy($"event_type").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      hist
        .withColumn("cum0", coalesce(sum($"f").over(wCum), lit(0L)))
        .groupBy($"event_type")
        .agg(
          sum($"v" * ($"f" * $"cum0" + expr("(f * (f + 1)) DIV 2"))).as("a"),
          sum($"f").as("n_users"),
          sum($"v" * $"f").as("n_events"))
        .select($"event_type", $"n_users", $"n_events",
          expr("(10000 * (2 * a - (n_users + 1) * n_events))" +
            " DIV (n_users * n_events)").as("gini_bp"))
        .orderBy($"event_type")
    })

  /** Hour-of-week seasonality profile: event counts and traffic share
    * per (day-of-week, hour-of-day) cell, plus each cell's ratio to
    * the uniform 1/168 expectation in basis points — the load-shape
    * read behind batch-window scheduling and anomaly baselines (a
    * spike detector that ignores weekly seasonality pages on every
    * Monday morning). All bucketing is integer floor math on epoch-ms
    * (day 0 = Thursday, so dow = (day+4) % 7 makes 0=Sunday in both
    * engines); shares are integer basis points. One map-side-combined
    * aggregate to a fixed 168-row output at any scale. */
  private val hourProfile = Q(
    "x_hour_profile",
    Some("""WITH e AS (SELECT ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow,
                         (epoch_ms(ts) // 3600000) % 24 AS hod
                       FROM events),
            c AS (SELECT dow, hod, CAST(count(*) AS BIGINT) AS n
                  FROM e GROUP BY 1, 2),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
            SELECT dow, hod, n,
              CAST((n * 10000) // total AS BIGINT) AS share_bp,
              CAST((n * 168 * 10000) // total AS BIGINT) AS vs_uniform_bp
            FROM c, t ORDER BY dow, hod"""),
    (spark, dir) => {
      import spark.implicits._
      val c = t(spark, dir, "events")
        .select(expr("((unix_millis(ts) DIV 86400000) + 4) % 7").as("dow"),
          expr("(unix_millis(ts) DIV 3600000) % 24").as("hod"))
        .groupBy($"dow", $"hod")
        .agg(count(lit(1)).as("n"))
      val tot = c.agg(sum($"n").as("total"))
      c.crossJoin(broadcast(tot))
        .select($"dow", $"hod", $"n",
          expr("(n * 10000) DIV total").as("share_bp"),
          expr("(n * 168 * 10000) DIV total").as("vs_uniform_bp"))
        .orderBy($"dow", $"hod")
    })

  /** Weekly JSON payload key-set drift: for each epoch week, how often
    * each top-level `props` key appears and its share of that week's
    * events — the schema-evolution monitor an event-store ingest runs
    * so a producer silently dropping or adding a field pages before
    * downstream projections break (the relational restatement of the
    * reference's live schema-inference surface, reference
    * handler.clj:256-263, over time instead of point-in-time).
    * Weeks are integer epoch-ms floor division re-based to the
    * corpus's first week; shares are integer basis points of the
    * week's EVENT count (not key occurrences), so a key present on
    * every event reads 10000 regardless of how many other keys exist.
    *
    * Scale shape: one JSON-keys explode (O(events × keys/event),
    * map-side combined into a (week × key)-bounded aggregate), week
    * totals from a second calendar-bounded aggregate broadcast back;
    * the min-week scalar rides a 1-row broadcast. All integer. */
  private val schemaDrift = Q(
    "x_schema_drift",
    Some("""WITH e AS (SELECT epoch_ms(ts) // 604800000 AS w, props
                       FROM events),
            w0 AS (SELECT min(w) AS w0 FROM e),
            wt AS (SELECT w, CAST(count(*) AS BIGINT) AS n_events
                   FROM e GROUP BY w),
            k AS (SELECT w, unnest(json_keys(props)) AS key FROM e),
            kc AS (SELECT w, key, CAST(count(*) AS BIGINT) AS n
                   FROM k GROUP BY 1, 2)
            SELECT CAST(kc.w - w0.w0 AS BIGINT) AS week_idx, key, n,
              CAST((n * 10000) // n_events AS BIGINT) AS share_bp
            FROM kc JOIN wt ON wt.w = kc.w CROSS JOIN w0
            ORDER BY week_idx, key"""),
    (spark, dir) => {
      import spark.implicits._
      val e = t(spark, dir, "events")
        .select(expr("unix_millis(ts) DIV 604800000").as("w"), $"props")
      val w0 = e.agg(min($"w").as("w0"))
      val wt = e.groupBy($"w").agg(count(lit(1)).as("n_events"))
        .select($"w".as("wt_w"), $"n_events")
      val kc = e
        .select($"w", explode(expr("json_object_keys(props)")).as("key"))
        .groupBy($"w", $"key")
        .agg(count(lit(1)).as("n"))
      kc.join(broadcast(wt), $"wt_w" === $"w")
        .crossJoin(broadcast(w0))
        .select(($"w" - $"w0").as("week_idx"), $"key", $"n",
          expr("(n * 10000) DIV n_events").as("share_bp"))
        .orderBy($"week_idx", $"key")
    })

  /** Hill tail-index estimate of the event-value distribution per
    * type: α̂ = 1 / mean(ln x_(i) − ln x_(k+1)) over the top k=200
    * order statistics — the heavy-tail read that tells capacity
    * planning whether extreme values have finite variance (α > 2) or
    * a single event can dominate any aggregate (α ≤ 2); pairs with
    * x_value_outliers (which screens points) by characterizing the
    * whole tail. Types with fewer than k+1 positive values are
    * dropped rather than estimated from a vacuous tail.
    *
    * Scale shape: the k+1 top values per type come from the bounded
    * TopK aggregate (map-side ≤ k+1 rows per partial — never a
    * per-type window sorting the corpus); the estimator then runs on
    * a ≤ 201-element array. FP is ln over corpus doubles + a 200-term
    * mean (the established ~1e-13 skew vs 1e-4 rounding envelope). */
  private val hillTail = Q(
    "x_hill_tail",
    Some("""WITH v AS (SELECT event_type, event_id, value FROM events
                       WHERE value > 0),
            r AS (SELECT event_type, value,
                    row_number() OVER (PARTITION BY event_type
                      ORDER BY value DESC, event_id) AS rk
                  FROM v QUALIFY rk <= 201),
            ok AS (SELECT event_type FROM r GROUP BY event_type
                   HAVING count(*) = 201),
            xk AS (SELECT r.event_type, value AS x_k1 FROM r
                   JOIN ok ON ok.event_type = r.event_type
                   WHERE rk = 201)
            SELECT r.event_type, CAST(200 AS BIGINT) AS k,
              round(1.0 / avg(ln(value / x_k1)), 4) AS hill_alpha
            FROM r JOIN xk ON xk.event_type = r.event_type
            WHERE rk <= 200
            GROUP BY r.event_type
            HAVING max(value) > min(x_k1)
            ORDER BY r.event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val top = udaf(graft.functions.TopK.TopKAgg(201, byA = true))
      val tops = t(spark, dir, "events")
        .where($"value" > 0)
        .groupBy($"event_type")
        .agg(top($"event_id", $"value", $"value").as("top"))
        .where(size($"top") === 201)
      // Degeneracy guard (the x_heaps_fit lesson): if ALL top-200 values
      // tie with x_(k+1), every ln(x_i/x_k1) term is exactly 0 and
      // α = 1/0 = Infinity — an undefined tail, not an estimate. Such
      // types are DROPPED (same convention as the <k+1-values drop
      // above). The test is exact double equality (max of the tied
      // order statistics vs x_k1 — both read unmodified from parquet),
      // not a moment ratio, so it cannot ride rounding noise.
      tops
        .select($"event_type", element_at($"top", 201).getField("a").as("x_k1"),
          explode(expr("slice(top, 1, 200)")).as("c"))
        .groupBy($"event_type")
        .agg(round(lit(1.0) / avg(log($"c.a" / $"x_k1")), 4).as("hill_alpha"),
          (max($"c.a") > max($"x_k1")).as("has_tail"))
        .where($"has_tail")
        .select($"event_type", lit(200L).as("k"), $"hill_alpha")
        .orderBy($"event_type")
    })

  /** Audience overlap between event types: Jaccard (and both
    * containments) of the USER SETS of every type pair — the
    * segmentation read behind "do purchasers come from clickers"
    * and the cross-sell targeting matrix. Distinct (type, user)
    * first (per-user volume never inflates anything), then a
    * user-keyed self-join — pair rows are bounded by Σ_u types(u)²
    * with types(u) ≤ |types| (a handful), NOT by event volume; set
    * sizes broadcast back onto the |types|²-row result. Integer bp. */
  private val userOverlap = Q(
    "x_user_overlap",
    Some("""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
            sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                   FROM tu GROUP BY 1),
            pair AS (SELECT a.event_type AS t_a, b.event_type AS t_b,
                       CAST(count(*) AS BIGINT) AS inter
                     FROM tu a JOIN tu b ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
                     GROUP BY 1, 2)
            SELECT t_a, t_b, inter,
              CAST((inter * 10000) // (sa.n + sb.n - inter) AS BIGINT) AS jac_bp,
              CAST((inter * 10000) // least(sa.n, sb.n) AS BIGINT) AS cont_bp
            FROM pair
            JOIN sz sa ON sa.event_type = t_a
            JOIN sz sb ON sb.event_type = t_b
            ORDER BY t_a, t_b"""),
    (spark, dir) => {
      import spark.implicits._
      val tu = t(spark, dir, "events")
        .select($"event_type", $"user_id").distinct()
      val sz = tu.groupBy($"event_type").agg(count(lit(1)).as("n"))
      val b = tu.select($"event_type".as("t_b"), $"user_id".as("u_b"))
      val pair = tu.join(b, $"u_b" === $"user_id" &&
          $"event_type" < $"t_b")
        .groupBy($"event_type".as("t_a"), $"t_b")
        .agg(count(lit(1)).as("inter"))
      pair
        .join(broadcast(sz.select($"event_type".as("s_a"), $"n".as("n_a"))),
          $"s_a" === $"t_a")
        .join(broadcast(sz.select($"event_type".as("s_b"), $"n".as("n_b"))),
          $"s_b" === $"t_b")
        .select($"t_a", $"t_b", $"inter",
          expr("(inter * 10000) DIV (n_a + n_b - inter)").as("jac_bp"),
          expr("(inter * 10000) DIV least(n_a, n_b)").as("cont_bp"))
        .orderBy($"t_a", $"t_b")
    })

  /** One-step-ahead simple-exponential-smoothing forecast (α = 1/2) of
    * the per-type daily event count, with its backtest MAE — the
    * capacity-planning + alert-baseline read (x_spike_detect compares
    * against a trailing MEAN; an SES level discounts history, so it
    * tracks drifting series without x_changepoint's re-fit). α = 1/2 is
    * deliberate: every smoothing step is an EXACT dyadic halving of
    * integer-born doubles, so the recurrence — run as the same strict
    * left fold in both engines (the vec_dot convention, carried through
    * a (level, abs-error) struct accumulator) — is bit-identical, and
    * the only inexact ops are the final /(n−1) and round(4).
    *
    * Scale shape: one calendar-bounded (type, day) aggregate; the fold
    * runs over each type's ≤ days-span array (the exact-percentile
    * family's documented bound) — a types-cardinality task, never a
    * corpus window. */
  private val forecastSes = Q(
    "x_forecast_ses",
    Some("""WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            s AS (SELECT event_type,
                    list(CAST(n AS DOUBLE) ORDER BY day) AS xs
                  FROM d GROUP BY 1),
            -- running levels as a LIST fold of scalars (a struct
            -- accumulator is unsafe here: DuckDB's lambda evaluates
            -- struct_pack fields sequentially, so a later field can see
            -- an earlier field's UPDATED value); every op is an exact
            -- dyadic halving, so the error sum is order-exact too
            f AS (SELECT event_type, xs, len(xs) AS n_days,
                    list_reduce(list_transform(xs, x -> [x]),
                      (acc, x) -> list_append(acc, (acc[-1] + x[1]) / 2)) AS lv
                  FROM s)
            SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
              round(lv[-1], 4) AS ses_level,
              round(list_sum(list_transform(range(2, len(xs) + 1),
                  i -> abs(xs[i] - lv[i - 1]))) / (n_days - 1), 4) AS mae
            FROM f ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .groupBy($"event_type", expr("unix_millis(ts) DIV 86400000").as("day"))
        .agg(count(lit(1)).as("n"))
      d.groupBy($"event_type")
        .agg(expr(
          "transform(sort_array(collect_list(struct(day, n))), p -> CAST(p.n AS DOUBLE))")
          .as("xs"))
        .select($"event_type", size($"xs").cast("long").as("n_days"),
          // xs[0]: Spark's [] is 0-based (slice() is 1-based) — the
          // seed is the FIRST day's count
          expr("""aggregate(slice(xs, 2, size(xs) - 1),
                    named_struct('s', xs[0], 'e', CAST(0.0 AS DOUBLE)),
                    (acc, x) -> named_struct('s', (acc.s + x) / 2,
                      'e', acc.e + abs(x - acc.s)))""").as("r"))
        .select($"event_type", $"n_days",
          round($"r.s", 4).as("ses_level"),
          round($"r.e" / ($"n_days" - 1), 4).as("mae"))
        .orderBy($"event_type")
    })

  /** Weekly growth accounting — the new / retained / resurrected /
    * churned decomposition every growth team runs on its active-user
    * curve (the "quick ratio" read): per calendar week, active users
    * split into NEW (first-ever week), RETAINED (also active the
    * immediately-previous week) and RESURRECTED (active before, but
    * not last week); churned(w) = active(w⁻) − retained(w) — the
    * users who were there last time and didn't come back — and the
    * quick ratio (new + resurrected)·10⁴ DIV churned in bp (the
    * >10⁴ = growing threshold), zero-guarded to 0 when nobody churned.
    * WEEK-AXIS SEMANTICS (ADVICE r15, precision over the earlier
    * doc): the churn lag runs over PRESENT weeks — w⁻ is the previous
    * NON-EMPTY week, not the calendar week w−1. A calendar week with
    * zero actives emits no row at all, so its churn is not lost but
    * ROLLS FORWARD to the next active week (which reports
    * active(w⁻) − retained = the whole prior audience, since nobody
    * separated by ≥ 2 calendar weeks classifies as retained — the
    * conservation identity still balances). Densifying the axis with
    * zero rows was declined: it changes the executive chart's shape
    * for a purely-empty period and both engines agree on the present-
    * weeks convention; the gap-week roll-forward is pinned in
    * DegenerateInputSpec so the semantic is tested, not just stated.
    * All EXACT integer counts: the per-user previous-active-week is
    * one lag window, the classification is a three-way CASE on
    * (w = first, prev = w−1), and when w > first a previous active
    * week always exists so the lag is never NULL in the resurrected
    * branch (stated, not coalesced). x_retention reads the same
    * motion as a cohort grid; this is the single-curve decomposition
    * executives actually chart.
    *
    * Scale shape: one DISTINCT (user, week) exchange (map-side
    * combined), one user-keyed lag window over each user's ≤
    * calendar-weeks rows, a week-cardinality rollup and ONE
    * single-partition lag over those ≤ span-weeks rows (tiny by
    * construction). Nothing downstream of the distinct depends on
    * event volume. */
  private val growthAccounting = Q(
    "x_growth_accounting",
    Some("""WITH a AS (SELECT DISTINCT user_id,
                         epoch_ms(ts) // 604800000 AS w FROM events),
            f AS (SELECT user_id, min(w) AS fw FROM a GROUP BY user_id),
            l AS (SELECT a.user_id, a.w, f.fw,
                    lag(a.w) OVER (PARTITION BY a.user_id ORDER BY a.w)
                      AS pw
                  FROM a JOIN f ON f.user_id = a.user_id),
            c AS (SELECT w, CAST(count(*) AS BIGINT) AS n_active,
                    CAST(sum(CASE WHEN w = fw THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_new,
                    CAST(sum(CASE WHEN w > fw AND pw = w - 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
                    CAST(sum(CASE WHEN w > fw AND pw < w - 1
                             THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_resurrected
                  FROM l GROUP BY w),
            g AS (SELECT w, n_active, n_new, n_retained, n_resurrected,
                    CAST(coalesce(lag(n_active) OVER (ORDER BY w), 0)
                      - n_retained AS BIGINT) AS n_churned
                  FROM c)
            SELECT w - (SELECT min(w) FROM a) AS week_idx, n_active,
              n_new, n_retained, n_resurrected, n_churned,
              CAST(CASE WHEN n_churned > 0
                THEN (n_new + n_resurrected) * 10000 // n_churned
                ELSE 0 END AS BIGINT) AS quick_ratio_bp
            FROM g ORDER BY week_idx"""),
    (spark, dir) => {
      import spark.implicits._
      val a = t(spark, dir, "events")
        .select($"user_id", expr("unix_millis(ts) DIV 604800000").as("w"))
        .distinct()
      val f = a.groupBy($"user_id").agg(min($"w").as("fw"))
      val wU = Window.partitionBy($"user_id").orderBy($"w")
      val l = a.join(f, "user_id")
        .withColumn("pw", lag($"w", 1).over(wU))
      val c = l.groupBy($"w")
        .agg(count(lit(1)).as("n_active"),
          sum(when($"w" === $"fw", 1L).otherwise(0L)).as("n_new"),
          sum(when($"w" > $"fw" && $"pw" === $"w" - 1, 1L).otherwise(0L))
            .as("n_retained"),
          sum(when($"w" > $"fw" && $"pw" < $"w" - 1, 1L).otherwise(0L))
            .as("n_resurrected"))
      val w0 = a.agg(min($"w").as("w0"))
      c.withColumn("n_churned",
          coalesce(lag($"n_active", 1).over(Window.orderBy($"w")), lit(0L))
            - $"n_retained")
        .crossJoin(broadcast(w0))
        .select(($"w" - $"w0").as("week_idx"), $"n_active", $"n_new",
          $"n_retained", $"n_resurrected", $"n_churned",
          when($"n_churned" > 0,
            expr("(n_new + n_resurrected) * 10000 DIV n_churned"))
            .otherwise(0L).as("quick_ratio_bp"))
        .orderBy($"week_idx")
    })

  /** DAU/WAU stickiness — the engagement-frequency ratio product teams
    * chart next to the growth accounting (how much of the weekly
    * audience shows up on a given day; 10⁴ bp = everybody, ~1430 =
    * one-day-a-week users): per day, distinct daily actives over
    * distinct CALENDAR-week actives (day DIV 7 ≡ the ms//604800000
    * week x_growth_accounting uses — identical integer arithmetic on
    * nonnegative epochs), one trunc division to bp. The calendar-week
    * denominator is the DECLARED choice (vs a trailing-7-day window,
    * which needs a ×7 row amplification or interval machinery — the
    * classic WAU definitions differ and this one is exact, cheap and
    * self-consistent with the weekly decomposition); dau ≤ wau by
    * construction so the ratio never exceeds 10⁴.
    *
    * Scale shape: one DISTINCT (user, day) exchange (map-side
    * combined), a calendar-bounded day rollup, a second distinct over
    * the ALREADY-distinct (user, day) rows rolled to weeks, and a
    * broadcast join of the ≤ span-weeks WAU table — nothing downstream
    * of the first distinct depends on event volume. */
  private val stickiness = Q(
    "x_stickiness",
    Some("""WITH a AS (SELECT DISTINCT user_id,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                    FROM a GROUP BY day),
            aw AS (SELECT DISTINCT user_id, day // 7 AS wk FROM a),
            wau AS (SELECT wk, CAST(count(*) AS BIGINT) AS wau
                    FROM aw GROUP BY wk),
            d0 AS (SELECT min(day) AS d0 FROM a)
            SELECT day - d0 AS day_idx, dau, wau,
              CAST(dau * 10000 // wau AS BIGINT) AS stickiness_bp
            FROM dau JOIN wau ON wau.wk = dau.day // 7
            CROSS JOIN d0 ORDER BY day_idx"""),
    (spark, dir) => {
      import spark.implicits._
      val a = t(spark, dir, "events")
        .select($"user_id", expr("unix_millis(ts) DIV 86400000").as("day"))
        .distinct()
      val dau = a.groupBy($"day").agg(count(lit(1)).as("dau"))
      val wau = a.select($"user_id", expr("day DIV 7").as("wk"))
        .distinct()
        .groupBy($"wk").agg(count(lit(1)).as("wau"))
      val d0 = a.agg(min($"day").as("d0"))
      dau.join(broadcast(wau), expr("day DIV 7") === $"wk")
        .crossJoin(broadcast(d0))
        .select(($"day" - $"d0").as("day_idx"), $"dau", $"wau",
          expr("dau * 10000 DIV wau").as("stickiness_bp"))
        .orderBy($"day_idx")
    })

  /** Holt's linear-trend forecast (double exponential smoothing,
    * α = β = 1/2) of per-type daily counts — the forecasting family's
    * TREND member next to x_forecast_ses (SES assumes a level; Holt
    * carries a slope, the read that distinguishes "volume is settling"
    * from "volume is climbing"). Unlike SES's dyadic-float fold, the
    * two-equation recursion is NOT float-exact (each step compounds
    * the denominators ~2 bits — 30 days ≫ the 52-bit mantissa), so
    * the state is QUANTIZED INTEGER bp from the start: l ←
    * (x·10⁴ + l + b) DIV 2, b ← ((l' − l) + b) DIV 2, both trunc
    * divisions — DELIBERATE trunc on the possibly-negative trend
    * operand, the SCALING §determinism rule both engines share — and
    * the one-step-ahead backtest error accumulates |x·10⁴ − (l + b)|
    * in the same exact integers. Seeds l = x₁·10⁴, b = 0 (the
    * zero-trend seed; the x₂−x₁ alternative injects first-step noise
    * on bursty series — documented choice, not an accident). Both
    * engines replay the identical fold: Spark as a sequential
    * `aggregate` over the day-ordered list (named_struct fields all
    * read the PRE-step acc — safe where DuckDB's struct_pack is not),
    * DuckDB as list_reduce over a flat [l, b, e] BIGINT list with the
    * seed branch on len(acc) = 1 (the first reduce step sees the bare
    * seed element). forecast_next_bp = l + b; mae_bp = e DIV (n−1)
    * (n ≥ 2 guarded: singleton series emit 0 — both engines).
    * (Holt 1957/2004.)
    *
    * Overflow: counts ≤ 10⁷/day at sf0.1 → l, b ≤ ~10¹¹ bp; e ≤
    * span·10¹¹ ≪ 2^63.
    *
    * Scale shape: the x_forecast_ses shape exactly — one
    * calendar-bounded (type, day) aggregate, then a per-type fold
    * over ≤ span-days arrays (a types-cardinality task, never a
    * corpus window). */
  private val forecastHolt = Q(
    "x_forecast_holt",
    Some("""WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            s AS (SELECT event_type, list(n ORDER BY day) AS xs
                  FROM d GROUP BY 1),
            f AS (SELECT event_type, len(xs) AS n_days,
                    list_reduce(list_transform(xs, x -> [x]),
                      (acc, x) -> CASE WHEN len(acc) = 1
                        THEN [(x[1] * 10000 + acc[1] * 10000 + 0) // 2,
                              ((x[1] * 10000 + acc[1] * 10000 + 0) // 2
                                - acc[1] * 10000 + 0) // 2,
                              abs(x[1] * 10000 - acc[1] * 10000 - 0)]
                        ELSE [(x[1] * 10000 + acc[1] + acc[2]) // 2,
                              ((x[1] * 10000 + acc[1] + acc[2]) // 2
                                - acc[1] + acc[2]) // 2,
                              acc[3] + abs(x[1] * 10000 - acc[1] - acc[2])]
                        END) AS st
                  FROM s)
            SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
              CAST(CASE WHEN n_days = 1 THEN 10000 * st[1] ELSE st[1] END
                AS BIGINT) AS level_bp,
              CAST(CASE WHEN n_days = 1 THEN 0 ELSE st[2] END
                AS BIGINT) AS trend_bp,
              CAST(CASE WHEN n_days = 1 THEN 10000 * st[1]
                   ELSE st[1] + st[2] END AS BIGINT) AS forecast_next_bp,
              CAST(CASE WHEN n_days >= 2 THEN st[3] // (n_days - 1)
                   ELSE 0 END AS BIGINT) AS mae_bp
            FROM f ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .groupBy($"event_type", expr("unix_millis(ts) DIV 86400000").as("day"))
        .agg(count(lit(1)).as("n"))
      d.groupBy($"event_type")
        .agg(expr(
          "transform(sort_array(collect_list(struct(day, n))), p -> p.n)")
          .as("xs"))
        .select($"event_type", size($"xs").cast("long").as("n_days"),
          expr(ForecastArith.holtFoldSql)
            .as("st"))
        .select($"event_type", $"n_days",
          $"st.l".as("level_bp"), $"st.b".as("trend_bp"),
          ($"st.l" + $"st.b").as("forecast_next_bp"),
          when($"n_days" >= 2, expr("st.e DIV (n_days - 1)"))
            .otherwise(0L).as("mae_bp"))
        .orderBy($"event_type")
    })

  /** Damped-trend Holt forecast (Gardner–McKenzie 1985; Gardner 2006's
    * meta-review crowns it the best single forecasting benchmark) —
    * the forecasting family's PRODUCTION-DEFAULT member between Holt
    * and Holt–Winters: a raw linear trend extrapolated h steps ahead
    * diverges (x_forecast_holt's known failure mode on settling
    * series); damping multiplies the trend by φ per step so the
    * forecast approaches a finite asymptote. φ = 3/4 — chosen INSIDE
    * the integer discipline: φ·b = (b·3) DIV 4 is one exact trunc
    * division (DELIBERATE trunc on the possibly-negative trend, the
    * SCALING signed-division rule both engines share), no new scale
    * factor, and 3/4 sits in the production 0.7–0.98 band. The fold
    * (α = β = 1/2):
    *   l' = (x·10⁴ + l + (b·3) DIV 4) DIV 2
    *   b' = (l' − l + (b·3) DIV 4) DIV 2
    *   e += |x·10⁴ − l − (b·3) DIV 4|
    * — the Holt fold with every read of b damped first. Seeds
    * l = x₁·10⁴, b = 0 (the Holt zero-trend seed). Derived columns,
    * both exact closed forms of the geometric sum Σφᵏ on the emitted
    * state: forecast_week_bp = l + (b·42591) DIV 16384 (h = 7:
    * Σ_{k=1..7}(3/4)ᵏ = 3·(1 − 2187/16384) = 42591/16384, one exact
    * trunc division — b·42591 ≤ 4·10¹⁵ at b ≤ 10¹¹, in envelope) and
    * forecast_inf_bp = l + 3·b (Σ_{k≥1}(3/4)ᵏ = 3 — the model's
    * finite asymptote, THE column that distinguishes damped from raw
    * Holt, whose "asymptote" is ±∞ whenever b ≠ 0).
    *
    * Overflow: the x_forecast_holt envelope (counts ≤ 10⁷/day → state
    * ≤ ~10¹¹ bp) plus the ×42591 week column ≪ 2^63.
    *
    * Scale shape: x_forecast_holt verbatim — one calendar-bounded
    * (type, day) aggregate, then a per-type 3-long sequential fold. */
  private val forecastHoltDamped = Q(
    "x_forecast_holt_damped",
    Some("""WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            s AS (SELECT event_type, list(n ORDER BY day) AS xs
                  FROM d GROUP BY 1),
            f AS (SELECT event_type, len(xs) AS n_days,
                    list_reduce(list_transform(xs, x -> [x]),
                      (acc, x) -> CASE WHEN len(acc) = 1
                        THEN [(x[1] * 10000 + acc[1] * 10000 + 0) // 2,
                              ((x[1] * 10000 + acc[1] * 10000 + 0) // 2
                                - acc[1] * 10000 + 0) // 2,
                              abs(x[1] * 10000 - acc[1] * 10000 - 0)]
                        ELSE [(x[1] * 10000 + acc[1]
                                + (acc[2] * 3) // 4) // 2,
                              ((x[1] * 10000 + acc[1]
                                + (acc[2] * 3) // 4) // 2
                                - acc[1] + (acc[2] * 3) // 4) // 2,
                              acc[3] + abs(x[1] * 10000 - acc[1]
                                - (acc[2] * 3) // 4)]
                        END) AS st
                  FROM s)
            SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
              CAST(CASE WHEN n_days = 1 THEN 10000 * st[1] ELSE st[1] END
                AS BIGINT) AS level_bp,
              CAST(CASE WHEN n_days = 1 THEN 0 ELSE st[2] END
                AS BIGINT) AS trend_bp,
              CAST(CASE WHEN n_days = 1 THEN 10000 * st[1]
                   ELSE st[1] + (st[2] * 3) // 4 END
                AS BIGINT) AS forecast_next_bp,
              CAST(CASE WHEN n_days = 1 THEN 10000 * st[1]
                   ELSE st[1] + (st[2] * 42591) // 16384 END
                AS BIGINT) AS forecast_week_bp,
              CAST(CASE WHEN n_days = 1 THEN 10000 * st[1]
                   ELSE st[1] + 3 * st[2] END
                AS BIGINT) AS forecast_inf_bp,
              CAST(CASE WHEN n_days >= 2 THEN st[3] // (n_days - 1)
                   ELSE 0 END AS BIGINT) AS mae_bp
            FROM f ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .groupBy($"event_type", expr("unix_millis(ts) DIV 86400000").as("day"))
        .agg(count(lit(1)).as("n"))
      d.groupBy($"event_type")
        .agg(expr(
          "transform(sort_array(collect_list(struct(day, n))), p -> p.n)")
          .as("xs"))
        .select($"event_type", size($"xs").cast("long").as("n_days"),
          expr(ForecastArith.dampedFoldSql)
            .as("st"))
        .select($"event_type", $"n_days",
          $"st.l".as("level_bp"), $"st.b".as("trend_bp"),
          expr("st.l + (st.b * 3) DIV 4").as("forecast_next_bp"),
          expr("st.l + (st.b * 42591) DIV 16384").as("forecast_week_bp"),
          ($"st.l" + lit(3L) * $"st.b").as("forecast_inf_bp"),
          when($"n_days" >= 2, expr("st.e DIV (n_days - 1)"))
            .otherwise(0L).as("mae_bp"))
        .orderBy($"event_type")
    })

  /** Kaplan–Meier churn hazard table — the survival-analysis read a
    * retention team runs next to x_retention's cohort grid: per user,
    * lifetime t = last active day − first active day; a user counts as
    * CHURNED (the KM "event") when their last activity precedes the
    * corpus end by 2+ days, otherwise CENSORED (still alive at
    * observation end — the right-censoring KM exists to handle). The
    * 2-day threshold is CORPUS-CALIBRATED (the x_embed_neardup 0.45
    * rule): this synthetic corpus is a dense ~30-day window where max
    * observed absence is 2 days (measured at both gate SFs), so a
    * production-style 7-day rule would churn nobody and emit an
    * all-zero hazard column; at 2 days both branches carry rows. Per
    * distinct lifetime: the at-risk count n_risk(t) = #users with
    * lifetime ≥ t (a reverse cumulative sum over the per-t rollup),
    * churn and censor counts, and the discrete hazard d(t)·10000 DIV
    * n_risk(t). Emits the KM estimator's SUFFICIENT STATISTICS in
    * exact integers — the survival curve itself is ∏(1−h) downstream,
    * deliberately NOT emitted: a cross-engine float product chain is
    * the one piece two engines won't reproduce bit-for-bit, while
    * every input to it here is hash-matched. (Kaplan & Meier 1958.)
    *
    * Scale shape: one per-user min/max aggregate (map-side combined),
    * a per-t rollup bounded by the calendar span, and ONE
    * single-partition window over those ≤ span-days rows (tiny by
    * construction — the arithTokenIds vocab-window rule). */
  /** Shared oracle CTE prefix of the survival family (x_hazard_km /
    * x_hazard_km_7d / x_hazard_na): per-user lifetimes under the
    * gap-day churn rule, the per-lifetime rollup, and the at-risk
    * reverse cumulative sum — through the `km` relation every member's
    * SELECT reads. */
  private def kmSqlCtes(gapDays: Int): String =
    s"""d AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day
                       FROM events),
            u AS (SELECT user_id, min(day) AS fd, max(day) AS ld
                  FROM d GROUP BY user_id),
            ee AS (SELECT max(ld) AS e FROM u),
            lt AS (SELECT user_id, ld - fd AS t,
                     CASE WHEN ld <= e - $gapDays THEN 1 ELSE 0 END AS churned
                   FROM u CROSS JOIN ee),
            at AS (SELECT t, CAST(count(*) AS BIGINT) AS n_at,
                     CAST(sum(churned) AS BIGINT) AS n_churn,
                     CAST(sum(1 - churned) AS BIGINT) AS n_censored
                   FROM lt GROUP BY t),
            km AS (SELECT t, n_churn, n_censored,
                     CAST(sum(n_at) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS n_risk
                   FROM at)"""

  /** The Spark side of the same build: (t, n_risk, n_churn,
    * n_censored) per distinct lifetime — the at-risk table both KM
    * variants and the Nelson–Aalen read finish from. */
  private def kmAtRiskFrame(spark: SparkSession, dir: String,
      gapDays: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val days = t(spark, dir, "events")
      .select($"user_id", expr("unix_millis(ts) DIV 86400000").as("day"))
    val u = days.groupBy($"user_id")
      .agg(min($"day").as("fd"), max($"day").as("ld"))
    // corpus end from the per-user rollup (max of lds ≡ max of days)
    // — one events scan, not two
    val e = u.agg(max($"ld").as("e"))
    val lt = u.crossJoin(broadcast(e))
      .select(($"ld" - $"fd").as("t"),
        when($"ld" <= $"e" - gapDays, 1L).otherwise(0L).as("churned"))
    val at = lt.groupBy($"t")
      .agg(count(lit(1)).as("n_at"), sum($"churned").as("n_churn"),
        sum(lit(1L) - $"churned").as("n_censored"))
    at.withColumn("n_risk", sum($"n_at").over(
      Window.orderBy($"t".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def hazardKmAt(name: String, gapDays: Int): Q = Q(
    name,
    Some(s"""WITH ${kmSqlCtes(gapDays)}
            SELECT CAST(t AS BIGINT) AS t_days, n_risk, n_churn, n_censored,
              CAST(n_churn * 10000 // n_risk AS BIGINT) AS hazard_bp
            FROM km ORDER BY t_days"""),
    (spark, dir) => {
      import spark.implicits._
      kmAtRiskFrame(spark, dir, gapDays)
        .select($"t".as("t_days"), $"n_risk", $"n_churn", $"n_censored",
          expr("n_churn * 10000 DIV n_risk").as("hazard_bp"))
        .orderBy($"t_days")
    })

  private val hazardKm = hazardKmAt("x_hazard_km", 2)

  /** The PRODUCTION-THRESHOLD KM variant (VERDICT r14 #4): the same
    * estimator under the industry-standard 7-day inactivity churn
    * rule. On THIS corpus it is near-degenerate BY THE DATA — the
    * dense ~30-day synthetic window has max observed absence 2 days
    * (the x_hazard_km calibration note above), so the churn branch is
    * all-zero here — and that is the POINT: the r14 sensitivity pin
    * proved the degeneracy is loud (QueriesSpec pins the all-zero
    * branch at both gate SFs against the 2-day variant's live one),
    * so the production spelling ships as a declared, oracle-backed
    * read instead of a constant a user must re-derive. On a real
    * corpus with week-scale absences both branches carry rows with no
    * code change. */
  private val hazardKm7d = hazardKmAt("x_hazard_km_7d", 7)

  /** Nelson–Aalen cumulative hazard — the survival family's second
    * estimator next to x_hazard_km's per-lifetime hazard table:
    * Ĥ(t) = Σ_{s ≤ t} d(s)/n_risk(s), the cumulative-hazard curve a
    * retention team reads when hazards are small and additive
    * (−ln S(t) ≈ Ĥ(t) — the additive dual of KM's ∏(1−h) product,
    * which is exactly why it CAN ship hash-matched while the survival
    * product itself deliberately does not: a cross-engine float
    * product chain is the one piece two engines won't reproduce, but
    * a prefix SUM of already-quantized integers is exact). Same
    * lifetime/churn construction and 2-day corpus-calibrated rule as
    * x_hazard_km (the calibration note there); each per-lifetime
    * hazard term floors to bp EXACTLY ONCE (d·10⁴ DIV n_risk, the
    * same trunc division both engines already hash-match in KM), and
    * na_bp is then an exact BIGINT prefix sum of those floored terms.
    * Quantize-then-sum is the DECLARED semantics: each term's floor
    * error is < 1 bp, so the curve sits within #levels bp below the
    * rational Ĥ·10⁴ — the bound is part of the contract, not an
    * accident. Zero-churn lifetimes contribute exactly 0 and stay in
    * the output (the at-risk table is shared with KM; dropping them
    * would desynchronize the two reads' t_days axes).
    * (Nelson 1972, Aalen 1978.)
    *
    * Scale shape: identical to x_hazard_km — one per-user min/max
    * aggregate (map-side combined), a calendar-bounded per-t rollup,
    * and single-partition windows over ≤ span-days rows (tiny by
    * construction — the arithTokenIds vocab-window rule); the
    * cumulative sum is a second frame over those same rows. */
  private val hazardNa = Q(
    "x_hazard_na",
    Some(s"""WITH ${kmSqlCtes(2)},
            h AS (SELECT CAST(t AS BIGINT) AS t_days, n_risk, n_churn,
                    CAST(n_churn * 10000 // n_risk AS BIGINT) AS hazard_bp
                  FROM km)
            SELECT t_days, n_risk, n_churn, hazard_bp,
              CAST(sum(hazard_bp) OVER (ORDER BY t_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS na_bp
            FROM h ORDER BY t_days"""),
    (spark, dir) => {
      import spark.implicits._
      kmAtRiskFrame(spark, dir, 2)
        .select($"t".as("t_days"), $"n_risk", $"n_churn",
          expr("n_churn * 10000 DIV n_risk").as("hazard_bp"))
        .withColumn("na_bp", sum($"hazard_bp").over(
          Window.orderBy($"t_days")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy($"t_days")
    })

  /** Trained steady-state weights of the quantized event-type Markov
    * chain, once per (JVM, generation): the transition matrix in basis
    * points (x_event_transitions' own p_bp quantization — n·10⁴ DIV
    * row total), then 5 fixed rounds of w ← wᵀP_bp with the
    * scale-invariant integer renormalization (w·10⁴) trunc-div max(w)
    * (the x_pca_oracle trick — power iteration only needs a DIRECTION,
    * so the float row-normalization is replaced by exact integers).
    * Type space = ALL distinct event types, sorted; bounded by
    * declaration (the vocab-window rule) and GUARDED at ≤ 256 — the
    * oracle's position-unnest cap; beyond it the Spark side fails
    * loudly where the oracle would silently truncate (the k-core
    * cap-coupling rule, documented there). Driver traffic: ≤ K² + K
    * bounded values once per generation. Envelope: w ≤ 10⁴, p ≤ 10⁴ →
    * wᵀP entries ≤ K·10⁸ ≤ 2.6·10¹⁰ — inside Long trivially, inside
    * BIGINT in the oracle; all values nonnegative, so trunc ≡ floor
    * everywhere and the signed-division trap has no surface. */
  private[graft] def markovState(spark: SparkSession, dir: String)
      : (Seq[String], Array[Long]) =
    QueryModule.cachedLocal(s"markov:$dir", tableStamp(dir, "events")) {
      import spark.implicits._
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val c = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("prev_type", lag($"event_type", 1).over(wU))
        .where($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum($"n").over(Window.partitionBy($"prev_type")))
        .select($"prev_type", $"next_type",
          expr("(n * 10000) DIV tot").as("p_bp"))
        .collect()
      val types = t(spark, dir, "events").select($"event_type").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      require(types.length <= 256,
        s"markovState: ${types.length} event types exceed the declared " +
          "bounded type space (oracle position cap 256) — widen both or sample")
      val idx = types.zipWithIndex.toMap
      val k = types.length
      val m = Array.ofDim[Long](k, k)
      c.foreach(r =>
        m(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
      var w = Array.fill(k)(1L)
      for (_ <- 1 to 5) {
        val wp = Array.tabulate(k)(j =>
          (0 until k).map(i => w(i) * m(i)(j)).sum)
        val s = wp.map(math.abs).max
        if (s != 0L) w = wp.map(x => x * 10000L / s)
      }
      (types, w)
    }

  /** ORACLE-BACKED Markov steady state — the long-run event-mix read
    * that sits one step past x_event_transitions: where that query
    * emits the per-edge transition probabilities, this one answers
    * "where does a user session SPEND its time in the limit" — the
    * dominant left eigenvector of the quantized transition matrix by
    * power iteration, the same analytics read PageRank serves on
    * graphs, here on the behavioral chain. The algebra both engines
    * replay exactly: P in basis points (n·10⁴ DIV row total —
    * LITERALLY x_event_transitions' p_bp column, so the chain being
    * iterated is itself an already-declared artifact), w⁰ = 1ᴷ, five
    * synchronous w ← wᵀP steps with the (w·10⁴) trunc-div max integer
    * renormalization (x_pca_oracle's scale-invariance argument — the
    * steady state is a direction), every value a nonnegative exact
    * integer. Output per type: LIVE-recomputed outgoing/incoming
    * transition mass (the corpus side, not stored state) next to the
    * trained steady weight and its share steady_bp = w·10⁴ DIV Σw.
    * Types missing from the chain (never adjacent to anything) carry
    * n_out = n_in = 0 through the LEFT join in both engines. The
    * DuckDB twin replays the whole loop in a recursive-CTE LIST-state
    * row (nested lambda matrix build from the edge list — the
    * x_graph_lpa closure technique).
    *
    * Scale shape: ONE user-keyed lag window + a K²-bounded rollup
    * (training, per generation); the declared query re-runs that
    * window (live evidence) plus two ≤K-row rollups and a broadcast
    * join of the ≤K-row steady constants. K is type cardinality —
    * bounded by declaration, guarded at 256. */
  private val markovSteady = Q(
    "x_markov_steady",
    Some("""WITH RECURSIVE
            e AS (SELECT user_id, event_id, event_type,
                    epoch_us(ts) AS ts_us FROM events),
            p AS (SELECT lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type,
                    event_type AS next_type
                  FROM e),
            c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            tt AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
                   FROM c GROUP BY 1),
            pb AS (SELECT c.prev_type AS a, c.next_type AS b,
                     CAST((c.n * 10000) // tt.tot AS BIGINT) AS v
                   FROM c JOIN tt USING (prev_type)),
            ty AS (SELECT list(t ORDER BY t) AS ts
                   FROM (SELECT DISTINCT event_type AS t FROM events)),
            el AS (SELECT coalesce(list(struct_pack(a := a, b := b, v := v)),
                     []) AS es FROM pb),
            pm AS (SELECT ts, list_transform(ts, x -> list_transform(ts, y ->
                     coalesce(list_min(list_transform(
                       list_filter(es, q -> q.a = x AND q.b = y),
                       q -> q.v)), 0))) AS m
                   FROM ty CROSS JOIN el),
            it AS (
              SELECT 0 AS step, list_transform(ts, t -> CAST(1 AS BIGINT)) AS w
              FROM ty
              UNION ALL
              SELECT step + 1,
                CASE WHEN s = 0 THEN w ELSE
                  list_transform(wp, x -> CAST((x * 10000) // s AS BIGINT))
                END AS w
              FROM (SELECT step, w, wp,
                      list_max(list_transform(wp, x -> abs(x))) AS s
                    FROM (SELECT step, w,
                            list_transform(range(1, len(w) + 1), j -> CAST(
                              list_sum(list_transform(range(1, len(w) + 1),
                                i -> w[i] * m[i][j])) AS BIGINT)) AS wp
                          FROM it CROSS JOIN pm))
              WHERE step < 5),
            fin AS (SELECT w FROM it ORDER BY step DESC LIMIT 1),
            sw AS (SELECT ts, w, CAST(list_sum(w) AS BIGINT) AS wt
                   FROM fin CROSS JOIN ty),
            outs AS (SELECT prev_type AS t, CAST(sum(n) AS BIGINT) AS n_out
                     FROM c GROUP BY 1),
            ins AS (SELECT next_type AS t, CAST(sum(n) AS BIGINT) AS n_in
                    FROM c GROUP BY 1),
            base AS (SELECT ts[k] AS event_type, CAST(w[k] AS BIGINT) AS steady_w,
                       CAST((w[k] * 10000) // wt AS BIGINT) AS steady_bp
                     FROM sw CROSS JOIN (SELECT unnest(range(1, 257)) AS k)
                     WHERE k <= len(ts))
            SELECT b.event_type, coalesce(o.n_out, 0) AS n_out,
              coalesce(i.n_in, 0) AS n_in, b.steady_w, b.steady_bp
            FROM base b
            LEFT JOIN outs o ON o.t = b.event_type
            LEFT JOIN ins i ON i.t = b.event_type
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val (types, w) = markovState(spark, dir)
      val wt = w.sum
      val steady = broadcast(types.zip(w).map { case (ty, wi) =>
        (ty, wi, wi * 10000L / wt) }.toDF("event_type", "steady_w", "steady_bp"))
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      // ONE live pass: each transition contributes an (out, prev) and an
      // (in, next) occurrence, folded by one map-side-combined aggregate
      // — the two-rollup spelling (the oracle's outs/ins CTEs) would
      // re-run the user-keyed lag window per branch (no exchange reuse
      // across differently-keyed rollups); values identical by Σ over
      // the same transitions.
      val mass = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("prev_type", lag($"event_type", 1).over(wU))
        .where($"prev_type".isNotNull)
        .select(explode(expr(
          """array(named_struct('side', 'out', 't', prev_type),
                   named_struct('side', 'in',  't', event_type))""")).as("e"))
        .groupBy($"e.t".as("event_type"))
        .agg(sum(when($"e.side" === "out", 1L).otherwise(0L)).as("n_out"),
          sum(when($"e.side" === "in", 1L).otherwise(0L)).as("n_in"))
      steady.join(mass, Seq("event_type"), "left")
        .na.fill(0L, Seq("n_out", "n_in"))
        .select($"event_type", $"n_out", $"n_in", $"steady_w", $"steady_bp")
        .orderBy($"event_type")
    })

  /** Trained absorbing-chain state, once per (JVM, generation):
    * x_markov_steady's sibling over the SUBSTOCHASTIC chain — every
    * user stream ends, so each occurrence of a type either transitions
    * to a next type or is ABSORBED (the stream's last event = the
    * synthetic END state a churn analysis conditions on). Q_bp(i,j) =
    * n(i→j)·10⁴ DIV tot(i) with tot(i) = n_out(i) + n_end(i) — the
    * OCCURRENCE total, so rows are substochastic exactly where end
    * mass exists. Expected steps to absorption t = (I−Q)⁻¹·1 is
    * replayed as a FIXED-8-round integer Neumann/fixed-point series
    * s ← 10⁴ + (Q_bp·s) DIV 10⁴ from s⁰ = 10⁴·1 (the x_pca_oracle
    * fixed-budget rule — a fixed round count is what makes the loop
    * recursive-CTE replayable).
    *
    * ENVELOPE WORKSHEET (written before the SQL — the pca2
    * discipline): q_bp ∈ [0, 10⁴] exact; row sums Σ_j q_bp(i,j) ≤ 10⁴
    * ALWAYS (trunc-div only lowers them — quantization leaks mass
    * INTO absorption, a deterministic bias both engines share), and
    * < 10⁴ wherever n_end > 0. Induction: s_m ≤ (m+1)·10⁴, since
    * s_{m+1} = 10⁴ + (Σ_j q·s_j) DIV 10⁴ ≤ 10⁴ + max_j s_j. The
    * matvec intermediate obeys the ROW-STOCHASTIC bound Σ_j q·s_j ≤
    * 10⁴·max s ≤ 9·10⁸ at N = 8 — K never enters, so the envelope is
    * corpus-independent and ≪ 2^53 with 2^24 headroom. Every value
    * nonnegative → trunc ≡ floor, no signed-division surface. s_8 is
    * a monotone LOWER bound of 10⁴·E[steps] (truncated series +
    * per-step floor both round down). tot(i) ≥ 1 for every observed
    * type by construction (each occurrence is followed or last), so
    * the division is total.
    *
    * Type space derives from the one collected rollup (every
    * occurrence contributes a row, so every observed type appears as
    * a rollup key); guarded ≤ 256 = the oracle's position-unnest cap
    * (the k-core cap-coupling rule). Driver traffic: ≤ K² + K bounded
    * values once per generation. The doc above describes BOTH chain
    * consumers' shared algebra; the collect lives in
    * [[markovAbsorbChain]], the s-iteration in [[markovAbsorbState]].
    */
  /** The quantized substochastic chain itself — (types, Q_bp, r_bp)
    * where r_bp(i) = n_end(i)·10⁴ DIV tot(i) is the per-occurrence
    * absorption mass — collected once per (JVM, generation) and shared
    * by [[markovAbsorbState]] (expected steps) and the multi-absorber
    * read x_markov_absorb_to (which type a stream ends in). The
    * downstream iterations are microseconds of driver math, so only
    * this collect is cached. */
  private[graft] def markovAbsorbChain(spark: SparkSession, dir: String)
      : (Seq[String], Array[Array[Long]], Array[Long]) =
    QueryModule.cachedLocal(s"markovchain:$dir", tableStamp(dir, "events")) {
      import spark.implicits._
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val c = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("nxt", lead($"event_type", 1).over(wU))
        .groupBy($"event_type", $"nxt")
        .agg(count(lit(1)).as("n"))
        .collect()
      val types = c.map(_.getString(0)).distinct.sorted.toSeq
      require(types.length <= 256,
        s"markovAbsorbChain: ${types.length} event types exceed the declared " +
          "bounded type space (oracle position cap 256) — widen both or sample")
      val idx = types.zipWithIndex.toMap
      val k = types.length
      val m = Array.ofDim[Long](k, k)
      val tot = Array.ofDim[Long](k)
      val end = Array.ofDim[Long](k)
      c.foreach { r =>
        val i = idx(r.getString(0))
        tot(i) += r.getLong(2)
        if (!r.isNullAt(1)) m(i)(idx(r.getString(1))) = r.getLong(2)
        else end(i) += r.getLong(2)
      }
      val q = Array.tabulate(k, k)((i, j) => m(i)(j) * 10000L / tot(i))
      val rb = Array.tabulate(k)(i => end(i) * 10000L / tot(i))
      (types, q, rb)
    }

  private[graft] def markovAbsorbState(spark: SparkSession, dir: String)
      : (Seq[String], Array[Long], Array[Long]) = {
    val (types, q, _) = markovAbsorbChain(spark, dir)
    val k = types.length
    var s = Array.fill(k)(10000L)
    for (_ <- 1 to 8)
      s = Array.tabulate(k)(i =>
        10000L + (0 until k).map(j => q(i)(j) * s(j)).sum / 10000L)
    (types, q.map(_.sum), s)
  }

  /** ORACLE-BACKED absorbing-state Markov read — x_markov_steady's
    * sibling (VERDICT r14 #2): "how many more events does a user
    * stream produce, starting from each event type, before it ENDS" —
    * expected steps to absorption in the substochastic behavioral
    * chain, the (I−Q)⁻¹·1 family replayed as a fixed-8-round integer
    * Neumann series (envelope worksheet in [[markovAbsorbState]],
    * written FIRST as gated by the r14 verdict). Absorption = the
    * stream's observed end — the churn event a lifecycle analysis
    * conditions on — so the chain needs no calibrated threshold at
    * all (the x_hazard_km 2-day constant has no analogue here; END
    * mass is structural). Output per type: LIVE-recomputed n_out /
    * n_end (occurrences with a successor vs stream-final occurrences
    * — the corpus evidence, one lead window), the trained retention
    * row mass q_row_bp = Σ_j Q_bp(i,j) (10⁴ − it ≈ the per-occurrence
    * absorption hazard in bp), and absorb_steps_bp = s_8 — a monotone
    * lower bound of 10⁴·E[steps to END], exact integers both engines
    * replay bit-for-bit through the recursive-CTE LIST-state row.
    *
    * Scale shape: training = one user-keyed lead window + a ≤K²-row
    * rollup, once per generation; the declared query re-runs the lead
    * window once (live evidence — one scan, one window, one exchange)
    * plus a ≤K-row broadcast join of the trained constants. K is type
    * cardinality — bounded by declaration, guarded at 256. */
  private val markovAbsorb = Q(
    "x_markov_absorb",
    Some("""WITH RECURSIVE
            e AS (SELECT user_id, event_id, event_type,
                    epoch_us(ts) AS ts_us FROM events),
            p AS (SELECT event_type AS cur, lead(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) AS nxt
                  FROM e),
            c AS (SELECT cur AS a, nxt AS b, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE nxt IS NOT NULL GROUP BY 1, 2),
            en AS (SELECT cur AS t, CAST(count(*) AS BIGINT) AS n_end
                   FROM p WHERE nxt IS NULL GROUP BY 1),
            outs AS (SELECT a AS t, CAST(sum(n) AS BIGINT) AS n_out
                     FROM c GROUP BY 1),
            ty AS (SELECT list(t ORDER BY t) AS ts
                   FROM (SELECT DISTINCT event_type AS t FROM events)),
            tt AS (SELECT u.t,
                     coalesce(o.n_out, 0) + coalesce(e2.n_end, 0) AS tot
                   FROM (SELECT DISTINCT event_type AS t FROM events) u
                   LEFT JOIN outs o ON o.t = u.t
                   LEFT JOIN en e2 ON e2.t = u.t),
            qb AS (SELECT c.a, c.b,
                     CAST((c.n * 10000) // tt.tot AS BIGINT) AS v
                   FROM c JOIN tt ON tt.t = c.a),
            el AS (SELECT coalesce(list(struct_pack(a := a, b := b, v := v)),
                     []) AS es FROM qb),
            qm AS (SELECT ts, list_transform(ts, x -> list_transform(ts, y ->
                     coalesce(list_min(list_transform(
                       list_filter(es, q -> q.a = x AND q.b = y),
                       q -> q.v)), 0))) AS m
                   FROM ty CROSS JOIN el),
            it AS (
              SELECT 0 AS step,
                list_transform(ts, t -> CAST(10000 AS BIGINT)) AS s
              FROM ty
              UNION ALL
              SELECT step + 1,
                list_transform(range(1, len(s) + 1), i -> CAST(
                  10000 + list_sum(list_transform(range(1, len(s) + 1),
                    j -> m[i][j] * s[j])) // 10000 AS BIGINT)) AS s
              FROM it CROSS JOIN qm WHERE step < 8),
            fin AS (SELECT s FROM it ORDER BY step DESC LIMIT 1),
            base AS (SELECT ts[k] AS event_type,
                       CAST(list_sum(m[k]) AS BIGINT) AS q_row_bp,
                       CAST(s[k] AS BIGINT) AS absorb_steps_bp
                     FROM fin CROSS JOIN qm
                     CROSS JOIN (SELECT unnest(range(1, 257)) AS k)
                     WHERE k <= len(ts))
            SELECT b.event_type, coalesce(o.n_out, 0) AS n_out,
              coalesce(e2.n_end, 0) AS n_end, b.q_row_bp, b.absorb_steps_bp
            FROM base b
            LEFT JOIN outs o ON o.t = b.event_type
            LEFT JOIN en e2 ON e2.t = b.event_type
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val (types, qRow, s) = markovAbsorbState(spark, dir)
      val trained = broadcast(types.indices.map(i =>
        (types(i), qRow(i), s(i)))
        .toDF("event_type", "q_row_bp", "absorb_steps_bp"))
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val live = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("nxt", lead($"event_type", 1).over(wU))
        .groupBy($"event_type")
        .agg(sum(when($"nxt".isNotNull, 1L).otherwise(0L)).as("n_out"),
          sum(when($"nxt".isNull, 1L).otherwise(0L)).as("n_end"))
      trained.join(live, Seq("event_type"), "left")
        .na.fill(0L, Seq("n_out", "n_end"))
        .select($"event_type", $"n_out", $"n_end",
          $"q_row_bp", $"absorb_steps_bp")
        .orderBy($"event_type")
    })

  /** ORACLE-BACKED multi-absorber read — x_markov_absorb's sibling
    * question: not "how many more events before the stream ends" but
    * "WHICH type does it end in", per starting type. Each type t with
    * quantized end mass r_bp(t) > 0 is its own absorbing state END_t;
    * the absorption-probability matrix B = (I−Q)⁻¹·R (R = diag(r_bp))
    * is replayed as the same FIXED-8-round integer series, now over a
    * K×K state: S ← R + (Q_bp·S) DIV 10⁴ from S⁰ = R.
    *
    * ENVELOPE WORKSHEET (fresh, before the SQL): sum-of-floors ≤
    * floor-of-sum gives r_bp(i) + Σ_j q_bp(i,j) ≤ 10⁴ exactly, so by
    * induction every S entry stays ≤ 10⁴ (S(i,t) ≤ δ_{it}·r_i +
    * (Σ_j q(i,j)·10⁴) DIV 10⁴ ≤ r_i + Σ_j q(i,j)); the matvec
    * intermediate is ≤ 10⁴·10⁴ = 10⁸ ≪ 2^53 — K never enters, same as
    * the steps read. All values nonnegative → trunc ≡ floor. S₈ is a
    * monotone LOWER bound of B·10⁴; covered_bp = Σ_t S₈(i,t) ≤ 10⁴
    * exposes the residual (mass still in transit after 8 steps plus
    * the deterministic quantization leak) so the truncation is a
    * VISIBLE column, not a hidden bias.
    *
    * Declared algebra note: a type whose end mass quantizes to ZERO
    * (n_end·10⁴ < tot) is NOT an absorber of the quantized chain —
    * its S column is identically zero and is filtered in BOTH engines
    * (r_bp > 0), the same 10⁴-granularity rule every bp read here
    * lives under. Output per (start, end) pair: the trained absorb_bp
    * and covered_bp next to the LIVE end-type absorption count (the
    * corpus evidence, one lead-window pass).
    *
    * Scale shape: the chain collect is shared ([[markovAbsorbChain]],
    * cached); the K×K×K driver iteration is ≤ 8·256³ bounded ops; the
    * declared query is the live lead-window pass plus a ≤K²-row
    * broadcast. */
  private val markovAbsorbTo = Q(
    "x_markov_absorb_to",
    Some("""WITH RECURSIVE
            e AS (SELECT user_id, event_id, event_type,
                    epoch_us(ts) AS ts_us FROM events),
            p AS (SELECT event_type AS cur, lead(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) AS nxt
                  FROM e),
            c AS (SELECT cur AS a, nxt AS b, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE nxt IS NOT NULL GROUP BY 1, 2),
            en AS (SELECT cur AS t, CAST(count(*) AS BIGINT) AS n_end
                   FROM p WHERE nxt IS NULL GROUP BY 1),
            outs AS (SELECT a AS t, CAST(sum(n) AS BIGINT) AS n_out
                     FROM c GROUP BY 1),
            ty AS (SELECT list(t ORDER BY t) AS ts
                   FROM (SELECT DISTINCT event_type AS t FROM events)),
            tt AS (SELECT u.t,
                     coalesce(o.n_out, 0) + coalesce(e2.n_end, 0) AS tot
                   FROM (SELECT DISTINCT event_type AS t FROM events) u
                   LEFT JOIN outs o ON o.t = u.t
                   LEFT JOIN en e2 ON e2.t = u.t),
            qb AS (SELECT c.a, c.b,
                     CAST((c.n * 10000) // tt.tot AS BIGINT) AS v
                   FROM c JOIN tt ON tt.t = c.a),
            el AS (SELECT coalesce(list(struct_pack(a := a, b := b, v := v)),
                     []) AS es FROM qb),
            qm AS (SELECT ts, list_transform(ts, x -> list_transform(ts, y ->
                     coalesce(list_min(list_transform(
                       list_filter(es, q -> q.a = x AND q.b = y),
                       q -> q.v)), 0))) AS m
                   FROM ty CROSS JOIN el),
            re AS (SELECT coalesce(list(struct_pack(t := tt.t,
                     v := (coalesce(e2.n_end, 0) * 10000) // tt.tot)), [])
                     AS rs
                   FROM tt LEFT JOIN en e2 ON e2.t = tt.t),
            rv AS (SELECT ts, list_transform(ts, x ->
                     coalesce(list_min(list_transform(
                       list_filter(rs, q -> q.t = x), q -> q.v)), 0)) AS r
                   FROM ty CROSS JOIN re),
            itS AS (
              SELECT 0 AS step,
                list_transform(range(1, len(ts) + 1), i ->
                  list_transform(range(1, len(ts) + 1), t2 ->
                    CASE WHEN i = t2 THEN CAST(r[i] AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END)) AS sm
              FROM rv
              UNION ALL
              SELECT step + 1,
                list_transform(range(1, len(sm) + 1), i ->
                  list_transform(range(1, len(sm) + 1), t2 -> CAST(
                    (CASE WHEN i = t2 THEN r[i] ELSE 0 END)
                    + list_sum(list_transform(range(1, len(sm) + 1),
                        j -> m[i][j] * sm[j][t2])) // 10000 AS BIGINT)))
              FROM itS CROSS JOIN qm CROSS JOIN rv WHERE step < 8),
            finS AS (SELECT sm FROM itS ORDER BY step DESC LIMIT 1),
            pairs AS (SELECT ts[i] AS start_type, ts[t2] AS end_type,
                        CAST(sm[i][t2] AS BIGINT) AS absorb_bp,
                        CAST(list_sum(sm[i]) AS BIGINT) AS covered_bp
                      FROM finS CROSS JOIN rv
                      CROSS JOIN (SELECT unnest(range(1, 257)) AS i)
                      CROSS JOIN (SELECT unnest(range(1, 257)) AS t2)
                      WHERE i <= len(ts) AND t2 <= len(ts) AND r[t2] > 0)
            SELECT p2.start_type, p2.end_type, p2.absorb_bp, p2.covered_bp,
              coalesce(e2.n_end, 0) AS n_end
            FROM pairs p2 LEFT JOIN en e2 ON e2.t = p2.end_type
            ORDER BY start_type, end_type"""),
    (spark, dir) => {
      import spark.implicits._
      val (types, q, rb) = markovAbsorbChain(spark, dir)
      val k = types.length
      var sm = Array.tabulate(k, k)((i, t2) => if (i == t2) rb(i) else 0L)
      for (_ <- 1 to 8)
        sm = Array.tabulate(k, k)((i, t2) =>
          (if (i == t2) rb(i) else 0L) +
            (0 until k).map(j => q(i)(j) * sm(j)(t2)).sum / 10000L)
      val covered = sm.map(_.sum)
      val pairs = for {
        i <- 0 until k; t2 <- 0 until k if rb(t2) > 0L
      } yield (types(i), types(t2), sm(i)(t2), covered(i))
      val trained = broadcast(pairs
        .toDF("start_type", "end_type", "absorb_bp", "covered_bp"))
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val liveEnd = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("nxt", lead($"event_type", 1).over(wU))
        .where($"nxt".isNull)
        .groupBy($"event_type".as("end_type"))
        .agg(count(lit(1)).as("n_end"))
      trained.join(liveEnd, Seq("end_type"), "left")
        .na.fill(0L, Seq("n_end"))
        .select($"start_type", $"end_type", $"absorb_bp", $"covered_bp",
          $"n_end")
        .orderBy($"start_type", $"end_type")
    })

  /** Retention half-life — the single number executives quote from
    * x_retention's whole grid: pool all cohorts by week OFFSET k
    * (active users at k ≥ 1 over the full user base), fit
    * ln(rate) = a + b·k by least squares, and half_life_w =
    * ln 2 / (−b) — the weeks for retention to halve under the fitted
    * exponential decay (the standard retention-curve model; the grid
    * remains the ground truth, this is its summary statistic).
    * Exact integer counts until the ln: rates are n_k / n_users
    * (DISTINCT (user, week) rows make count(*) per offset the distinct
    * user count), the fit runs over ≤ span-weeks points with identical
    * operand trees in both engines (the x_zipf_slope envelope), every
    * emitted float is round-4 **+ 0.0** — the IEEE −0.0 normalization
    * (−0.0 + 0.0 = +0.0), because a perfectly-zero intercept rounds to
    * the SIGNED zero of whichever side the 1e-16 residue fell on and
    * the two engines may disagree on the sign. Guards: fewer than 2
    * offsets, or a non-decaying fit (slope ≥ 0), emit half_life_w = 0
    * — the loud "no decay measured" sentinel, never a negative or
    * infinite half-life.
    *
    * Scale shape: one DISTINCT (user, week) exchange, a per-user min,
    * an offset-cardinality rollup (≤ span weeks) and a 1-row fit.
    * Nothing downstream of the distinct depends on event volume. */
  private val retentionHalflife = Q(
    "x_retention_halflife",
    Some("""WITH a AS (SELECT DISTINCT user_id,
                         epoch_ms(ts) // 604800000 AS w FROM events),
            f AS (SELECT user_id, min(w) AS fw FROM a GROUP BY user_id),
            o AS (SELECT a.user_id, a.w - f.fw AS k
                  FROM a JOIN f ON f.user_id = a.user_id),
            n0 AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM f),
            nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k
                   FROM o WHERE k >= 1 GROUP BY k),
            pts AS (SELECT CAST(k AS DOUBLE) AS x,
                      ln(CAST(n_k AS DOUBLE) / n_users) AS y
                    FROM nk CROSS JOIN n0),
            fit AS (SELECT CAST(count(*) AS BIGINT) AS m,
                      sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(x * y) AS sxy FROM pts)
            SELECT m AS n_offsets,
              round(CASE WHEN m >= 2
                THEN (m * sxy - sx * sy) / (m * sxx - sx * sx)
                ELSE 0 END, 4) + 0.0 AS slope,
              round(CASE WHEN m >= 2
                THEN (sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx)
                  / m ELSE 0 END, 4) + 0.0 AS intercept,
              round(CASE WHEN m >= 2 AND m * sxy - sx * sy < 0
                THEN ln(2) * (m * sxx - sx * sx) / (sx * sy - m * sxy)
                ELSE 0 END, 4) + 0.0 AS half_life_w
            FROM fit ORDER BY n_offsets"""),
    (spark, dir) => {
      import spark.implicits._
      val a = t(spark, dir, "events")
        .select($"user_id", expr("unix_millis(ts) DIV 604800000").as("w"))
        .distinct()
      val f = a.groupBy($"user_id").agg(min($"w").as("fw"))
      val o = a.join(f, "user_id").select(($"w" - $"fw").as("k"))
      val n0 = f.agg(count(lit(1)).as("n_users"))
      val pts = o.where($"k" >= 1).groupBy($"k")
        .agg(count(lit(1)).as("n_k"))
        .crossJoin(broadcast(n0))
        .select($"k".cast("double").as("x"),
          log($"n_k".cast("double") / $"n_users").as("y"))
      pts.agg(count(lit(1)).as("m"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
        .select($"m".as("n_offsets"),
          (round(when($"m" >= 2,
            expr("(m * sxy - sx * sy) / (m * sxx - sx * sx)"))
            .otherwise(0.0), 4) + 0.0).as("slope"),
          (round(when($"m" >= 2,
            expr("(sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m"))
            .otherwise(0.0), 4) + 0.0).as("intercept"),
          (round(when($"m" >= 2 && $"m" * $"sxy" - $"sx" * $"sy" < 0,
            expr("ln(2) * (m * sxx - sx * sx) / (sx * sy - m * sxy)"))
            .otherwise(0.0), 4) + 0.0).as("half_life_w"))
        .orderBy($"n_offsets")
    })

  /** Benford first-digit screen over event values — the classic
    * fabricated-data / unit-mix audit (Benford 1938; Hill 1995): real
    * multi-scale monetary data leads with digit d at frequency
    * log₁₀(1 + 1/d), and a synthetic generator, a unit mix-up (cents
    * vs dollars upstream) or injected traffic bends the profile.
    * First digit of the exact cents (DECIMAL(18,2)→BIGINT, the money
    * rule; cents ≥ 1 — zero/negative rows carry no leading digit and
    * are filtered identically, the declared domain), taken as the
    * first character of the base-10 string (both engines' integer
    * printing is sign-free here by the filter). The Benford expectation
    * ships as an EXACT CONSTANT TABLE in bp (floor(log₁₀(1+1/d)·10⁴):
    * 3010, 1760, 1249, 969, 791, 669, 579, 511, 457) so the deviation
    * column is integer arithmetic, not a float recomputed per engine.
    * NOTE: this corpus's values are synthetic-uniform, so the profile
    * SHOULD deviate loudly — the read's job is to measure, not to
    * pass; the pin constructs a conforming corpus instead.
    *
    * Scale shape: one narrow projection into a 9-row digit aggregate
    * (map-side combined) + a broadcast total and the 9-row constant
    * table. Nothing downstream depends on volume. */
  private val valueBenford = Q(
    "x_value_benford",
    Some("""WITH c AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS cents FROM events),
            d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                         AS BIGINT) AS digit
                  FROM c WHERE cents >= 1),
            g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
                  FROM d GROUP BY digit),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g),
            e AS (SELECT * FROM (VALUES (1, 3010), (2, 1760), (3, 1249),
                    (4, 969), (5, 791), (6, 669), (7, 579), (8, 511),
                    (9, 457)) AS e(digit, expected_bp))
            SELECT CAST(g.digit AS BIGINT) AS digit, g.n,
              CAST(g.n * 10000 // t.total AS BIGINT) AS share_bp,
              CAST(e.expected_bp AS BIGINT) AS expected_bp,
              CAST(abs(g.n * 10000 // t.total - e.expected_bp)
                AS BIGINT) AS dev_bp
            FROM g JOIN e ON e.digit = g.digit CROSS JOIN t
            ORDER BY digit"""),
    (spark, dir) => {
      import spark.implicits._
      val benford = Seq(1L -> 3010L, 2L -> 1760L, 3L -> 1249L, 4L -> 969L,
        5L -> 791L, 6L -> 669L, 7L -> 579L, 8L -> 511L, 9L -> 457L)
        .toDF("e_digit", "expected_bp")
      val d = t(spark, dir, "events")
        .select(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
        .where($"cents" >= 1)
        .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
          .as("digit"))
      val g = d.groupBy($"digit").agg(count(lit(1)).as("n"))
      val tot = g.agg(sum($"n").as("total"))
      g.join(broadcast(benford), $"e_digit" === $"digit")
        .crossJoin(broadcast(tot))
        .select($"digit", $"n",
          expr("n * 10000 DIV total").as("share_bp"), $"expected_bp",
          expr("abs(n * 10000 DIV total - expected_bp)").as("dev_bp"))
        .orderBy($"digit")
    })

  /** Conversion-lag histogram — x_funnel's TIME dimension: the funnel
    * counts who converts; this measures HOW LONG first view → first
    * subsequent purchase takes, the number a checkout-latency or
    * campaign-attribution team sizes windows from (x_funnel's 24 h/72 h
    * stage windows are exactly the constants this read calibrates).
    * Per converting user, lag = min purchase ms strictly after the
    * first view − first view ms; lags land on a fixed six-rung span
    * ladder (<1 h, 1–6 h, 6–24 h, 1–3 d, 3–7 d, ≥7 d — the
    * x_interarrival fixed-span discipline) with exact counts, the
    * share in bp (one trunc division) and exact min/avg/max lag ms per
    * band (avg = sum DIV n — the declared integer mean). Users with
    * purchases only AT or BEFORE their first view don't convert here —
    * strictly-after is the funnel's own rule, stated.
    *
    * Scale shape: two filtered per-user min-aggregates and one
    * broadcast-joined rollup to ≤ 6 rows — the x_funnel shape; never
    * an event-pair join. */
  private val conversionLag = Q(
    "x_conversion_lag",
    Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
                       FROM events),
            v AS (SELECT user_id, min(ms) AS t1 FROM e
                  WHERE event_type = 'view' GROUP BY user_id),
            p AS (SELECT e.user_id, min(ms) AS t2 FROM e
                  JOIN v ON e.user_id = v.user_id AND e.ms > v.t1
                  WHERE event_type = 'purchase' GROUP BY e.user_id),
            l AS (SELECT v.user_id, t2 - t1 AS lag_ms
                  FROM v JOIN p ON p.user_id = v.user_id),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_conv FROM l),
            b AS (SELECT CASE WHEN lag_ms < 3600000 THEN 0
                              WHEN lag_ms < 21600000 THEN 1
                              WHEN lag_ms < 86400000 THEN 2
                              WHEN lag_ms < 259200000 THEN 3
                              WHEN lag_ms < 604800000 THEN 4
                              ELSE 5 END AS lag_band, lag_ms FROM l)
            SELECT CAST(lag_band AS BIGINT) AS lag_band,
              CAST(count(*) AS BIGINT) AS n_users,
              CAST(count(*) * 10000 // n_conv AS BIGINT) AS share_bp,
              CAST(min(lag_ms) AS BIGINT) AS min_lag_ms,
              CAST(sum(lag_ms) // count(*) AS BIGINT) AS avg_lag_ms,
              CAST(max(lag_ms) AS BIGINT) AS max_lag_ms
            FROM b CROSS JOIN n GROUP BY lag_band, n_conv
            ORDER BY lag_band"""),
    (spark, dir) => {
      import spark.implicits._
      val e = t(spark, dir, "events")
        .select($"user_id", $"event_type", expr("unix_millis(ts)").as("ms"))
      val v = e.where($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ms").as("t1"))
      val p = e.where($"event_type" === "purchase")
        .join(v.select($"user_id".as("vu"), $"t1"),
          $"user_id" === $"vu" && $"ms" > $"t1")
        .groupBy($"user_id").agg(min($"ms").as("t2"))
        .select($"user_id".as("pu"), $"t2")
      val l = v.join(p, $"user_id" === $"pu")
        .select(($"t2" - $"t1").as("lag_ms"))
      val n = l.agg(count(lit(1)).as("n_conv"))
      l.select(
          when($"lag_ms" < 3600000L, 0L).when($"lag_ms" < 21600000L, 1L)
            .when($"lag_ms" < 86400000L, 2L).when($"lag_ms" < 259200000L, 3L)
            .when($"lag_ms" < 604800000L, 4L).otherwise(5L).as("lag_band"),
          $"lag_ms")
        .groupBy($"lag_band")
        .agg(count(lit(1)).as("n_users"), min($"lag_ms").as("min_lag_ms"),
          // DECIMAL(38,0) lag sum (r18 audit): Σlag over 10¹⁰ users ×
          // an unbounded top band exceeds 2⁶³; DuckDB's sum(BIGINT)
          // is already HUGEINT-wide, this matches it exactly
          sum($"lag_ms".cast("decimal(38,0)")).as("sum_lag"),
          max($"lag_ms").as("max_lag_ms"))
        .crossJoin(broadcast(n))
        .select($"lag_band", $"n_users",
          expr("n_users * 10000 DIV n_conv").as("share_bp"),
          $"min_lag_ms",
          expr("CAST(sum_lag DIV n_users AS BIGINT)").as("avg_lag_ms"),
          $"max_lag_ms")
        .orderBy($"lag_band")
    })

  /** RFM segmentation cube — the recency / frequency / monetary user
    * grid every lifecycle-marketing and LTV team cuts its base by:
    * per user, weeks since last activity (corpus-end anchored — the
    * x_hazard_km convention), event count banded on a power-of-two
    * ladder, and exact lifetime cents banded on a decimal ladder; the
    * output is the (rec_wk, f_band, m_band) cube with user counts and
    * exact total cents. The bands are FIXED CASE LADDERS by
    * declaration — the quantile alternative (true quintiles) needs a
    * global rank over users, i.e. a single-partition window at corpus
    * scale; fixed ladders are exact, engine-identical, and
    * segment-stable release to release (the property marketing
    * automation actually wants — a user's segment shouldn't move
    * because OTHER users changed). Money through the DECIMAL(18,2)
    * cast ×100 → per-row exact BIGINT cents before any sum (the money
    * rule, applied before aggregation so both engines sum integers).
    *
    * Scale shape: one per-user rollup (map-side combined), a broadcast
    * 1-row corpus-end anchor, a cube-cardinality aggregate (≤ weeks ×
    * 7 × 6 cells). Nothing downstream of the user rollup depends on
    * event volume. */
  private val rfmProfile = Q(
    "x_rfm_profile",
    Some("""WITH u AS (SELECT user_id,
                         max(epoch_ms(ts) // 86400000) AS ld,
                         CAST(count(*) AS BIGINT) AS f,
                         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
                       FROM events GROUP BY user_id),
            e AS (SELECT max(ld) AS ce FROM u),
            b AS (SELECT (ce - ld) // 7 AS rec_wk,
                    CASE WHEN f >= 64 THEN 64 WHEN f >= 32 THEN 32
                         WHEN f >= 16 THEN 16 WHEN f >= 8 THEN 8
                         WHEN f >= 4 THEN 4 WHEN f >= 2 THEN 2
                         ELSE 1 END AS f_band,
                    CASE WHEN cents >= 10000000 THEN 5
                         WHEN cents >= 1000000 THEN 4
                         WHEN cents >= 100000 THEN 3
                         WHEN cents >= 10000 THEN 2
                         WHEN cents >= 1000 THEN 1
                         ELSE 0 END AS m_band,
                    cents
                  FROM u CROSS JOIN e)
            SELECT CAST(rec_wk AS BIGINT) AS rec_wk,
              CAST(f_band AS BIGINT) AS f_band,
              CAST(m_band AS BIGINT) AS m_band,
              CAST(count(*) AS BIGINT) AS n_users,
              CAST(sum(cents) AS BIGINT) AS total_cents
            FROM b GROUP BY 1, 2, 3
            ORDER BY rec_wk, f_band, m_band"""),
    (spark, dir) => {
      import spark.implicits._
      val u = t(spark, dir, "events")
        .groupBy($"user_id")
        .agg(max(expr("unix_millis(ts) DIV 86400000")).as("ld"),
          count(lit(1)).as("f"),
          sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("cents"))
      val e = u.agg(max($"ld").as("ce"))
      u.crossJoin(broadcast(e))
        .select(expr("(ce - ld) DIV 7").as("rec_wk"),
          when($"f" >= 64, 64L).when($"f" >= 32, 32L).when($"f" >= 16, 16L)
            .when($"f" >= 8, 8L).when($"f" >= 4, 4L).when($"f" >= 2, 2L)
            .otherwise(1L).as("f_band"),
          when($"cents" >= 10000000L, 5L).when($"cents" >= 1000000L, 4L)
            .when($"cents" >= 100000L, 3L).when($"cents" >= 10000L, 2L)
            .when($"cents" >= 1000L, 1L).otherwise(0L).as("m_band"),
          $"cents")
        .groupBy($"rec_wk", $"f_band", $"m_band")
        .agg(count(lit(1)).as("n_users"), sum($"cents").as("total_cents"))
        .orderBy($"rec_wk", $"f_band", $"m_band")
    })

  /** ORACLE-BACKED target-hitting read — the Markov family's fourth
    * member (steady = long-run mix, absorb = steps to END, absorb_to =
    * WHICH end; this answers the conversion question: "starting from
    * each event type, what fraction of continuations ever REACH
    * `purchase` before the stream ends"). First-passage probabilities
    * over the substochastic chain: h = q(·,τ) + Q_{−τ}·h (hit the
    * target directly, or move to a non-target type and hit from
    * there), replayed as the same FIXED-8-round integer series
    * s ← q(·,τ) + (Q_{−τ}·s) DIV 10⁴ from s⁰ = q(·,τ). The target
    * row reads as the RETURN probability (from purchase, reach
    * purchase again — q(τ,τ) counts the direct repeat). An
    * expected-steps-to-target read is deliberately NOT emitted: with
    * end-absorption competing, E[steps to τ] conditions on reaching τ
    * at all (taboo-renormalized chain) — a division by h that leaves
    * integer algebra; the probability IS the well-defined quantity.
    *
    * ENVELOPE WORKSHEET (fresh, before the SQL): s⁰ = q(·,τ) ≤ 10⁴;
    * induction s_{m+1}(i) ≤ q(i,τ) + (Σ_{j≠τ} q(i,j)·10⁴) DIV 10⁴ ≤
    * q(i,τ) + Σ_{j≠τ} q(i,j) ≤ 10⁴ (the absorb_to sum-of-floors
    * bound with R's diagonal replaced by the target column); matvec ≤
    * 10⁴·10⁴ = 10⁸ ≪ 2^53, K never enters. All nonnegative → trunc ≡
    * floor. s₈ is a monotone LOWER bound of h·10⁴ (truncated series +
    * per-step floors). A corpus with NO `purchase` type yields an
    * EMPTY result in both engines (the target position filter — the
    * declared behavior, pinned), never a fabricated zero table.
    *
    * Scale shape: the chain collect is shared ([[markovAbsorbChain]],
    * cached); the K×K driver iteration is ≤ 8·256² bounded ops; the
    * declared query is one live lead-window pass (n_to_target — the
    * corpus evidence) plus a ≤K-row broadcast of trained constants. */
  private val markovReach = Q(
    "x_markov_reach",
    Some("""WITH RECURSIVE
            e AS (SELECT user_id, event_id, event_type,
                    epoch_us(ts) AS ts_us FROM events),
            p AS (SELECT event_type AS cur, lead(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) AS nxt
                  FROM e),
            c AS (SELECT cur AS a, nxt AS b, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE nxt IS NOT NULL GROUP BY 1, 2),
            en AS (SELECT cur AS t, CAST(count(*) AS BIGINT) AS n_end
                   FROM p WHERE nxt IS NULL GROUP BY 1),
            outs AS (SELECT a AS t, CAST(sum(n) AS BIGINT) AS n_out
                     FROM c GROUP BY 1),
            ty AS (SELECT list(t ORDER BY t) AS ts
                   FROM (SELECT DISTINCT event_type AS t FROM events)),
            tt AS (SELECT u.t,
                     coalesce(o.n_out, 0) + coalesce(e2.n_end, 0) AS tot
                   FROM (SELECT DISTINCT event_type AS t FROM events) u
                   LEFT JOIN outs o ON o.t = u.t
                   LEFT JOIN en e2 ON e2.t = u.t),
            qb AS (SELECT c.a, c.b,
                     CAST((c.n * 10000) // tt.tot AS BIGINT) AS v
                   FROM c JOIN tt ON tt.t = c.a),
            el AS (SELECT coalesce(list(struct_pack(a := a, b := b, v := v)),
                     []) AS es FROM qb),
            qm AS (SELECT ts, list_transform(ts, x -> list_transform(ts, y ->
                     coalesce(list_min(list_transform(
                       list_filter(es, q -> q.a = x AND q.b = y),
                       q -> q.v)), 0))) AS m
                   FROM ty CROSS JOIN el),
            tv AS (SELECT ts, m, list_position(ts, 'purchase') AS ti,
                     list_transform(range(1, len(ts) + 1),
                       i -> m[i][list_position(ts, 'purchase')]) AS v
                   FROM qm
                   WHERE coalesce(list_position(ts, 'purchase'), 0) > 0),
            it AS (SELECT 0 AS step, v AS s FROM tv
                   UNION ALL
                   SELECT step + 1,
                     list_transform(range(1, len(s) + 1), i -> CAST(
                       v[i] + list_sum(list_transform(range(1, len(s) + 1),
                         j -> (CASE WHEN j = ti THEN 0 ELSE m[i][j] END)
                           * s[j])) // 10000 AS BIGINT)) AS s
                   FROM it CROSS JOIN tv WHERE step < 8),
            fin AS (SELECT s FROM it ORDER BY step DESC LIMIT 1),
            base AS (SELECT ts[k] AS event_type,
                       CAST(v[k] AS BIGINT) AS q_to_target_bp,
                       CAST(s[k] AS BIGINT) AS reach_bp
                     FROM fin CROSS JOIN tv
                     CROSS JOIN (SELECT unnest(range(1, 257)) AS k)
                     WHERE k <= len(ts)),
            live AS (SELECT cur AS t, CAST(sum(CASE WHEN nxt = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_to_target
                     FROM p WHERE nxt IS NOT NULL GROUP BY 1)
            SELECT b.event_type, coalesce(l.n_to_target, 0) AS n_to_target,
              b.q_to_target_bp, b.reach_bp
            FROM base b LEFT JOIN live l ON l.t = b.event_type
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val (types, q, _) = markovAbsorbChain(spark, dir)
      val ti = types.indexOf("purchase")
      val trained =
        if (ti < 0) Seq.empty[(String, Long, Long)]
            .toDF("event_type", "q_to_target_bp", "reach_bp")
        else {
          val k = types.length
          val v = Array.tabulate(k)(i => q(i)(ti))
          var s = v.clone()
          for (_ <- 1 to 8)
            s = Array.tabulate(k)(i =>
              v(i) + (0 until k).filter(_ != ti)
                .map(j => q(i)(j) * s(j)).sum / 10000L)
          types.indices.map(i => (types(i), v(i), s(i)))
            .toDF("event_type", "q_to_target_bp", "reach_bp")
        }
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val live = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("nxt", lead($"event_type", 1).over(wU))
        .groupBy($"event_type")
        .agg(sum(when($"nxt" === "purchase", 1L).otherwise(0L))
          .as("n_to_target"))
      broadcast(trained).join(live, Seq("event_type"), "left")
        .na.fill(0L, Seq("n_to_target"))
        .select($"event_type", $"n_to_target", $"q_to_target_bp",
          $"reach_bp")
        .orderBy($"event_type")
    })

  /** ORACLE-BACKED conditional mean-first-passage read — the Markov
    * family member x_markov_reach deliberately did NOT emit, closed by
    * the worksheet the r15 verdict gated it on (task #4): "of the
    * continuations that DO reach `purchase`, how many steps does it
    * take, per starting type". The naive spelling conditions the chain
    * (taboo renormalization q̃(i,j) = q(i,j)·h(j)/h(i)) — a division in
    * the middle of the algebra that leaves integers. The LINEARIZATION
    * dissolves it: let u(i) = E_i[N·1{reach}] (reach-mass-weighted
    * steps). Splitting on the first transition,
    *   u(i) = q(i,τ) + Σ_{j≠τ} q(i,j)·(h(j) + u(j)) = h(i) + Σ_{j≠τ} q(i,j)·u(j)
    * — the SAME substochastic operator as h's own equation, so u
    * replays as a second FIXED-8-round integer series
    * u ← h_bp + (Q_{−τ,bp}·u) DIV 10⁴ from u⁰ = h_bp, and the taboo
    * division becomes ONE final float step g = u/h per row — exactly
    * the x_token_kl envelope (hash-exact integers in, one
    * correctly-rounded IEEE op out, round-4 + 0.0 both engines).
    *
    * ENVELOPE WORKSHEET (fresh, before the SQL): h_bp = the reach
    * series' s₈ ≤ 10⁴ (proved at x_markov_reach). u⁰ = h_bp ≤ 10⁴;
    * induction u_{m+1}(i) ≤ 10⁴ + (Σ_{j≠τ} q(i,j)·max u) DIV 10⁴ ≤
    * 10⁴ + max u (row sums ≤ 10⁴), so u_m ≤ (m+1)·10⁴ and u₈ ≤ 9·10⁴;
    * the matvec intermediate ≤ 10⁴·9·10⁴ = 9·10⁸ ≪ 2^53 — K never
    * enters. All values nonnegative → trunc ≡ floor. u₈ is a monotone
    * LOWER bound of 10⁴·u (its inputs h_bp are themselves lower bounds
    * and every per-step floor rounds down). The RATIO of two lower
    * bounds is NOT itself a bound — mfpt_cond is the declared 8-round
    * approximant both engines replay bit-for-bit, the absorb family's
    * standing truncation convention, made loud here. The final
    * division is total and ≥ 1 on every emitted row: rows are
    * filtered to h_bp > 0 (a type that cannot reach τ at 10⁴
    * granularity has no conditional expectation — the same
    * quantized-chain domain rule as x_markov_absorb_to's r_bp > 0),
    * and u₈ ≥ u⁰ = h_bp since every added term is nonnegative. Both
    * operands are exact int64 ≤ 9·10⁴ → exact doubles → one
    * correctly-rounded IEEE division identical cross-engine.
    *
    * Scale shape: the chain collect is shared ([[markovAbsorbChain]],
    * cached once per (JVM, generation)); the two K-vector iterations
    * are ≤ 16·256² driver ops; the declared query is one live
    * lead-window pass (n_to_target, the corpus evidence — one scan,
    * one user-keyed window, one exchange) plus a ≤K-row broadcast of
    * trained constants. A target-free corpus yields EMPTY in both
    * engines (the x_markov_reach rule, pinned). */
  private val markovMfpt = Q(
    "x_markov_mfpt",
    Some("""WITH RECURSIVE
            e AS (SELECT user_id, event_id, event_type,
                    epoch_us(ts) AS ts_us FROM events),
            p AS (SELECT event_type AS cur, lead(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) AS nxt
                  FROM e),
            c AS (SELECT cur AS a, nxt AS b, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE nxt IS NOT NULL GROUP BY 1, 2),
            en AS (SELECT cur AS t, CAST(count(*) AS BIGINT) AS n_end
                   FROM p WHERE nxt IS NULL GROUP BY 1),
            outs AS (SELECT a AS t, CAST(sum(n) AS BIGINT) AS n_out
                     FROM c GROUP BY 1),
            ty AS (SELECT list(t ORDER BY t) AS ts
                   FROM (SELECT DISTINCT event_type AS t FROM events)),
            tt AS (SELECT u.t,
                     coalesce(o.n_out, 0) + coalesce(e2.n_end, 0) AS tot
                   FROM (SELECT DISTINCT event_type AS t FROM events) u
                   LEFT JOIN outs o ON o.t = u.t
                   LEFT JOIN en e2 ON e2.t = u.t),
            qb AS (SELECT c.a, c.b,
                     CAST((c.n * 10000) // tt.tot AS BIGINT) AS v
                   FROM c JOIN tt ON tt.t = c.a),
            el AS (SELECT coalesce(list(struct_pack(a := a, b := b, v := v)),
                     []) AS es FROM qb),
            qm AS (SELECT ts, list_transform(ts, x -> list_transform(ts, y ->
                     coalesce(list_min(list_transform(
                       list_filter(es, q -> q.a = x AND q.b = y),
                       q -> q.v)), 0))) AS m
                   FROM ty CROSS JOIN el),
            tv AS (SELECT ts, m, list_position(ts, 'purchase') AS ti,
                     list_transform(range(1, len(ts) + 1),
                       i -> m[i][list_position(ts, 'purchase')]) AS v
                   FROM qm
                   WHERE coalesce(list_position(ts, 'purchase'), 0) > 0),
            it AS (SELECT 0 AS step, v AS s FROM tv
                   UNION ALL
                   SELECT step + 1,
                     list_transform(range(1, len(s) + 1), i -> CAST(
                       v[i] + list_sum(list_transform(range(1, len(s) + 1),
                         j -> (CASE WHEN j = ti THEN 0 ELSE m[i][j] END)
                           * s[j])) // 10000 AS BIGINT)) AS s
                   FROM it CROSS JOIN tv WHERE step < 8),
            fin AS (SELECT s FROM it ORDER BY step DESC LIMIT 1),
            it2 AS (SELECT 0 AS step, s AS u FROM fin
                    UNION ALL
                    SELECT step + 1,
                      list_transform(range(1, len(u) + 1), i -> CAST(
                        f.s[i] + list_sum(list_transform(
                          range(1, len(u) + 1),
                          j -> (CASE WHEN j = ti THEN 0 ELSE m[i][j] END)
                            * u[j])) // 10000 AS BIGINT)) AS u
                    FROM it2 CROSS JOIN tv CROSS JOIN fin f WHERE step < 8),
            fin2 AS (SELECT u FROM it2 ORDER BY step DESC LIMIT 1),
            base AS (SELECT ts[k] AS event_type,
                       CAST(f.s[k] AS BIGINT) AS reach_bp,
                       CAST(u[k] AS BIGINT) AS steps_mass_bp
                     FROM fin2 CROSS JOIN fin f CROSS JOIN tv
                     CROSS JOIN (SELECT unnest(range(1, 257)) AS k)
                     WHERE k <= len(ts) AND f.s[k] > 0),
            live AS (SELECT cur AS t, CAST(sum(CASE WHEN nxt = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_to_target
                     FROM p WHERE nxt IS NOT NULL GROUP BY 1)
            SELECT b.event_type, coalesce(l.n_to_target, 0) AS n_to_target,
              b.reach_bp, b.steps_mass_bp,
              round(CAST(b.steps_mass_bp AS DOUBLE) / b.reach_bp, 4) + 0.0
                AS mfpt_cond
            FROM base b LEFT JOIN live l ON l.t = b.event_type
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val (types, q, _) = markovAbsorbChain(spark, dir)
      val ti = types.indexOf("purchase")
      val trained =
        if (ti < 0) Seq.empty[(String, Long, Long)]
            .toDF("event_type", "reach_bp", "steps_mass_bp")
        else {
          val k = types.length
          val v = Array.tabulate(k)(i => q(i)(ti))
          var h = v.clone()
          for (_ <- 1 to 8)
            h = Array.tabulate(k)(i =>
              v(i) + (0 until k).filter(_ != ti)
                .map(j => q(i)(j) * h(j)).sum / 10000L)
          var u = h.clone()
          for (_ <- 1 to 8)
            u = Array.tabulate(k)(i =>
              h(i) + (0 until k).filter(_ != ti)
                .map(j => q(i)(j) * u(j)).sum / 10000L)
          types.indices.filter(i => h(i) > 0)
            .map(i => (types(i), h(i), u(i)))
            .toDF("event_type", "reach_bp", "steps_mass_bp")
        }
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val live = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("nxt", lead($"event_type", 1).over(wU))
        .groupBy($"event_type")
        .agg(sum(when($"nxt" === "purchase", 1L).otherwise(0L))
          .as("n_to_target"))
      broadcast(trained).join(live, Seq("event_type"), "left")
        .na.fill(0L, Seq("n_to_target"))
        .select($"event_type", $"n_to_target", $"reach_bp",
          $"steps_mass_bp",
          (round($"steps_mass_bp".cast("double") / $"reach_bp", 4) + 0.0)
            .as("mfpt_cond"))
        .orderBy($"event_type")
    })

  /** ORACLE-BACKED behavioral-predictability read — the Markov
    * family's entropy member (steady = where time is spent, absorb =
    * how long until END, reach/mfpt = conversion; this answers "HOW
    * PREDICTABLE is the next step from each state", the
    * Shannon/Khinchin entropy-rate decomposition): per event type i
    * with observed outgoing transitions, row_entropy_nats =
    * Σ_j (p_bp/10⁴)·ln(10⁴/p_bp) over the QUANTIZED transition row
    * (LITERALLY x_event_transitions' p_bp column — the chain is an
    * already-declared artifact), and h_contrib_nats =
    * (steady_bp/10⁴)·row_entropy — the type's term in the chain's
    * entropy rate H = Σ_i π(i)·H(row i), with π = x_markov_steady's
    * declared steady share. Σ h_contrib over the output IS the
    * entropy rate of the quantized behavioral chain (0 = perfectly
    * scripted sessions, ln K = uniform wandering).
    *
    * Float policy = the x_token_kl envelope: every input to the ln
    * stage is an exact integer both engines hash-match elsewhere
    * (p_bp, steady_bp); the ln-sum runs over ≤ K ≤ 256 terms per row
    * with identical operand trees (CAST(·)/10⁴ · ln(10⁴/·)) and
    * round-4 absorbs the float-sum order skew. Edges whose
    * probability QUANTIZES to zero (n·10⁴ < tot) are excluded from
    * the entropy sum in BOTH engines — the 10⁴-granularity domain
    * rule (x_markov_absorb_to's r_bp > 0 convention; the 0·ln 0 = 0
    * limit applied at the quantizer's resolution) — while n_out keeps
    * counting ALL outgoing transitions (the live corpus evidence).
    * Types never observed with a successor (stream-final-only) have
    * no transition row and emit nothing — documented domain.
    *
    * Scale shape: the steady vector is the cached [[markovState]]
    * collect; the declared query is ONE live user-keyed lag-window
    * pass into a ≤K²-row rollup + a ≤K-row broadcast join. K is type
    * cardinality — bounded by declaration, guarded at 256. */
  private val markovEntropy = Q(
    "x_markov_entropy",
    Some("""WITH RECURSIVE
            e AS (SELECT user_id, event_id, event_type,
                    epoch_us(ts) AS ts_us FROM events),
            p AS (SELECT lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type,
                    event_type AS next_type
                  FROM e),
            c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            tt AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
                   FROM c GROUP BY 1),
            pb AS (SELECT c.prev_type AS a, c.next_type AS b,
                     CAST((c.n * 10000) // tt.tot AS BIGINT) AS v
                   FROM c JOIN tt USING (prev_type)),
            ty AS (SELECT list(t ORDER BY t) AS ts
                   FROM (SELECT DISTINCT event_type AS t FROM events)),
            el AS (SELECT coalesce(list(struct_pack(a := a, b := b, v := v)),
                     []) AS es FROM pb),
            pm AS (SELECT ts, list_transform(ts, x -> list_transform(ts, y ->
                     coalesce(list_min(list_transform(
                       list_filter(es, q -> q.a = x AND q.b = y),
                       q -> q.v)), 0))) AS m
                   FROM ty CROSS JOIN el),
            it AS (
              SELECT 0 AS step, list_transform(ts, t -> CAST(1 AS BIGINT)) AS w
              FROM ty
              UNION ALL
              SELECT step + 1,
                CASE WHEN s = 0 THEN w ELSE
                  list_transform(wp, x -> CAST((x * 10000) // s AS BIGINT))
                END AS w
              FROM (SELECT step, w, wp,
                      list_max(list_transform(wp, x -> abs(x))) AS s
                    FROM (SELECT step, w,
                            list_transform(range(1, len(w) + 1), j -> CAST(
                              list_sum(list_transform(range(1, len(w) + 1),
                                i -> w[i] * m[i][j])) AS BIGINT)) AS wp
                          FROM it CROSS JOIN pm))
              WHERE step < 5),
            fin AS (SELECT w FROM it ORDER BY step DESC LIMIT 1),
            sw AS (SELECT ts, w, CAST(list_sum(w) AS BIGINT) AS wt
                   FROM fin CROSS JOIN ty),
            sb AS (SELECT ts[k] AS t,
                     CAST((w[k] * 10000) // wt AS BIGINT) AS steady_bp
                   FROM sw CROSS JOIN (SELECT unnest(range(1, 257)) AS k)
                   WHERE k <= len(ts)),
            outs AS (SELECT prev_type AS t, CAST(sum(n) AS BIGINT) AS n_out
                     FROM c GROUP BY 1),
            re AS (SELECT a AS t,
                     sum((CAST(v AS DOUBLE) / 10000.0)
                       * ln(10000.0 / CAST(v AS DOUBLE))) AS rent
                   FROM pb WHERE v > 0 GROUP BY 1)
            SELECT re.t AS event_type, o.n_out,
              round(re.rent, 4) + 0.0 AS row_entropy_nats, sb.steady_bp,
              round((CAST(sb.steady_bp AS DOUBLE) / 10000.0) * re.rent, 4)
                + 0.0 AS h_contrib_nats
            FROM re JOIN outs o ON o.t = re.t
            JOIN sb ON sb.t = re.t
            ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val (types, w) = markovState(spark, dir)
      val wt = w.sum
      val steady = broadcast(types.zip(w).map { case (ty, wi) =>
        (ty, wi * 10000L / wt) }.toDF("event_type", "steady_bp"))
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val edges = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("prev_type", lag($"event_type", 1).over(wU))
        .where($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum($"n").over(Window.partitionBy($"prev_type")))
        .withColumn("p_bp", expr("(n * 10000) DIV tot"))
      val rows = edges.groupBy($"prev_type".as("event_type"))
        .agg(sum($"n").as("n_out"),
          sum(when($"p_bp" > 0,
            expr("(CAST(p_bp AS DOUBLE) / 10000.0D)"
              + " * ln(10000.0D / CAST(p_bp AS DOUBLE))"))).as("rent"))
      rows.join(steady, Seq("event_type"))
        .select($"event_type", $"n_out",
          (round($"rent", 4) + 0.0).as("row_entropy_nats"),
          $"steady_bp",
          (round(expr("(CAST(steady_bp AS DOUBLE) / 10000.0D) * rent"), 4)
            + 0.0).as("h_contrib_nats"))
        .orderBy($"event_type")
    })

  /** ORACLE-BACKED Jensen–Shannon drift — the drift family's
    * symmetric-divergence member (TVD = binned mix, KS = shape sup,
    * PSI/chi2 = banded scores, MW = location; JSD = the bounded
    * symmetric divergence retrieval/LM teams actually compare
    * distributions with — Lin 1991, the x_lang_jsd arithmetic carried
    * to the drift split): per event type, JSD between the early-half
    * and late-half cents distributions (same calendar-midpoint split
    * and quantization as x_drift_ks), in nats, bounded by ln 2.
    *
    * Arithmetic: with p = ea/ne and q = la/nl per distinct cent
    * level, the mixture ratios CROSS-MULTIPLY to integer forms —
    * p/m = 2·ea·nl / (ea·nl + la·ne) — so every ln argument is a
    * ratio of exact int64 products (the mixture sum ≤ 2·ne·nl stays
    * exactly-representable while ne·nl < 2^52 ≈ 4.5·10¹⁵; the
    * x_drift_ks ne·nl < 9.2·10¹⁴ envelope stated there is tighter
    * and covers this one) and both engines evaluate IDENTICAL
    * operand trees; one ln-sum per type (≤ distinct-levels terms),
    * round-4 + 0.0 absorbing float-sum order skew and the signed-zero
    * residue (a level-wise-identical pair sums EXACT +0.0 terms).
    * Terms with ea = 0 (resp. la = 0) are absent from the p-sum
    * (resp. q-sum) — the 0·ln 0 = 0 limit, structurally enforced
    * because a level only carries the sides that have mass. Types
    * with an empty half drop identically in both engines (the
    * x_drift_ks rule).
    *
    * Scale shape: the same (type, cents) aggregate as the rest of the
    * drift family (volume only in that one map-side-combined
    * exchange), a broadcast of the ≤K-row per-type totals, one
    * level-cardinality rollup. */
  private val driftJs = Q(
    "x_drift_js",
    Some("""WITH d AS (SELECT event_type,
                         CAST(floor(value * 100.0) AS BIGINT) AS cents,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dr AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
            s AS (SELECT event_type, cents,
                    CAST(sum(CASE WHEN day <= (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS ea,
                    CAST(sum(CASE WHEN day > (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS la
                  FROM d CROSS JOIN dr GROUP BY 1, 2),
            tt AS (SELECT event_type, CAST(sum(ea) AS BIGINT) AS ne,
                     CAST(sum(la) AS BIGINT) AS nl
                   FROM s GROUP BY 1),
            j AS (SELECT s.event_type, tt.ne, tt.nl,
                    sum(CASE WHEN s.ea > 0 THEN
                      0.5 * (CAST(s.ea AS DOUBLE) / tt.ne)
                        * ln(CAST(2 * CAST(s.ea AS HUGEINT) * tt.nl
                               AS DOUBLE)
                             / CAST(CAST(s.ea AS HUGEINT) * tt.nl
                                  + CAST(s.la AS HUGEINT) * tt.ne
                               AS DOUBLE))
                      ELSE 0.0 END
                    + CASE WHEN s.la > 0 THEN
                      0.5 * (CAST(s.la AS DOUBLE) / tt.nl)
                        * ln(CAST(2 * CAST(s.la AS HUGEINT) * tt.ne
                               AS DOUBLE)
                             / CAST(CAST(s.ea AS HUGEINT) * tt.nl
                                  + CAST(s.la AS HUGEINT) * tt.ne
                               AS DOUBLE))
                      ELSE 0.0 END) AS jsd
                  FROM s JOIN tt USING (event_type)
                  WHERE tt.ne > 0 AND tt.nl > 0
                  GROUP BY 1, 2, 3)
            SELECT event_type, ne AS n_early, nl AS n_late,
              round(jsd, 4) + 0.0 AS jsd_nats
            FROM j ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      // r20 (§2.4, the x_drift_ks shape): per-type totals as a window
      // over the aggregated (type, cents) frame instead of a second
      // aggregate + join-back — the join-back recomputed the whole
      // scan + cross-join + aggregate subtree for tt (pruning
      // divergence defeats ReusedExchange), so the old plan scanned
      // events 4×; this one scans it 2× (the d/dr split-bounds pass,
      // which is the family's fundamental two-pass shape). Same-run
      // A/B (ScratchAB, rows hash-identical): 0.600 vs 0.617 s at
      // sf0.1 — flat here, but half the scans at scale.
      val wT = Window.partitionBy($"event_type")
      s.select($"event_type", $"cents", $"ea", $"la",
          sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"))
        .where($"ne" > 0 && $"nl" > 0)
        .groupBy($"event_type", $"ne", $"nl")
        .agg(sum(
          when($"ea" > 0,
            expr("0.5 * (CAST(ea AS DOUBLE) / ne)"
              + " * ln(CAST(2 * CAST(ea AS DECIMAL(38,0)) * nl AS DOUBLE)"
              + "      / CAST(CAST(ea AS DECIMAL(38,0)) * nl"
              + "           + CAST(la AS DECIMAL(38,0)) * ne AS DOUBLE))"))
            .otherwise(0.0)
          + when($"la" > 0,
            expr("0.5 * (CAST(la AS DOUBLE) / nl)"
              + " * ln(CAST(2 * CAST(la AS DECIMAL(38,0)) * ne AS DOUBLE)"
              + "      / CAST(CAST(ea AS DECIMAL(38,0)) * nl"
              + "           + CAST(la AS DECIMAL(38,0)) * ne AS DOUBLE))"))
            .otherwise(0.0)).as("jsd"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          (round($"jsd", 4) + 0.0).as("jsd_nats"))
        .orderBy($"event_type")
    })

  /** Wasserstein-1 (earth-mover) drift — the drift family's sixth batch
    * member (TVD = binned mix, KS = worst-level ECDF gap, MW = location
    * direction, PSI/χ² = banded scores, JSD = symmetric divergence; W₁
    * answers the magnitude question none of them do: HOW FAR did the
    * value mass move, in the value's own units — a 1-cent shift and a
    * $100 shift both max out KS at disjoint supports, but W₁ reads 1
    * vs 10⁴). Same calendar-midpoint split and cents quantizer as
    * x_drift_ks, and the SAME merged-level ECDF walk — summed with
    * level-gap weights instead of sup'd: on the real line
    * W₁ = ∫|F_E − F_L| dx = Σ_levels |cumE·nl − cuml·ne|·Δcents over
    * the merged support (the CDFs are constant between levels), every
    * term an exact int64 product (Vaserstein 1969; Villani's
    * one-dimensional CDF formula).
    *
    * One final scaling to bp of a cent, spelled as the exact
    * floor-division decomposition
    *   w1_bp = (tot DIV d)·10⁴ + ((tot MOD d)·10⁴) DIV d,  d = ne·nl
    * ≡ floor(tot·10⁴/d) for nonnegative operands (tot = q·d + r with
    * r < d ⇒ floor(tot·10⁴/d) = q·10⁴ + floor(r·10⁴/d)) — chosen over
    * the naive tot·10⁴ DIV d because tot ≤ ne·nl·range(cents) carries
    * the RANGE factor the KS max does not — the decomposition keeps
    * the scaled factor at r·10⁴ < d·10⁴ (r < d). Since r18 the whole
    * chain runs wide (DECIMAL(38,0) ↔ HUGEINT, [[DriftArith]]): the
    * cross terms and tot are exact while tot < 10³⁸ (ne·nl·range —
    * a 10¹² row corpus with a 10⁶-cent range sits at ~10³⁰), and the
    * residual remainder-scaling boundary is the family's ne·nl < 10³⁴;
    * past either, BOTH engines raise loudly (ANSI decimal / HUGEINT
    * overflow), never wrap. At sf0.1: tot ≲ 1.4·10¹⁴ — way inside. The last merged level contributes
    * 0 twice over (cumE·nl = cuml·ne = ne·nl there, and its gap is
    * COALESCEd to 0) — no off-support tail term exists. Types with an
    * empty half drop identically in both engines (the x_drift_ks
    * rule). W₁ units: w1_bp = 10⁻⁴ cents, so a clean point-mass shift
    * of d cents reads exactly d·10⁴ (the DegenerateInputSpec pin).
    *
    * Scale shape: identical to x_drift_ks — one map-side-combined
    * (type, cents) aggregate, ONE type-keyed window pass (prefix sums,
    * totals and the lead gap share the same partition), a
    * type-cardinality rollup. Nothing downstream of the first
    * aggregate depends on event volume. */
  private val driftEmd = Q(
    "x_drift_emd",
    Some("""WITH d AS (SELECT event_type,
                         CAST(floor(value * 100.0) AS BIGINT) AS cents,
                         epoch_ms(ts) // 86400000 AS day FROM events),
            dr AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
            s AS (SELECT event_type, cents,
                    CAST(sum(CASE WHEN day <= (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS ea,
                    CAST(sum(CASE WHEN day > (d0 + d1) // 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS la
                  FROM d CROSS JOIN dr GROUP BY 1, 2),
            c AS (SELECT event_type, cents,
                    CAST(sum(ea) OVER w AS BIGINT) AS cume,
                    CAST(sum(la) OVER w AS BIGINT) AS cuml,
                    CAST(sum(ea) OVER t AS BIGINT) AS ne,
                    CAST(sum(la) OVER t AS BIGINT) AS nl,
                    lead(cents) OVER (PARTITION BY event_type
                      ORDER BY cents) AS nxt
                  FROM s
                  WINDOW w AS (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY event_type)),
            m AS (SELECT event_type, ne, nl,
                    sum(abs(CAST(cume AS HUGEINT) * nl
                        - CAST(cuml AS HUGEINT) * ne)
                      * (coalesce(nxt, cents) - cents)) AS tot
                  FROM c WHERE ne > 0 AND nl > 0
                  GROUP BY event_type, ne, nl)
            SELECT event_type, CAST(ne AS BIGINT) AS n_early,
              CAST(nl AS BIGINT) AS n_late,
              CAST((tot // (CAST(ne AS HUGEINT) * nl)) * 10000
                + ((tot % (CAST(ne AS HUGEINT) * nl)) * 10000)
                  // (CAST(ne AS HUGEINT) * nl)
                AS BIGINT) AS w1_bp
            FROM m ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      val wC = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // r20 (§2.4): totals share wC's (partition, order) spec with an
      // unbounded-unbounded frame — cume/cuml/ne/nl/lead all fuse into
      // ONE Window operator instead of a stacked second pass.
      val wT = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wL = Window.partitionBy($"event_type").orderBy($"cents")
      val c = s.select($"event_type", $"cents",
        sum($"ea").over(wC).as("cume"), sum($"la").over(wC).as("cuml"),
        sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"),
        lead($"cents", 1).over(wL).as("nxt"))
        .where($"ne" > 0 && $"nl" > 0)
      c.groupBy($"event_type", $"ne", $"nl")
        .agg(sum(
          expr(DriftArith.absCrossTermSql("cume", "nl", "cuml", "ne"))
            * (coalesce($"nxt", $"cents") - $"cents")).as("tot"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          expr(DriftArith.emdBpSql("tot", "ne", "nl")).as("w1_bp"))
        .orderBy($"event_type")
    })

  /** ORACLE-BACKED session-timeout sensitivity sweep — the operational
    * read that JUSTIFIES a sessionizer's gap constant (r_stream_session
    * and x_session_stats both pin 30 min by declaration; this query
    * shows what that choice does): for each threshold on a declared
    * ladder (1/5/15/30/60 min), the number of sessions the corpus
    * splits into and the resulting events-per-session density. The
    * identity that makes it ONE pass: sessions(T) = n_users +
    * #{user-adjacent gaps > T} — every user contributes one session
    * plus one boundary per above-threshold gap — so the whole ladder
    * is five conditional sums over the SAME interarrival frame
    * (x_interarrival's user-keyed lag window, here WITHOUT the
    * per-type partition: sessions interleave types), then a 5-row
    * constant unpivot. All exact integers; density = n_events·10⁴ DIV
    * n_sessions bp (one trunc division per ladder row). A
    * single-event-per-user corpus has no gaps: sessions(T) = n_users
    * flat across the ladder (pinned).
    *
    * Scale shape: one user-keyed lag window (the exchange) into ONE
    * 6-value aggregate, then a 5-row constant stack — nothing after
    * the window depends on volume; the ladder multiplies conditional
    * sums inside the same map-side-combined aggregate, never rows. */
  private val sessionGapSweep = Q(
    "x_session_gap_sweep",
    Some("""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms
                       FROM events),
            g AS (SELECT ms - lag(ms) OVER (PARTITION BY user_id
                    ORDER BY ms, event_id) AS gap FROM e),
            a AS (SELECT
                    (SELECT CAST(count(*) AS BIGINT) FROM events)
                      AS n_events,
                    (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                     FROM events) AS n_users,
                    CAST(sum(CASE WHEN gap > 60000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS g1,
                    CAST(sum(CASE WHEN gap > 300000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS g5,
                    CAST(sum(CASE WHEN gap > 900000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS g15,
                    CAST(sum(CASE WHEN gap > 1800000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS g30,
                    CAST(sum(CASE WHEN gap > 3600000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS g60
                  FROM g WHERE gap IS NOT NULL),
            l AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT)),
                    (CAST(5 AS BIGINT)), (CAST(15 AS BIGINT)),
                    (CAST(30 AS BIGINT)), (CAST(60 AS BIGINT)))
                  AS t(threshold_min)),
            r AS (SELECT threshold_min,
                    n_users + coalesce(CASE threshold_min WHEN 1 THEN g1
                               WHEN 5 THEN g5 WHEN 15 THEN g15
                               WHEN 30 THEN g30 ELSE g60 END, 0)
                      AS n_sessions,
                    n_events
                  FROM l CROSS JOIN a)
            SELECT threshold_min, CAST(n_sessions AS BIGINT) AS n_sessions,
              CAST(n_events * 10000 // n_sessions AS BIGINT)
                AS events_per_session_bp
            FROM r ORDER BY threshold_min"""),
    (spark, dir) => {
      import spark.implicits._
      val e = t(spark, dir, "events")
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
      val wU = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val totals = e.agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
      val g = e.withColumn("gap", $"ms" - lag($"ms", 1).over(wU))
        .where($"gap".isNotNull)
        .agg(sum(when($"gap" > 60000L, 1L).otherwise(0L)).as("g1"),
          sum(when($"gap" > 300000L, 1L).otherwise(0L)).as("g5"),
          sum(when($"gap" > 900000L, 1L).otherwise(0L)).as("g15"),
          sum(when($"gap" > 1800000L, 1L).otherwise(0L)).as("g30"),
          sum(when($"gap" > 3600000L, 1L).otherwise(0L)).as("g60"))
      val ladder = Seq(1L, 5L, 15L, 30L, 60L).toDF("threshold_min")
      broadcast(ladder).crossJoin(broadcast(totals.crossJoin(g)))
        .select($"threshold_min",
          ($"n_users" + coalesce(when($"threshold_min" === 1, $"g1")
            .when($"threshold_min" === 5, $"g5")
            .when($"threshold_min" === 15, $"g15")
            .when($"threshold_min" === 30, $"g30")
            .otherwise($"g60"), lit(0L))).as("n_sessions"),
          $"n_events")
        .select($"threshold_min", $"n_sessions",
          expr("n_events * 10000 DIV n_sessions")
            .as("events_per_session_bp"))
        .orderBy($"threshold_min")
    })

  /** Holt–Winters additive seasonal forecast (α = β = γ = 1/2, period
    * 7) of per-type daily counts — the forecasting family's SEASONAL
    * member (SES = level, Holt = level+trend; Holt–Winters adds the
    * weekly profile, the component event volume actually has): per
    * type, the QUANTIZED INTEGER-bp three-equation fold
    *   l' = (x·10⁴ − s[i] + l + b) DIV 2
    *   b' = ((l' − l) + b) DIV 2
    *   s'[i] = ((x·10⁴ − l') + s[i]) DIV 2
    * with i = day % 7 — CALENDAR-aligned seasonality (a gap day skips
    * an observation but never rotates the profile; position-aligned
    * indexing would — the documented choice), one-step-ahead backtest
    * error e += |x·10⁴ − (l + b + s[i])| accumulated alongside. The
    * x_forecast_holt worksheet applies verbatim and is STRONGER here:
    * the three coupled recursions compound dyadic denominators even
    * faster than Holt's two, so the float spelling was never a
    * candidate — integer bp state from the start, with DELIBERATE
    * trunc on the possibly-negative operands (the SCALING signed-
    * division rule both engines share). Seeds l = x₁·10⁴, b = 0,
    * s = 0⁷ (the zero-profile seed: the first week of observations IS
    * the calibration). Envelope: daily counts ≤ 10⁵ keep every state
    * value within a small multiple of 10⁹ and e ≤ n_days·2·10⁹ ≪ 2^63.
    * Output: level/trend, the NEXT day's seasonal + forecast
    * (l + b + s[(last_day+1) % 7]), the seasonal amplitude
    * max(s) − min(s) (how much the weekly profile matters), and
    * mae_bp. DuckDB replays the identical fold over a flat 10-list
    * [l, b, s₀..s₆, e] with the x_forecast_holt seed-branch trick
    * (len(acc) = 2 detects the [day, n] seed pair); Spark folds a
    * named_struct with an array field, updated by indexed transform —
    * the pre-step acc is read throughout, so both sequential
    * spellings agree (the Holt named_struct note).
    *
    * Scale shape: one (type, day) map-side-combined aggregate, then a
    * per-type sequential fold over ≤ span-days arrays — the
    * x_forecast_holt shape with 8 more state longs.
    *
    * MULTIPLICATIVE-VARIANT BOUNDARY (documented, not shipped): the
    * multiplicative form seasonalizes by RATIO — l' depends on
    * x/s[i] and s'[i] on x/l' — so every step performs a division
    * whose quotient must feed the next step. Integer trunc there
    * compounds a bias that the additive form's subtraction does not
    * (subtraction is exact; division is not), and the mfpt
    * linearization trick has no purchase because the recursion is
    * multiplicative IN THE STATE, not a linear operator with a final
    * ratio. A float spelling fails the same dyadic-compounding
    * worksheet that killed float Holt. Teams needing multiplicative
    * seasonality log-transform the series first — which IS the
    * additive model shipped here, applied to ln(x); the boundary is
    * the model family, not the engine. */
  private val forecastHoltWinters = Q(
    "x_forecast_holt_winters",
    Some("""WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            s AS (SELECT event_type,
                    list(struct_pack(day := day, n := n) ORDER BY day) AS xs
                  FROM d GROUP BY 1),
            f AS (SELECT event_type, len(xs) AS n_days,
                    xs[len(xs)].day AS last_day,
                    list_reduce(list_transform(xs, x -> [x.day, x.n]),
                      (acc, x) -> CASE WHEN len(acc) = 2 THEN
                        [(x[2] * 10000 + acc[2] * 10000) // 2,
                         ((x[2] * 10000 + acc[2] * 10000) // 2
                           - acc[2] * 10000) // 2]
                        || list_transform(range(0, 7), j ->
                             CASE WHEN j = x[1] % 7
                             THEN (x[2] * 10000
                               - (x[2] * 10000 + acc[2] * 10000) // 2) // 2
                             ELSE CAST(0 AS BIGINT) END)
                        || [abs(x[2] * 10000 - acc[2] * 10000)]
                      ELSE
                        [(x[2] * 10000 - acc[3 + (x[1] % 7)]
                            + acc[1] + acc[2]) // 2,
                         ((x[2] * 10000 - acc[3 + (x[1] % 7)]
                            + acc[1] + acc[2]) // 2 - acc[1] + acc[2]) // 2]
                        || list_transform(range(0, 7), j ->
                             CASE WHEN j = x[1] % 7
                             THEN (x[2] * 10000
                               - (x[2] * 10000 - acc[3 + (x[1] % 7)]
                                  + acc[1] + acc[2]) // 2
                               + acc[3 + j]) // 2
                             ELSE acc[3 + j] END)
                        || [acc[10] + abs(x[2] * 10000 - acc[1] - acc[2]
                             - acc[3 + (x[1] % 7)])]
                      END) AS st
                  FROM s)
            SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
              CAST(CASE WHEN n_days = 1 THEN st[2] * 10000 ELSE st[1] END
                AS BIGINT) AS level_bp,
              CAST(CASE WHEN n_days = 1 THEN 0 ELSE st[2] END
                AS BIGINT) AS trend_bp,
              CAST(CASE WHEN n_days = 1 THEN 0
                   ELSE st[3 + ((last_day + 1) % 7)] END
                AS BIGINT) AS season_next_bp,
              CAST(CASE WHEN n_days = 1 THEN st[2] * 10000
                   ELSE st[1] + st[2] + st[3 + ((last_day + 1) % 7)] END
                AS BIGINT) AS forecast_next_bp,
              CAST(CASE WHEN n_days = 1 THEN 0
                   ELSE list_max(st[3:9]) - list_min(st[3:9]) END
                AS BIGINT) AS season_amp_bp,
              CAST(CASE WHEN n_days >= 2 THEN st[10] // (n_days - 1)
                   ELSE 0 END AS BIGINT) AS mae_bp
            FROM f ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .groupBy($"event_type", expr("unix_millis(ts) DIV 86400000").as("day"))
        .agg(count(lit(1)).as("n"))
      d.groupBy($"event_type")
        .agg(expr("sort_array(collect_list(struct(day, n)))").as("xs"))
        .select($"event_type", size($"xs").cast("long").as("n_days"),
          expr("element_at(xs, -1).day").as("last_day"),
          expr(ForecastArith.hwFoldSql)
            .as("st"))
        .select($"event_type", $"n_days",
          $"st.l".as("level_bp"), $"st.b".as("trend_bp"),
          expr("element_at(st.s, CAST((last_day + 1) % 7 AS INT) + 1)")
            .as("season_next_bp"),
          expr("st.l + st.b"
            + " + element_at(st.s, CAST((last_day + 1) % 7 AS INT) + 1)")
            .as("forecast_next_bp"),
          expr("array_max(st.s) - array_min(st.s)").as("season_amp_bp"),
          when($"n_days" >= 2, expr("st.e DIV (n_days - 1)"))
            .otherwise(0L).as("mae_bp"))
        .orderBy($"event_type")
    })

  /** Log-additive Holt–Winters — the multiplicative-seasonality answer
    * (x_forecast_holt_winters's boundary note, made executable, r16
    * verdict #3): ratio seasonality IS additive seasonality on ln(x),
    * so the shipped model is the SAME three-equation α = β = γ = 1/2
    * fold, run on x = ln(daily count) in doubles — per type,
    *   l' = (x − s[i] + l + b) / 2
    *   b' = (l' − l + b) / 2
    *   s'[i] = (x − l' + s[i]) / 2,  e += |x − l − b − s[i]|
    * with the integer query's calendar-aligned i = day % 7, zero-profile
    * seed (l = x₁, b = 0, s = 0⁷) and identical guard branches.
    *
    * FLOAT ADMISSIBILITY WORKSHEET (why doubles here when they were
    * rejected for the count-domain forecasts): in the count domain an
    * EXACT integer-bp spelling exists, so any inexact spelling is
    * strictly worse — that was the x_forecast_holt rejection. ln is
    * transcendental: no exact spelling exists and the engines' libm ln
    * may already disagree at 1 ulp per input, so the contract here is
    * the x_zipf_slope envelope instead — IDENTICAL operand trees over
    * ulp-perturbed inputs, round-4 + 0.0 at the end. Drift bound:
    * every /2 is EXACT in IEEE (exponent decrement; no subnormals at
    * |x| ≤ ln 10⁷ ≈ 16), each step's 4 adds/subs are correctly rounded,
    * and the 1/2-smoothing contracts inherited error geometrically, so
    * the cross-engine skew after n days is ≲ 4·n·ulp(16) ≈ 300 days ·
    * 4 · 1.8e-15 ≈ 2e-12 — twelve orders inside the 1e-4 rounding
    * contract (vs the count-domain case, where exactness was FREE and
    * float would have paid this bound for nothing). The seed-step
    * simplification in the oracle ((x + l₁)/2 for (x − 0 + l₁ + 0)/2)
    * is bit-exact because ±0.0 terms are IEEE-exact no-ops.
    *
    * Reading the output: everything is in LOG units (nats of daily
    * count) — season_amp_ln is the log of the weekly max/min RATIO the
    * multiplicative model would quote (exp of it = the ratio; the
    * DegenerateInputSpec pin drives a constant-ratio weekly series and
    * recovers ln of the planted ratio), trend_ln is the daily
    * growth RATE (exp − 1 ≈ week-over-week percentage growth), and
    * forecast_next_ln exponentiates to the count-scale forecast —
    * presentation steps left to the reader so the declared surface
    * stays in the domain the arithmetic is exact-by-contract in.
    *
    * Scale shape: identical to x_forecast_holt_winters — one
    * (type, day) map-side-combined aggregate (ln applied to the closed
    * count, one per rollup row), then a per-type sequential fold over
    * ≤ span-days arrays; nothing downstream depends on event volume. */
  private val forecastHwLog = Q(
    "x_forecast_hw_log",
    Some("""WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                ln(CAST(count(*) AS DOUBLE)) AS x
              FROM events GROUP BY 1, 2),
            s AS (SELECT event_type,
                    list(struct_pack(day := day, x := x) ORDER BY day) AS xs
                  FROM d GROUP BY 1),
            f AS (SELECT event_type, len(xs) AS n_days,
                    xs[len(xs)].day AS last_day,
                    list_reduce(list_transform(xs, x ->
                        [CAST(x.day AS DOUBLE), x.x]),
                      (acc, x) -> CASE WHEN len(acc) = 2 THEN
                        [(x[2] + acc[2]) / 2.0,
                         ((x[2] + acc[2]) / 2.0 - acc[2]) / 2.0]
                        || list_transform(range(0, 7), j ->
                             CASE WHEN j = CAST(x[1] AS BIGINT) % 7
                             THEN (x[2] - (x[2] + acc[2]) / 2.0) / 2.0
                             ELSE CAST(0 AS DOUBLE) END)
                        || [abs(x[2] - acc[2])]
                      ELSE
                        [(x[2] - acc[3 + (CAST(x[1] AS BIGINT) % 7)]
                            + acc[1] + acc[2]) / 2.0,
                         ((x[2] - acc[3 + (CAST(x[1] AS BIGINT) % 7)]
                            + acc[1] + acc[2]) / 2.0 - acc[1] + acc[2]) / 2.0]
                        || list_transform(range(0, 7), j ->
                             CASE WHEN j = CAST(x[1] AS BIGINT) % 7
                             THEN (x[2]
                               - (x[2] - acc[3 + (CAST(x[1] AS BIGINT) % 7)]
                                  + acc[1] + acc[2]) / 2.0
                               + acc[3 + j]) / 2.0
                             ELSE acc[3 + j] END)
                        || [acc[10] + abs(x[2] - acc[1] - acc[2]
                             - acc[3 + (CAST(x[1] AS BIGINT) % 7)])]
                      END) AS st
                  FROM s)
            SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
              round(CASE WHEN n_days = 1 THEN st[2] ELSE st[1] END, 4)
                + 0.0 AS level_ln,
              round(CASE WHEN n_days = 1 THEN 0.0 ELSE st[2] END, 4)
                + 0.0 AS trend_ln,
              round(CASE WHEN n_days = 1 THEN 0.0
                   ELSE st[3 + ((last_day + 1) % 7)] END, 4)
                + 0.0 AS season_next_ln,
              round(CASE WHEN n_days = 1 THEN st[2]
                   ELSE st[1] + st[2] + st[3 + ((last_day + 1) % 7)] END, 4)
                + 0.0 AS forecast_next_ln,
              round(CASE WHEN n_days = 1 THEN 0.0
                   ELSE list_max(st[3:9]) - list_min(st[3:9]) END, 4)
                + 0.0 AS season_amp_ln,
              round(CASE WHEN n_days >= 2 THEN st[10] / (n_days - 1)
                   ELSE 0.0 END, 4) + 0.0 AS mae_ln
            FROM f ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .groupBy($"event_type", expr("unix_millis(ts) DIV 86400000").as("day"))
        .agg(expr("ln(CAST(count(*) AS DOUBLE))").as("x"))
      d.groupBy($"event_type")
        .agg(expr("sort_array(collect_list(struct(day, x)))").as("xs"))
        .select($"event_type", size($"xs").cast("long").as("n_days"),
          expr("element_at(xs, -1).day").as("last_day"),
          expr("""aggregate(slice(xs, 2, size(xs) - 1),
                    named_struct('l', xs[0].x, 'b', CAST(0.0 AS DOUBLE),
                      's', array_repeat(CAST(0.0 AS DOUBLE), 7),
                      'e', CAST(0.0 AS DOUBLE)),
                    (acc, x) -> named_struct(
                      'l', (x.x
                        - element_at(acc.s, CAST(x.day % 7 AS INT) + 1)
                        + acc.l + acc.b) / 2.0D,
                      'b', ((x.x
                        - element_at(acc.s, CAST(x.day % 7 AS INT) + 1)
                        + acc.l + acc.b) / 2.0D - acc.l + acc.b) / 2.0D,
                      's', transform(acc.s, (v, j) ->
                        IF(j = CAST(x.day % 7 AS INT),
                           (x.x
                             - (x.x
                                - element_at(acc.s, CAST(x.day % 7 AS INT) + 1)
                                + acc.l + acc.b) / 2.0D
                             + v) / 2.0D,
                           v)),
                      'e', acc.e + abs(x.x - acc.l - acc.b
                        - element_at(acc.s, CAST(x.day % 7 AS INT) + 1))))""")
            .as("st"))
        .select($"event_type", $"n_days",
          (round($"st.l", 4) + 0.0).as("level_ln"),
          when($"n_days" === 1, 0.0)
            .otherwise(round($"st.b", 4) + 0.0).as("trend_ln"),
          when($"n_days" === 1, 0.0)
            .otherwise(round(
              expr("element_at(st.s, CAST((last_day + 1) % 7 AS INT) + 1)"),
              4) + 0.0).as("season_next_ln"),
          when($"n_days" === 1, round($"st.l", 4) + 0.0)
            .otherwise(round(expr("st.l + st.b"
              + " + element_at(st.s, CAST((last_day + 1) % 7 AS INT) + 1)"),
              4) + 0.0).as("forecast_next_ln"),
          when($"n_days" === 1, 0.0)
            .otherwise(round(expr("array_max(st.s) - array_min(st.s)"), 4)
              + 0.0).as("season_amp_ln"),
          when($"n_days" >= 2, round(expr("st.e / (n_days - 1)"), 4) + 0.0)
            .otherwise(0.0).as("mae_ln"))
        .orderBy($"event_type")
    })

  /** Weekday one-way ANOVA of daily counts — the read that JUSTIFIES
    * the forecast family's period-7 seasonal state (x_forecast_holt_
    * winters/hw_log assume a weekly profile BY DECLARATION; this
    * measures whether the corpus actually has one): per type, η² =
    * SS_between/SS_total (share of daily-count variance explained by
    * weekday — the effect size an analyst thresholds) and the fixed-
    * effects F statistic (Fisher 1925), over the same calendar-aligned
    * wd = day % 7 groups the HW fold indexes by.
    *
    * Arithmetic: every sufficient statistic is an exact int64 — per
    * (type, weekday): m_g days, S_g = Σn, Q_g = Σn²; per type: N, S,
    * Q — and the identities N·SS_total = N·Q − S², N·SS_between =
    * N·Σ_g S_g²/m_g − S², SS_within = Q − Σ_g S_g²/m_g make every
    * division TERMINAL (the x_drift_ad worksheet rule): Σ S_g²/m_g is
    * a ≤7-term double sum of exact-image int64 ratios (S_g² ≤ 9·10¹⁴
    * ≪ 2^53 at daily counts ≤ 10⁵ over ≤300 days — the FLOAT image
    * envelope, which binds ssb only), and η²/F are one rounded
    * division each, identical operand trees in both engines. The
    * INTEGER chain runs wide since r18 (DECIMAL(38,0) ↔ HUGEINT, the
    * DriftArith rule; r17 ADVICE): Q_g = Σn², wz, and the guard
    * tz = N·Q − S² — which reaches ~9·10¹⁸ ≈ 2⁶³ at the family's
    * 10⁷-events/day envelope — never wrap; both engines raise loudly
    * at the 10³⁸ decimal boundary no corpus can reach. The twin runs
    * the same tree in BigInt over its Long state arrays, whose own
    * width (Q_g at daily counts ~3·10⁹) is guarded by
    * multiplyExact/addExact — loud, schema-compatible.
    * DEGENERACY GUARDS ARE INTEGER-EXACT (the DegenerateInputSpec
    * rule — a float ≈0 test would be run-varying): SS_total = 0 ⟺
    * tz := N·Q − S² = 0 (constant series → η² = F = 0, the loud
    * no-variance sentinel) and SS_within = 0 ⟺ wz := Σ_g (m_g·Q_g −
    * S_g²) = 0 (each term ≥ 0 by Cauchy–Schwarz, so the SUM tests
    * every group at once; perfectly periodic series → η² = 1.0 with
    * F = 0 emitted as the infinite-F sentinel); k ≤ 1 or N ≤ k → F 0
    * (no between/within degrees of freedom).
    *
    * Scale shape: one calendar-bounded (type, day) aggregate, a
    * (type × ≤7) rollup, a type-cardinality final — nothing downstream
    * of the first aggregate depends on event volume. */
  private val weekdayAnova = Q(
    "x_weekday_anova",
    Some("""WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            g AS (SELECT event_type, day % 7 AS wd,
                    CAST(count(*) AS BIGINT) AS m,
                    CAST(sum(n) AS BIGINT) AS sg,
                    sum(CAST(n AS HUGEINT) * n) AS qg
                  FROM d GROUP BY 1, 2),
            a AS (SELECT event_type,
                    CAST(sum(m) AS BIGINT) AS nn,
                    CAST(count(*) AS BIGINT) AS k,
                    CAST(sum(sg) AS BIGINT) AS s,
                    sum(qg) AS q,
                    sum(CAST(sg AS DOUBLE) * sg / m) AS ssb,
                    sum(CAST(m AS HUGEINT) * qg
                      - CAST(sg AS HUGEINT) * sg) AS wz
                  FROM g GROUP BY 1),
            b AS (SELECT event_type, nn, k, s, q, ssb, wz,
                    CAST(nn AS HUGEINT) * q
                      - CAST(s AS HUGEINT) * s AS tz FROM a)
            SELECT event_type, CAST(nn AS BIGINT) AS n_days,
              CAST(k AS BIGINT) AS n_weekdays,
              round(CASE WHEN tz = 0 THEN 0.0
                ELSE (CAST(nn AS DOUBLE) * ssb - CAST(s AS DOUBLE) * s)
                  / tz END, 4) + 0.0 AS eta2,
              round(CASE WHEN tz = 0 OR wz = 0 OR k <= 1 OR nn <= k
                THEN 0.0
                ELSE (CAST(nn AS DOUBLE) * ssb - CAST(s AS DOUBLE) * s)
                  * (nn - k)
                  / (CAST(nn AS DOUBLE) * (CAST(q AS DOUBLE) - ssb)
                    * (k - 1)) END, 4) + 0.0 AS f_stat
            FROM b ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      val d = t(spark, dir, "events")
        .groupBy($"event_type", expr("unix_millis(ts) DIV 86400000").as("day"))
        .agg(count(lit(1)).as("n"))
      val g = d.groupBy($"event_type", expr("day % 7").as("wd"))
        .agg(count(lit(1)).as("m"), sum($"n").as("sg"),
          sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("qg"))
      val a = g.groupBy($"event_type")
        .agg(sum($"m").as("nn"), count(lit(1)).as("k"),
          sum($"sg").as("s"), sum($"qg").as("q"),
          sum(expr("CAST(sg AS DOUBLE) * sg / m")).as("ssb"),
          sum(expr("CAST(m AS DECIMAL(38,0)) * qg"
            + " - CAST(sg AS DECIMAL(38,0)) * sg")).as("wz"))
        .withColumn("tz", expr("CAST(nn AS DECIMAL(38,0)) * q"
          + " - CAST(s AS DECIMAL(38,0)) * s"))
      a.select($"event_type", $"nn".as("n_days"), $"k".as("n_weekdays"),
          (round(when($"tz" === 0, 0.0)
            .otherwise(expr("(CAST(nn AS DOUBLE) * ssb"
              + " - CAST(s AS DOUBLE) * s) / tz")), 4) + 0.0).as("eta2"),
          (round(when($"tz" === 0 || $"wz" === 0 ||
              $"k" <= 1 || $"nn" <= $"k", 0.0)
            .otherwise(expr("(CAST(nn AS DOUBLE) * ssb"
              + " - CAST(s AS DOUBLE) * s) * (nn - k)"
              + " / (CAST(nn AS DOUBLE) * (CAST(q AS DOUBLE) - ssb)"
              + " * (k - 1))")), 4) + 0.0).as("f_stat"))
        .orderBy($"event_type")
    })

  /** ORACLE-BACKED per-cohort retention half-life — x_retention_halflife
    * UNPOOLED: that query quotes ONE number for the whole corpus; this
    * one fits the same exponential-decay model ln(rate) = a + b·k per
    * FIRST-WEEK COHORT, which is the release-over-release question a
    * growth team actually asks ("did the week-12 cohort retain better
    * than week-11's?"). Same arithmetic discipline end-to-end: DISTINCT
    * (user, week) makes each per-offset count a distinct-user count;
    * exact integer counts until the ln; identical operand trees; every
    * emitted float round-4 **+ 0.0** (the signed-zero rule — a
    * perfectly-zero intercept rounds off a ±1e-16 residue); the m < 2
    * and non-decaying-slope guards emit 0 — the loud no-decay sentinel,
    * never a negative/infinite half-life. The LAST cohort always takes
    * the guard branch (it has no ≥1 offsets yet) and still emits its
    * size — the "too young to fit" row is information, not noise.
    *
    * Scale shape: one DISTINCT (user, week) exchange + per-user min +
    * a (cohort × ≤span-weeks)-bounded rollup + a cohort-cardinality
    * fit aggregate. Nothing downstream of the distinct depends on
    * event volume. */
  private val cohortHalflife = Q(
    "x_cohort_halflife",
    Some("""WITH a AS (SELECT DISTINCT user_id,
                         epoch_ms(ts) // 604800000 AS w FROM events),
            f AS (SELECT user_id, min(w) AS fw FROM a GROUP BY user_id),
            n0 AS (SELECT fw, CAST(count(*) AS BIGINT) AS n_users
                   FROM f GROUP BY fw),
            o AS (SELECT f.fw, a.w - f.fw AS k
                  FROM a JOIN f ON f.user_id = a.user_id
                  WHERE a.w > f.fw),
            nk AS (SELECT fw, k, CAST(count(*) AS BIGINT) AS n_k
                   FROM o GROUP BY fw, k),
            pts AS (SELECT nk.fw, CAST(k AS DOUBLE) AS x,
                      ln(CAST(n_k AS DOUBLE) / n0.n_users) AS y
                    FROM nk JOIN n0 ON n0.fw = nk.fw),
            fit AS (SELECT fw, CAST(count(*) AS BIGINT) AS m,
                      sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(x * y) AS sxy
                    FROM pts GROUP BY fw),
            w0 AS (SELECT min(w) AS w0 FROM a)
            SELECT n0.fw - w0 AS cohort_w, n0.n_users,
              CAST(coalesce(fit.m, 0) AS BIGINT) AS n_offsets,
              round(CASE WHEN fit.m >= 2
                THEN (fit.m * sxy - sx * sy) / (fit.m * sxx - sx * sx)
                ELSE 0 END, 4) + 0.0 AS slope,
              round(CASE WHEN fit.m >= 2 AND fit.m * sxy - sx * sy < 0
                THEN ln(2) * (fit.m * sxx - sx * sx) / (sx * sy - fit.m * sxy)
                ELSE 0 END, 4) + 0.0 AS half_life_w
            FROM n0 LEFT JOIN fit ON fit.fw = n0.fw
            CROSS JOIN w0 ORDER BY cohort_w"""),
    (spark, dir) => {
      import spark.implicits._
      val a = t(spark, dir, "events")
        .select($"user_id", expr("unix_millis(ts) DIV 604800000").as("w"))
        .distinct()
      val f = a.groupBy($"user_id").agg(min($"w").as("fw"))
      val n0 = f.groupBy($"fw").agg(count(lit(1)).as("n_users"))
      val pts = a.join(f, "user_id").where($"w" > $"fw")
        .groupBy($"fw", ($"w" - $"fw").as("k"))
        .agg(count(lit(1)).as("n_k"))
        .join(broadcast(n0), Seq("fw"))
        .select($"fw", $"k".cast("double").as("x"),
          log($"n_k".cast("double") / $"n_users").as("y"))
      val fit = pts.groupBy($"fw")
        .agg(count(lit(1)).as("m"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      val w0 = a.agg(min($"w").as("w0"))
      n0.join(broadcast(fit), Seq("fw"), "left")
        .crossJoin(broadcast(w0))
        .select(($"fw" - $"w0").as("cohort_w"), $"n_users",
          coalesce($"m", lit(0L)).as("n_offsets"),
          (round(when($"m" >= 2,
            expr("(m * sxy - sx * sy) / (m * sxx - sx * sx)"))
            .otherwise(0.0), 4) + 0.0).as("slope"),
          (round(when($"m" >= 2 && $"m" * $"sxy" - $"sx" * $"sy" < 0,
            expr("ln(2) * (m * sxx - sx * sx) / (sx * sy - m * sxy)"))
            .otherwise(0.0), 4) + 0.0).as("half_life_w"))
        .orderBy($"cohort_w")
    })

  /** Shared Kemeny–Snell lumpability fold — the batch x_markov_lumpable
    * tail and StreamingMarkovLumpable.verdictOf run THIS function over
    * their respective transition-count frames, so stream ≡ batch is
    * structural, not re-derived. Input c: (prev_type, next_type, n).
    *
    * The candidate partition is DECLARED (the behavioral grouping this
    * corpus's five types invite): engagement = {click, view},
    * conversion = {purchase, signup}, failure = {error}; any OTHER
    * type is its own singleton block (total on any corpus — singleton
    * blocks simply contribute no pairs). The type domain is the types
    * observed IN THE CHAIN (prev ∪ next); a state with no outgoing
    * transitions has no empirical row P(i,·) and joins no pair (the
    * stated exclusion — 0/0 rows cannot be tested for equality).
    *
    * Exactness (the SURVEY §7.6.4 documented path, now taken): strong
    * lumpability asks Σ_{j∈B'} P(i→j) = Σ_{j∈B'} P(i'→j) for every
    * same-block pair (i,i') and target block B' (Kemeny & Snell 1960,
    * Finite Markov Chains §6.3). On the EMPIRICAL chain that is a
    * rational equality s(i,B')/n(i) = s(i',B')/n(i'), cross-multiplied
    * to the integer test s(i,B')·n(i') = s(i',B')·n(i) — NO quantizer,
    * no calibrated tolerance (the objection that kept this read out
    * through r17). Cross-multiplies run wide (DECIMAL(38,0) ↔ HUGEINT,
    * the DriftArith loud-or-exact rule): eq is exact at any BIGINT
    * count; the lhs/rhs OUTPUT columns are BIGINT-wide diagnostics
    * that raise loudly (ANSI cast) past 2⁶³ ≈ n(i)·n(i') at ~3·10⁹
    * rows per type — the MW u2 precedent.
    *
    * Scale shape: everything here is K-bounded (K = chain type
    * cardinality, guarded at 256 by the family's markovState rule) —
    * a K²-bounded driver collect + local BigInt fold (the markovState
    * precedent; the relational spelling's ~8 broadcast joins were a
    * flat ~1.1 s plan-latency floor at every SF). The only
    * volume-dependent work is the caller's transition count. */
  private[graft] def lumpableFold(c: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    // K²-bounded driver fold (the markovState collect rule: the chain
    // is type-cardinality-bounded by declaration, guarded at 256 —
    // ≤ 65,536 count rows): the pair × target-block grid folds in
    // exact BigInt arithmetic on the driver instead of ~8 broadcast
    // joins of ≤K-row frames, shaving the plan-latency floor the
    // relational spelling pays at EVERY scale (measured flat ~1.1 s
    // at sf0.001→0.1 — pure stage scheduling, zero data dependence).
    // The DuckDB oracle replays the relational spelling, so the two
    // derivations hash-checking equal is itself a pin; the loud-or-
    // exact rule holds — BigInt never wraps, and the BIGINT output
    // narrowing raises (isValidLong) exactly where the old spelling's
    // ANSI cast did.
    val rows = c.selectExpr("prev_type", "next_type", "CAST(n AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = (rows.map(_._1) ++ rows.map(_._2)).distinct
    require(types.length <= 256,
      s"lumpableFold: ${types.length} chain types exceed the declared " +
        "bounded type space (the markovState 256 cap)")
    def block(t: String): String = t match {
      case "click" | "view" => "engagement"
      case "purchase" | "signup" => "conversion"
      case "error" => "failure"
      case other => other
    }
    val ni: Map[String, BigInt] = rows.groupBy(_._1)
      .map { case (i, xs) => i -> xs.map(x => BigInt(x._3)).sum }
    val bs: Map[(String, String), BigInt] = rows.groupBy(r => (r._1, block(r._2)))
      .map { case (k, xs) => k -> xs.map(x => BigInt(x._3)).sum }
    val toBlocks = types.map(block).distinct.sorted
    val typed = types.sorted.map(t => (t, block(t)))
    def narrow(v: BigInt, what: String): Long = {
      if (!v.isValidLong)
        throw new ArithmeticException(
          s"x_markov_lumpable: $what = $v exceeds the BIGINT output " +
            "width (the MW u2 rule — internal test stays exact)")
      v.toLong
    }
    val out = for {
      (i, iBlk) <- typed if ni.contains(i)
      (j, jBlk) <- typed if jBlk == iBlk && i < j && ni.contains(j)
      tb <- toBlocks
    } yield {
      val lhs = bs.getOrElse((i, tb), BigInt(0)) * ni(j)
      val rhs = bs.getOrElse((j, tb), BigInt(0)) * ni(i)
      (iBlk, i, j, tb, narrow(lhs, "lhs"), narrow(rhs, "rhs"),
        if (lhs == rhs) 1L else 0L)
    }
    out.toSeq
      .toDF("block", "state_a", "state_b", "to_block", "lhs", "rhs", "eq")
      .orderBy($"block", $"state_a", $"state_b", $"to_block")
  }

  /** ORACLE-BACKED Kemeny–Snell strong-lumpability test — the Markov
    * family's partition-validity read, closing the one "documented
    * path not taken" (SURVEY §7.6.4): CAN this corpus's behavioral
    * chain be aggregated to the declared 3-block partition
    * (engagement/conversion/failure) without losing the Markov
    * property? One row per (same-block state pair, target block) with
    * the exact cross-multiplied block sums and an eq ∈ {0,1} verdict —
    * the partition is lumpable iff every row reads eq = 1. All
    * semantics, exactness, and scale-shape notes live on
    * [[lumpableFold]], which both this query and the streaming twin
    * execute verbatim. The transition frame is the family's standard
    * one user-keyed lag window → K² count rollup (x_markov_steady's
    * spelling, (ts_us, event_id) tiebreak). */
  private val markovLumpable = Q(
    "x_markov_lumpable",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
                         epoch_us(ts) AS ts_us FROM events),
            p AS (SELECT lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id)
                    AS prev_type,
                    event_type AS next_type
                  FROM e),
            c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            ty AS (SELECT DISTINCT t FROM
                     (SELECT prev_type AS t FROM c
                      UNION SELECT next_type FROM c)),
            bm AS (SELECT t, CASE
                     WHEN t IN ('click', 'view') THEN 'engagement'
                     WHEN t IN ('purchase', 'signup') THEN 'conversion'
                     WHEN t = 'error' THEN 'failure'
                     ELSE t END AS blk FROM ty),
            tb AS (SELECT DISTINCT blk AS to_block FROM bm),
            ri AS (SELECT prev_type AS i, CAST(sum(n) AS BIGINT) AS ni
                   FROM c GROUP BY 1),
            bs AS (SELECT c.prev_type AS i, bm.blk AS tob,
                     CAST(sum(c.n) AS BIGINT) AS s
                   FROM c JOIN bm ON bm.t = c.next_type GROUP BY 1, 2),
            pr AS (SELECT ba.blk AS block, a.i AS state_a, b.i AS state_b,
                     a.ni AS na, b.ni AS nb
                   FROM ri a
                   JOIN bm ba ON ba.t = a.i
                   JOIN ri b ON a.i < b.i
                   JOIN bm bb ON bb.t = b.i AND bb.blk = ba.blk),
            g AS (SELECT pr.*, tb.to_block FROM pr CROSS JOIN tb),
            j AS (SELECT g.block, g.state_a, g.state_b, g.to_block,
                    g.na, g.nb,
                    coalesce(s1.s, 0) AS s_a, coalesce(s2.s, 0) AS s_b
                  FROM g
                  LEFT JOIN bs s1 ON s1.i = g.state_a
                    AND s1.tob = g.to_block
                  LEFT JOIN bs s2 ON s2.i = g.state_b
                    AND s2.tob = g.to_block)
            SELECT block, state_a, state_b, to_block,
              CAST(CAST(s_a AS HUGEINT) * nb AS BIGINT) AS lhs,
              CAST(CAST(s_b AS HUGEINT) * na AS BIGINT) AS rhs,
              CAST(CASE WHEN CAST(s_a AS HUGEINT) * nb
                             = CAST(s_b AS HUGEINT) * na
                        THEN 1 ELSE 0 END AS BIGINT) AS eq
            FROM j
            ORDER BY block, state_a, state_b, to_block"""),
    (spark, dir) => {
      import spark.implicits._
      val wU = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val c = t(spark, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("ts_us"))
        .withColumn("prev_type", lag($"event_type", 1).over(wU))
        .where($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("n"))
      lumpableFold(c)
    })

  def all: Seq[Q] = Seq(funnel, retention, spikes, dauRolling, eventPaths,
    userSkew, botBurst, sessionStats, valueOutliers, eventTransitions,
    attribution, changepoint, cohortLtv, autocorr, driftTvd, interarrival,
    gini, hourProfile, schemaDrift, hillTail, userOverlap, forecastSes,
    attribLinear, userSkewApproxQ, sessionStatsApproxQ, valueOutliersApproxQ,
    hazardKm, hazardKm7d, markovSteady, markovAbsorb, driftKs, driftPsi,
    markovAbsorbTo, hazardNa, driftMw, growthAccounting, forecastHolt,
    stickiness, markovReach, rfmProfile, conversionLag, valueBenford,
    driftChi2, retentionHalflife, markovMfpt, markovEntropy, driftJs,
    sessionGapSweep, forecastHoltWinters, cohortHalflife, forecastHwLog,
    driftEmd, forecastHoltDamped, driftCvm, driftAd, weekdayAnova,
    markovLumpable)
}
