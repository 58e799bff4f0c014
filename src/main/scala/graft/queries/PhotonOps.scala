package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group P — direct relational restatements of the reference's operator
  * surface (muoncore/photon, see SURVEY.md §2.1). The `events` table plays
  * the role of the event log: `event_type` ~ stream-name, `event_id` ~
  * order-id (globally ordered ingest key, reference streams.clj:288-301),
  * `ts` ~ event-time, `props` ~ the schema-less JSON payload.
  */
object PhotonOps extends QueryModule {

  /** O1/O4/O5/O6 — cold scan: bounded replay of one stream from a
    * timestamp with a limit (reference streams.clj:340-366). The filter +
    * limit push into the parquet scan; at 100 TB the log would be
    * partitioned by stream so the stream-name predicate prunes partitions.
    */
  private val coldScan = Q(
    "p_cold_scan",
    Some("""SELECT event_id, user_id, event_type, value,
            epoch_ms(ts) AS ts_ms
            FROM events
            WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-05'
            ORDER BY event_id LIMIT 100"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .where($"event_type" === "purchase" && $"ts" >= to_timestamp(lit("2024-01-05")))
        .select($"event_id", $"user_id", $"event_type",
          $"value", unix_millis($"ts").as("ts_ms"))
        .orderBy($"event_id")
        .limit(100)
    })

  /** O14 — point lookup by the ordering key (reference streams.clj:322). */
  private val pointLookup = Q(
    "p_point_lookup",
    Some("""SELECT event_id, user_id, event_type, value,
            epoch_ms(ts) AS ts_ms
            FROM events WHERE event_id = 42 ORDER BY event_id"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .where($"event_id" === 42)
        .select($"event_id", $"user_id", $"event_type",
          $"value", unix_millis($"ts").as("ts_ms"))
        .orderBy($"event_id")
    })

  /** O11/O25 — the `__streams__` built-in projection: per-stream totals
    * (reference default_projs.clj:8-26) restated as a hash aggregate. */
  private val streamsCatalog = Q(
    "p_streams_catalog",
    Some("""SELECT event_type, count(*) AS n_events,
            epoch_ms(min(ts)) AS min_ts_ms, epoch_ms(max(ts)) AS max_ts_ms,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          unix_millis(min($"ts")).as("min_ts_ms"),
          unix_millis(max($"ts")).as("max_ts_ms"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"event_type")
    })

  /** O12 — `__security-state__` pattern: latest state per key (reference
    * default_projs.clj:28-39). Window row_number over (ts, event_id) desc;
    * shuffles once on user_id, which is the right shape at scale. */
  private val latestState = Q(
    "p_latest_state",
    Some("""SELECT user_id, event_id AS last_event_id,
            event_type AS last_type, epoch_ms(ts) AS last_ts_ms
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
            WHERE rn = 1 ORDER BY user_id"""),
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      t(spark, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"event_type".as("last_type"), unix_millis($"ts").as("last_ts_ms"))
        .orderBy($"user_id")
    })

  /** O8 — the generic projection fold with `(fn [a b] (inc a))` (reference
    * test projections.clj:71-78): a running per-key count over event-time
    * order, i.e. a window running aggregate. */
  private val foldCount = Q(
    "p_fold_count",
    Some("""SELECT user_id, event_id,
            count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
            FROM events ORDER BY user_id, event_id"""),
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(spark, dir, "events")
        .select($"user_id", $"event_id", count(lit(1)).over(w).as("running_n"))
        .orderBy($"user_id", $"event_id")
    })

  /** O13 — distinct stream names (boot catalog, reference streams.clj:164). */
  private val distinctStreams = Q(
    "p_distinct_streams",
    Some("SELECT DISTINCT event_type FROM events ORDER BY event_type"),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events").select($"event_type").distinct().orderBy($"event_type")
    })

  /** Payload introspection — the reference treats payloads as schema-less
    * JSON (doc/schemas.md:42); here: extract a typed field and filter. */
  private val jsonPayload = Q(
    "p_json_payload",
    Some("""SELECT event_id, event_type,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
            ORDER BY event_id"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .select($"event_id", $"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .where($"k" > 50)
        .orderBy($"event_id")
    })

  /** Payload promotion (SURVEY.md §1.6): parse the schema-less JSON
    * payload into a typed struct with from_json and aggregate on the
    * promoted field — the "hot field" pattern that keeps ingest
    * schema-free while giving queries typed columns. */
  private val payloadPromote = Q(
    "p_payload_promote",
    Some("""SELECT event_type,
            CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
            CAST(count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k
            FROM events GROUP BY event_type ORDER BY event_type"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .withColumn("p", from_json($"props",
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
        .groupBy($"event_type")
        .agg(sum($"p.k").cast("long").as("sum_k"),
          count($"p.k").as("n_with_k"))
        .orderBy($"event_type")
    })

  /** Time-travel state read — the event-sourcing capability photon's
    * replay-from semantics exist for: the latest-state projection AS OF
    * an arbitrary past instant, answered by replaying the log only up
    * to the cutoff (a pushed-down ms predicate + the same per-key
    * window as p_latest_state). At 100 TB a date-bucketed log layout
    * prunes every partition after the cutoff before any read. */
  private val stateAsof = Q(
    "p_state_asof",
    Some("""SELECT user_id, event_id AS last_event_id,
            event_type AS last_type, epoch_ms(ts) AS last_ts_ms
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events WHERE epoch_ms(ts) <= 1705276800000)
            WHERE rn = 1 ORDER BY user_id"""),
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      t(spark, dir, "events")
        .where(unix_millis($"ts") <= 1705276800000L)
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"event_type".as("last_type"), unix_millis($"ts").as("last_ts_ms"))
        .orderBy($"user_id")
    })

  /** O5's bounded slice: replay one stream between [from, to) — the
    * reference's from-ts subscribe with the catch-up window a consumer
    * actually asks for ("give me yesterday's clicks"), stated so BOTH
    * bounds push into the scan (p_cold_scan pins only the lower bound).
    * At 100 TB the date-bucketed log layout (eventstore/Ingest) turns
    * the ts window into partition pruning before any row is read. */
  private val streamSlice = Q(
    "p_stream_slice",
    Some("""SELECT event_id, user_id, value, epoch_ms(ts) AS ts_ms
            FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-03'
              AND ts < TIMESTAMP '2024-01-10'
            ORDER BY event_id LIMIT 200"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .where($"event_type" === "click" &&
          $"ts" >= to_timestamp(lit("2024-01-03")) &&
          $"ts" < to_timestamp(lit("2024-01-10")))
        .select($"event_id", $"user_id", $"value",
          unix_millis($"ts").as("ts_ms"))
        .orderBy($"event_id")
        .limit(200)
    })

  /** O11/O24's per-stream schema read, relationally: for every
    * (stream, top-level payload key), how many events carry the key and
    * its presence share — the point-in-time schema-by-stream catalog
    * the reference infers statistically (handler.clj:256-263,
    * SchemaInfer is the engine-side sampled twin; x_schema_drift is the
    * same read over time). One json-keys explode into a
    * (streams × keys)-bounded aggregate; per-stream totals broadcast
    * back. All integer. */
  private val schemaKeys = Q(
    "p_schema_keys",
    Some("""WITH t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
                       FROM events GROUP BY 1),
            k AS (SELECT event_type, unnest(json_keys(props)) AS key
                  FROM events),
            kc AS (SELECT event_type, key, CAST(count(*) AS BIGINT) AS n
                   FROM k GROUP BY 1, 2)
            SELECT kc.event_type, kc.key, kc.n,
              CAST((kc.n * 10000) // t.n_events AS BIGINT) AS share_bp
            FROM kc JOIN t ON t.event_type = kc.event_type
            ORDER BY kc.event_type, kc.key"""),
    (spark, dir) => {
      import spark.implicits._
      val ev = t(spark, dir, "events")
      val tot = ev.groupBy($"event_type".as("t_type"))
        .agg(count(lit(1)).as("n_events"))
      ev.select($"event_type", explode(expr("json_object_keys(props)")).as("key"))
        .groupBy($"event_type", $"key")
        .agg(count(lit(1)).as("n"))
        .join(broadcast(tot), $"t_type" === $"event_type")
        .select($"event_type", $"key", $"n",
          expr("(n * 10000) DIV n_events").as("share_bp"))
        .orderBy($"event_type", $"key")
    })

  override def all: Seq[Q] = Seq(coldScan, pointLookup, streamsCatalog,
    latestState, foldCount, distinctStreams, jsonPayload, payloadPromote,
    stateAsof, streamSlice, schemaKeys)
}
