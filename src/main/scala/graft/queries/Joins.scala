package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group R — joins. Dimension sides are explicitly `broadcast()`-hinted;
  * the fact-fact joins shuffle on their equi-keys (the right shape at
  * 100 TB: shuffle keys are the join keys, AQE handles skew).
  */
object Joins extends QueryModule {

  /** Tiny dims: broadcast hash join, zero shuffle. */
  private val joinBroadcast = Q(
    "r_join_broadcast",
    Some("""SELECT r_name, n_name FROM nation JOIN region
            ON n_regionkey = r_regionkey ORDER BY r_name, n_name"""),
    (spark, dir) => {
      import spark.implicits._
      val nation = t(spark, dir, "nation")
      val region = broadcast(t(spark, dir, "region"))
      nation.join(region, $"n_regionkey" === $"r_regionkey")
        .select($"r_name", $"n_name")
        .orderBy($"r_name", $"n_name")
    })

  /** TPC-H q3-shaped 3-way join + aggregate. customer is broadcast-able
    * relative to lineitem⨝orders; revenue in exact DECIMAL.
    *
    * Shape: lineitem pre-aggregates BY ORDER KEY before the join — the
    * shuffle then carries one row per order instead of one per line,
    * and `n_orders` becomes a plain count (each order has exactly one
    * customer, hence one mktsegment), eliminating the count-DISTINCT
    * expand over the full joined fact table. Equivalent because every
    * per-segment measure is a sum of per-order partials; at 100 TB the
    * pre-aggregation is the difference between shuffling the fact
    * table and shuffling its order-level rollup (~4× smaller here,
    * more when orders are wide). */
  private val joinShuffle = Q(
    "r_join_shuffle",
    Some("""SELECT c_mktsegment,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
            CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
            count(*) AS n_lines
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    (spark, dir) => {
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val ord = t(spark, dir, "orders")
      val cust = broadcast(t(spark, dir, "customer"))
      val perOrder = li.groupBy($"l_orderkey")
        .agg(
          sum(money($"l_extendedprice") * (lit(1) - $"l_discount".cast("decimal(4,2)")))
            .as("o_revenue"),
          count(lit(1)).as("o_lines"))
      perOrder.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          dbl(sum($"o_revenue")).as("revenue"),
          count(lit(1)).as("n_orders"),
          sum($"o_lines").as("n_lines"))
        .orderBy($"c_mktsegment")
    })

  /** Fact-fact join served from PRE-BUCKETED tables
    * (operators/BucketedJoins): lineitem and orders are written ONCE per
    * JVM bucketed-and-sorted by order key (external tables over a cached
    * temp path — QueryModule.cachedIndex, the same once-per-JVM
    * discipline as the incremental indexes), and the join then runs with
    * NO shuffle exchange on either side — task i merge-joins bucket i
    * against bucket i (plan-pinned by PlanShapeSpec). This is the
    * PERSISTED shuffle lever r_join_shuffle pays per-query: at 100 TB,
    * tables joined repeatedly on the same key pay their exchange once at
    * ingest, and the bucketed write also pre-prunes to exactly the
    * columns the repeated join needs. Oracle-backed: bucketing changes
    * the plan, never the result — the oracle runs the plain join. */
  private val joinBucketed = Q(
    "r_join_bucketed",
    Some("""SELECT o_orderpriority,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
            count(*) AS n_lines
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (spark, dir) => {
      import spark.implicits._
      // table names + cache key carry the Spark application id: the
      // in-memory catalog dies with the SparkContext, so a fresh context
      // must re-register (re-build) its own external tables even though
      // the JVM-wide cachedIndex survives
      val stamp = s"${tableStamp(dir, "lineitem")}:${tableStamp(dir, "orders")}"
      // 64-bit SHA-256 prefix of the stamp in the table name: a 32-bit
      // String.hashCode collision between two dataset stamps in one
      // application would silently re-point the first query's catalog
      // table at different data on the second build
      def sha8(s: String): String = java.security.MessageDigest
        .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString
      val sha = sha8(stamp)
      // dir-only hash as a SEPARATE name component: the generation
      // sweep below must only ever reap THIS dir's superseded tables.
      // The stamp sha alone can't distinguish "same dir, regenerated"
      // from "different dir" — an application running two dirs (sf0.001
      // then sf0.1) would otherwise drop dir A's catalog tables while
      // dir A's cachedIndex entry stays live, failing its next
      // spark.table() analysis on data that never changed.
      val dirSha = sha8(dir)
      val tag = s"${dirSha}_${sha}_" +
        spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
      val lt = s"graft_bkt_lineitem_$tag"
      val ot = s"graft_bkt_orders_$tag"
      // cache key must NOT embed the stamp (tag carries it for table-
      // name uniqueness): keyed by (dir, app), a testdata regeneration
      // REPLACES the entry so the superseded dir is never probed again
      // (its DELETION is deferred to cachedIndex's shutdown hook — an
      // in-flight reader of the old generation must finish on valid
      // files). The prior generation's catalog tables are DROPped
      // inside the rebuild below — external-table drops remove only
      // catalog entries, never files, so that same in-flight reader
      // (already resolved to concrete file paths) is unaffected.
      val appTag = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
      QueryModule.cachedIndex(s"bucketed:$dir:$appTag", stamp) { p =>
        // NARROW RACE (same family as cachedIndex's documented
        // stamp-replacement race): a thread that computed the OLD tag
        // just before a regeneration, and whose plan has not yet
        // resolved its UnresolvedRelation when this drop runs, fails
        // analysis instead of reading the stale files. Acceptable for
        // the harness: the gate constructs and runs frames promptly,
        // and the failure is loud (AnalysisException), never wrong data.
        // scoped to the SAME dir (dirSha in the name) + this app: other
        // dirs' live tables in this application are never touched
        spark.catalog.listTables().collect().foreach { tb =>
          if ((tb.name.startsWith(s"graft_bkt_lineitem_${dirSha}_") ||
               tb.name.startsWith(s"graft_bkt_orders_${dirSha}_")) &&
              tb.name.endsWith(appTag) && tb.name != lt && tb.name != ot)
            spark.sql(s"DROP TABLE IF EXISTS ${tb.name}")
        }
        graft.operators.BucketedJoins.writeBucketed(
          t(spark, dir, "lineitem")
            .select($"l_orderkey", $"l_extendedprice", $"l_discount"),
          lt, "l_orderkey", 8, Some(s"$p/lineitem"))
        graft.operators.BucketedJoins.writeBucketed(
          t(spark, dir, "orders").select($"o_orderkey", $"o_orderpriority"),
          ot, "o_orderkey", 8, Some(s"$p/orders"))
      }
      spark.table(lt).join(spark.table(ot), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          dbl(sum(money($"l_extendedprice")
            * (lit(1) - $"l_discount".cast("decimal(4,2)")))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"o_orderpriority")
    })

  /** LEFT SEMI — customers with at least one order (EXISTS). */
  private val joinSemi = Q(
    "r_join_semi",
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "customer")
        .join(t(spark, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    })

  /** LEFT ANTI — customers with no high-value (>400k) order (NOT EXISTS;
    * anti-joining the unfiltered orders would be vacuously empty in this
    * data — every customer has some order). */
  private val joinAnti = Q(
    "r_join_anti",
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
            ORDER BY c_custkey"""),
    (spark, dir) => {
      import spark.implicits._
      val bigOrders = t(spark, dir, "orders").where($"o_totalprice" > 400000)
      t(spark, dir, "customer")
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    })

  /** Range (non-equi) self-join: pairs of events of the same user within
    * 6 hours. The equi-key (user_id) carries the shuffle; the band
    * predicate is a post-join filter. Time compared in whole milliseconds
    * so sub-ms precision never flips a boundary between engines. */
  private val joinRange = Q(
    "r_join_range",
    Some("""SELECT a.user_id, count(*) AS n_pairs
            FROM events a JOIN events b
              ON a.user_id = b.user_id AND a.event_id < b.event_id
             AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 21600000
            GROUP BY a.user_id ORDER BY a.user_id"""),
    (spark, dir) => {
      import spark.implicits._
      val ev = t(spark, dir, "events")
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
      val a = ev.as("a")
      val b = ev.as("b")
      a.join(b, $"a.user_id" === $"b.user_id" && $"a.event_id" < $"b.event_id" &&
          abs($"a.ms" - $"b.ms") <= 21600000L)
        .groupBy($"a.user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"a.user_id")
    })

  /** As-of join: for each purchase event, the latest signup event of the
    * same user at or before the purchase. Equi-join on user_id + window
    * pick of the max (ts, event_id) — the standard Spark shape (one
    * shuffle on the key, then a per-order-key window). */
  private val joinAsof = Q(
    "r_join_asof",
    Some("""SELECT p_event_id, user_id, s_event_id, s_ts_ms FROM (
              SELECT p.event_id AS p_event_id, p.user_id AS user_id,
                     s.event_id AS s_event_id, epoch_ms(s.ts) AS s_ts_ms,
                     row_number() OVER (PARTITION BY p.event_id
                       ORDER BY s.ts DESC NULLS LAST, s.event_id DESC NULLS LAST) AS rn
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
                ON s.user_id = p.user_id AND epoch_ms(s.ts) <= epoch_ms(p.ts)
            ) WHERE rn = 1 ORDER BY p_event_id"""),
    (spark, dir) => {
      import spark.implicits._
      val ev = t(spark, dir, "events")
      val p = ev.where($"event_type" === "purchase")
        .select($"event_id".as("p_event_id"), $"user_id", unix_millis($"ts").as("p_ms"))
      val s = ev.where($"event_type" === "signup")
        .select($"event_id".as("s_event_id"), $"user_id".as("s_user_id"),
          unix_millis($"ts").as("s_ts_ms"))
      val w = Window.partitionBy($"p_event_id")
        .orderBy($"s_ts_ms".desc_nulls_last, $"s_event_id".desc_nulls_last)
      p.join(s, $"user_id" === $"s_user_id" && $"s_ts_ms" <= $"p_ms", "left")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"p_event_id", $"user_id", $"s_event_id", $"s_ts_ms")
        .orderBy($"p_event_id")
    })

  /** TPC-H q5-shaped 4-way join touching every dimension depth:
    * lineitem ⨝ supplier ⨝ nation ⨝ region, revenue per region. The
    * three dim tables broadcast (supplier included — it stays millions
    * of times smaller than lineitem at any sf); lineitem never shuffles.
    */
  private val joinMulti = Q(
    "r_join_multi",
    Some("""SELECT r_name, n_name,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
            count(*) AS n_lines
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(spark, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t(spark, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          dbl(sum(money($"l_extendedprice") * (lit(1) - $"l_discount".cast("decimal(4,2)"))))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"r_name", $"n_name")
    })

  /** Skew-salted equi-join (graft.operators.SkewJoins.saltedJoin),
    * surfaced as a declared query: events join a derived per-type rank
    * dim on event_type — a key whose population is power-law skewed
    * (one type dominates), the classic case where one reducer absorbs
    * the hot key. The salt spreads each key over 8 buckets (dim
    * exploded 8×, salt = deterministic hash of event_id — reproducible,
    * no rand()); the oracle is the PLAIN join, so the hash-match IS the
    * proof that salting never changes results. Money determinism:
    * per-row floor(value*100) cents before the sum (exact int64).
    * At 100 TB this is the manual lever when AQE skew splitting can't
    * see the plan (static stages, custom sinks). */
  private val joinSalted = Q(
    "r_join_salted",
    Some("""WITH dim AS (SELECT event_type,
              CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS type_rank
              FROM (SELECT DISTINCT event_type FROM events))
            SELECT e.event_type, d.type_rank,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM events e JOIN dim d ON e.event_type = d.event_type
            GROUP BY 1, 2 ORDER BY 1"""),
    (spark, dir) => {
      import spark.implicits._
      val events = t(spark, dir, "events")
        .select($"event_type", $"event_id",
          floor($"value" * 100).cast("long").as("cents"))
      val dim = t(spark, dir, "events").select($"event_type").distinct()
        .withColumn("type_rank", row_number().over(
          Window.orderBy($"event_type")).cast("long"))
      graft.operators.SkewJoins
        .saltedJoin(events, dim, "event_type", "event_id", buckets = 8)
        .groupBy($"event_type", $"type_rank")
        .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
        .select($"event_type", $"type_rank", $"n", $"cents")
        .orderBy($"event_type")
    })

  /** LATERAL join: top-2 suppliers by balance per nation, expressed as
    * a correlated LIMIT subquery via Dataset.lateralJoin +
    * Column.outer() (Spark 4's lateral API). Catalyst decorrelates the
    * per-row subquery into a DomainJoin → window-rank plan — the
    * per-group-top-k idiom stated relationally, never executed as N
    * driver-side subqueries. The (s_acctbal DESC, s_suppkey) ordering is
    * total, so both engines pick the identical two rows per nation. */
  private val joinLateral = Q(
    "r_join_lateral",
    Some("""SELECT n.n_name, s.s_suppkey, s.s_acctbal AS bal
            FROM nation n, LATERAL (
              SELECT s_suppkey, s_acctbal FROM supplier
              WHERE s_nationkey = n.n_nationkey
              ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) s
            ORDER BY n.n_name, bal DESC, s.s_suppkey"""),
    (spark, dir) => {
      import spark.implicits._
      val topk = t(spark, dir, "supplier")
        .where($"s_nationkey" === col("n_nationkey").outer())
        .orderBy($"s_acctbal".desc, $"s_suppkey")
        .limit(2)
        .select($"s_suppkey", $"s_acctbal")
      t(spark, dir, "nation")
        .lateralJoin(topk)
        .select($"n_name", $"s_suppkey", $"s_acctbal".as("bal"))
        .orderBy($"n_name", $"bal".desc, $"s_suppkey")
    })

  override def all: Seq[Q] = Seq(joinBroadcast, joinShuffle, joinBucketed, joinSemi,
    joinAnti, joinRange, joinAsof, joinMulti, joinSalted, joinLateral)
}
