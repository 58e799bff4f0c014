package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Group R — scans, hash aggregates, grouping sets, sort/top-k, set ops.
  * All plans are declarative DataFrame code: Catalyst pushes the filters
  * and projections into the parquet scan and does partial (map-side)
  * aggregation before the single shuffle each aggregate needs.
  */
object Relational extends QueryModule {

  /** TPC-H q6-shaped scan: filter + arithmetic projection. Predicates and
    * the 4-column projection push down to the parquet reader. */
  private val filterProject = Q(
    "r_filter_project",
    Some("""SELECT l_orderkey, l_linenumber,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
            ORDER BY l_orderkey, l_linenumber"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "lineitem")
        .where($"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1997-01-01")) &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .select($"l_orderkey", $"l_linenumber",
          dbl(money($"l_extendedprice") * (lit(1) - $"l_discount".cast("decimal(4,2)")))
            .as("revenue"))
        .orderBy($"l_orderkey", $"l_linenumber")
    })

  /** TPC-H q1-shaped hash aggregate. Money sums via exact DECIMAL (order-
    * independent across partitions); quantities are whole numbers so their
    * double sums are exact too; averages derived as double divisions. */
  private val aggHash = Q(
    "r_agg_hash",
    Some("""SELECT l_returnflag, l_linestatus,
            CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc,
            CAST(floor((sum(l_quantity) * 10000.0) / count(*)) AS BIGINT) AS avg_qty_x1e4,
            count(*) AS n
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "lineitem")
        .where($"l_shipdate" <= to_timestamp(lit("2000-09-02")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").cast("double").as("sum_qty"),
          dbl(sum(money($"l_extendedprice"))).as("sum_base"),
          dbl(sum(money($"l_extendedprice") * (lit(1) - $"l_discount".cast("decimal(4,2)"))))
            .as("sum_disc"),
          floor((sum($"l_quantity") * 10000.0) / count(lit(1))).cast("long").as("avg_qty_x1e4"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag", $"l_linestatus")
    })

  /** Distinct aggregate — expands to a two-phase distinct+agg plan. */
  private val aggDistinct = Q(
    "r_agg_distinct",
    Some("""SELECT l_returnflag,
            CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
            CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_suppkey").as("n_supp"),
          countDistinct($"l_partkey").as("n_part"))
        .orderBy($"l_returnflag")
    })

  /** ROLLUP over orders; NULL grouping slots folded to '(all)' so NULL
    * ordering semantics never diverge between engines. */
  private val aggRollup = Q(
    "r_agg_rollup",
    Some("""SELECT coalesce(o_orderstatus, '(all)') AS status,
            coalesce(o_orderpriority, '(all)') AS priority,
            count(*) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            ORDER BY status, priority"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dbl(sum(money($"o_totalprice"))).as("sum_price"))
        .select(coalesce($"o_orderstatus", lit("(all)")).as("status"),
          coalesce($"o_orderpriority", lit("(all)")).as("priority"),
          $"n", $"sum_price")
        .orderBy($"status", $"priority")
    })

  /** CUBE over events on (event_type, year). */
  private val aggCube = Q(
    "r_agg_cube",
    Some("""SELECT coalesce(event_type, '(all)') AS etype,
            CAST(coalesce(year(ts), -1) AS BIGINT) AS yr,
            count(*) AS n
            FROM events GROUP BY CUBE (event_type, year(ts))
            ORDER BY etype, yr"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .withColumn("y", year($"ts"))
        .cube($"event_type", $"y")
        .agg(count(lit(1)).as("n"))
        .select(coalesce($"event_type", lit("(all)")).as("etype"),
          coalesce($"y", lit(-1)).cast("long").as("yr"), $"n")
        .orderBy($"etype", $"yr")
    })

  /** GROUPING SETS over events — expressed in SQL (the DataFrame API has
    * no direct grouping-sets builder); still a single Catalyst plan. */
  private val groupingSets = Q(
    "r_grouping_sets",
    Some("""SELECT coalesce(event_type, '(all)') AS etype,
            CAST(coalesce(user_id, -1) AS BIGINT) AS uid,
            count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ())
            ORDER BY etype, uid"""),
    (spark, dir) => {
      t(spark, dir, "events").createOrReplaceTempView("events")
      spark.sql("""SELECT coalesce(event_type, '(all)') AS etype,
        CAST(coalesce(user_id, -1) AS BIGINT) AS uid,
        count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ())
        ORDER BY etype, uid""")
    })

  /** Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    * per-partition top-20 then a tiny driver-side merge, no full sort. */
  private val sortTopk = Q(
    "r_sort_topk",
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice AS price
            FROM lineitem
            ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 20"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice".as("price"))
        .orderBy($"price".desc, $"l_orderkey", $"l_linenumber")
        .limit(20)
    })

  /** UNION / INTERSECT / EXCEPT between order-customers and event-users. */
  private val setOps = Q(
    "r_set_ops",
    Some("""WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
                 b AS (SELECT DISTINCT user_id AS k FROM events)
            SELECT 'both' AS tag, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
            UNION ALL
            SELECT 'only_events' AS tag, k FROM (SELECT k FROM b EXCEPT SELECT k FROM a)
            UNION ALL
            SELECT 'only_orders' AS tag, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
            ORDER BY tag, k"""),
    (spark, dir) => {
      import spark.implicits._
      val a = t(spark, dir, "orders").select($"o_custkey".as("k")).distinct()
      val b = t(spark, dir, "events").select($"user_id".as("k")).distinct()
      a.intersect(b).select(lit("both").as("tag"), $"k")
        .unionAll(b.except(a).select(lit("only_events").as("tag"), $"k"))
        .unionAll(a.except(b).select(lit("only_orders").as("tag"), $"k"))
        .orderBy($"tag", $"k")
    })

  /** Approximate distinct (HyperLogLog++). No value oracle — approx result
    * is engine-specific; correctness is covered by a ScalaTest tolerance
    * check against exact counts. */
  private val hllDistinct = Q(
    "x_hll_distinct",
    None,
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id").as("approx_users"))
        .orderBy($"event_type")
    })

  /** PIVOT: event counts per user fanned out to one column per stream
    * type (explicit value list → stable schema at any scale). Oracle via
    * conditional aggregation (DuckDB's PIVOT is DDL-flavored). */
  private val pivot = Q(
    "r_pivot",
    Some("""SELECT user_id,
            count(*) FILTER (WHERE event_type = 'click') AS click,
            count(*) FILTER (WHERE event_type = 'error') AS error,
            count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
            count(*) FILTER (WHERE event_type = 'signup') AS signup,
            count(*) FILTER (WHERE event_type = 'view') AS view
            FROM events GROUP BY user_id ORDER BY user_id"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    })

  /** FULL OUTER join: per-key order counts vs event counts, keys from
    * either side (nulls folded to 0 so NULL-ordering never diverges). */
  private val joinFullOuter = Q(
    "r_join_full_outer",
    Some("""SELECT coalesce(o.k, e.k) AS k,
            coalesce(o.n_orders, 0) AS n_orders,
            coalesce(e.n_events, 0) AS n_events
            FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1) o
            FULL OUTER JOIN
                 (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1) e
            ON o.k = e.k ORDER BY k"""),
    (spark, dir) => {
      import spark.implicits._
      val o = t(spark, dir, "orders").groupBy($"o_custkey".as("ok"))
        .agg(count(lit(1)).as("n_orders"))
      val e = t(spark, dir, "events").groupBy($"user_id".as("ek"))
        .agg(count(lit(1)).as("n_events"))
      o.join(e, $"ok" === $"ek", "full_outer")
        .select(coalesce($"ok", $"ek").as("k"),
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          coalesce($"n_events", lit(0L)).as("n_events"))
        .orderBy($"k")
    })

  /** Conditional scalar coverage: CASE/WHEN, coalesce, nullif,
    * least/greatest over orders. */
  private val scalarConditional = Q(
    "r_scalar_conditional",
    Some("""SELECT o_orderkey,
            CASE WHEN o_totalprice > 300000 THEN 'high'
                 WHEN o_totalprice > 100000 THEN 'mid'
                 ELSE 'low' END AS bucket,
            coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_folded,
            least(o_totalprice, 250000.0) AS capped,
            greatest(CAST(year(o_orderdate) AS BIGINT), 1996) AS yr_floor
            FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "orders")
        .where($"o_orderkey" % 10 === 0)
        .select($"o_orderkey",
          when($"o_totalprice" > 300000, "high")
            .when($"o_totalprice" > 100000, "mid")
            .otherwise("low").as("bucket"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status_folded"),
          least($"o_totalprice", lit(250000.0)).as("capped"),
          greatest(year($"o_orderdate").cast("long"), lit(1996L)).as("yr_floor"))
        .orderBy($"o_orderkey")
    })

  /** Exact interpolated percentiles (Spark `percentile` and DuckDB
    * `quantile_cont` share the (n-1)p interpolation rule; inputs are
    * whole-number quantities so the interpolation arithmetic is exact). */
  private val aggPercentile = Q(
    "r_agg_percentile",
    Some("""SELECT l_returnflag,
            round(quantile_cont(l_quantity, 0.25), 4) AS p25,
            round(quantile_cont(l_quantity, 0.5), 4) AS p50,
            round(quantile_cont(l_quantity, 0.75), 4) AS p75,
            round(quantile_cont(l_quantity, 0.9), 4) AS p90
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"))
        .orderBy($"l_returnflag")
    })

  /** Sketch-family quantiles: approx_percentile (mergeable sketch, one
    * pass, bounded memory — the 100 TB path where exact percentile's
    * per-group value buffer won't fit). No oracle (approximate);
    * QueriesSpec bounds it against the exact quantiles. */
  private val approxQuantile = Q(
    "x_approx_quantile",
    None,
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50"),
          expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("p95"))
        .orderBy($"l_returnflag")
    })

  /** Scalar subquery: orders above the global average price. Catalyst
    * plans the subquery as its own aggregate, then a literal broadcast
    * into the filter — one pass over the fact table plus one tiny agg. */
  private val subqueryScalar = Q(
    "r_subquery_scalar",
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice > 1.5 * (
              SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*) FROM orders)
            ORDER BY o_orderkey"""),
    (spark, dir) => {
      // threshold from the exact DECIMAL sum (determinism contract:
      // a raw double avg differs in the last ulps between engines and
      // partition orders, so rows near the cut could flip)
      t(spark, dir, "orders").createOrReplaceTempView("orders")
      spark.sql("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) FROM orders)
        ORDER BY o_orderkey""")
    })

  /** CORRELATED scalar subqueries (vs r_subquery_scalar's uncorrelated
    * global average): orders priced above 1.5× their OWN customer's
    * average. Declared as SQL so Catalyst's decorrelation actually runs
    * (RewriteCorrelatedScalarSubquery turns both subqueries into one
    * per-custkey aggregate join — the plan a hand-decorrelated version
    * would build, derived automatically). Exact arithmetic: prices as
    * DECIMAL-derived integer cents, the 1.5× threshold as cnt·2·price
    * > 3·sum — no float division, no cast-rounding split (Spark
    * truncates double→long, DuckDB rounds; DECIMAL first avoids both). */
  private val subqueryCorrelated = Q(
    "r_subquery_correlated",
    Some("""SELECT o_orderkey, o_custkey,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
            FROM orders o
            WHERE (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
                    * CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2
                  > (SELECT sum(CAST(CAST(i.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                     FROM orders i WHERE i.o_custkey = o.o_custkey) * 3
            ORDER BY o_orderkey"""),
    (spark, dir) => {
      t(spark, dir, "orders").createOrReplaceTempView("graft_corr_orders")
      spark.sql(
        """SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
           FROM graft_corr_orders o
           WHERE (SELECT count(*) FROM graft_corr_orders i
                  WHERE i.o_custkey = o.o_custkey)
                   * CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2
                 > (SELECT sum(CAST(CAST(i.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    FROM graft_corr_orders i WHERE i.o_custkey = o.o_custkey) * 3
           ORDER BY o_orderkey""")
    })

  /** UNPIVOT (melt): the wide per-type aggregate turned into long
    * (type, metric, value) rows via Dataset.unpivot — r_pivot's inverse,
    * closing the reshape pair. The oracle states the same melt as the
    * portable UNION ALL. */
  private val unpivot = Q(
    "r_unpivot",
    Some("""WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
                       FROM events GROUP BY 1)
            SELECT event_type, metric, val FROM (
              SELECT event_type, 'n_events' AS metric, n_events AS val FROM s
              UNION ALL
              SELECT event_type, 'n_users', n_users FROM s)
            ORDER BY event_type, metric"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"))
        .unpivot(Array($"event_type"), Array($"n_events", $"n_users"),
          "metric", "val")
        .orderBy($"event_type", $"metric")
    })

  /** Conditional (FILTER-clause) aggregation: one scan producing
    * differently-predicated aggregates side by side — the idiom that
    * replaces N filtered sub-scans with one pass (Spark plans each
    * FILTER aggregate as a conditional inside the same hash-aggregate
    * operator, so the lineitem scan happens once). Money through the
    * exact DECIMAL path; counts BIGINT. */
  private val aggFilter = Q(
    "r_agg_filter",
    Some("""SELECT l_returnflag,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
              CAST(count(*) FILTER (WHERE l_discount >= 0.05) AS BIGINT) AS n_disc,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                   FILTER (WHERE l_tax > 0.03) AS DOUBLE) AS taxed_price
            FROM lineitem
            GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          count(when($"l_quantity" >= 25, 1)).as("n_bulk"),
          count(when($"l_discount" >= 0.05, 1)).as("n_disc"),
          dbl(sum(when($"l_tax" > 0.03, money($"l_extendedprice"))))
            .as("taxed_price"))
        .orderBy($"l_returnflag")
    })

  override def all: Seq[Q] = Seq(filterProject, aggHash, aggDistinct,
    aggRollup, aggCube, groupingSets, sortTopk, setOps, hllDistinct,
    pivot, joinFullOuter, scalarConditional, aggPercentile, approxQuantile,
    subqueryScalar, subqueryCorrelated, unpivot, aggFilter)
}
