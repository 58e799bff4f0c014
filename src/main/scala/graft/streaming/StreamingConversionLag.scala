package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live view→purchase conversion lag — the 36th streaming twin,
  * incremental over x_conversion_lag: each user emits AT MOST ONE lag
  * hit, at the moment their first strictly-after-first-view purchase
  * arrives; any counting sink plus the batch ladder tail then
  * reproduces the six-rung lag table exactly.
  *
  * Append-only by construction: under per-user in-order delivery the
  * first 'view' arrival IS min(view ms) and the first 'purchase'
  * arrival with ms > that IS the batch's min qualifying purchase, so
  * the single emitted lag is decided at emission time and never
  * revised (the [[StreamingGrowthAccounting]] dissolution — a
  * conversion is an existence fact). Users whose purchases all precede
  * their first view emit nothing, exactly the batch inner-join drop.
  * EQUAL-timestamp arrivals are order-invariant: conversion requires
  * ms STRICTLY greater than the first view, so a view and purchase
  * sharing a millisecond cannot convert regardless of arrival order
  * within the tie — the detector therefore only needs ms < lastMs.
  *
  * State per user is three longs' worth (first-view ms, a done flag,
  * last seen ms); the fold reads only 'view'/'purchase' rows (the two
  * types the batch query reads — filtered inside, so the caller can
  * hand it the raw event stream). In-order-contract violations
  * (ms < lastMs) increment the accumulator [[emissions]] returns and
  * fold nothing — surfaced, never silent.
  *
  * Trust chain: the batch x_conversion_lag is oracle-hash-matched, so
  * the parity spec's equality pins stream ≡ batch ≡ DuckDB across
  * micro-batch splits and a checkpoint restart. At 100 TB: |users| ×
  * three longs of sharded state, ≤ one emission per user EVER, and a
  * 6-row read-side ladder. */
object StreamingConversionLag {

  final case class ConvState(viewMs: Long, done: Boolean, lastMs: Long)

  final case class LagHit(lag_ms: Long)

  /** events: (user_id, event_type, ts_ms, event_id). Returns the hit
    * stream paired with its own in-order-contract accumulator (the
    * [[StreamingGrowthAccounting.emissions]] pairing rule). */
  def emissions(events: DataFrame)
      : (Dataset[LagHit], org.apache.spark.util.LongAccumulator) = {
    import events.sparkSession.implicits._
    val oooAcc = events.sparkSession.sparkContext
      .longAccumulator("graft.conversionlag.outOfOrderArrivals")
    val hits = events
      .select("user_id", "event_type", "ts_ms", "event_id")
      .where(col("event_type").isin("view", "purchase"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ConvState, LagHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[ConvState]) =>
          var st = state.getOption.getOrElse(ConvState(-1L, false, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[LagHit]
          rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, t, ms, _) =>
            if (ms < st.lastMs) {
              oooAcc.add(1L) // reorder: surfaced, never silent
            } else {
              if (t == "view" && st.viewMs < 0L)
                st = st.copy(viewMs = ms)
              else if (t == "purchase" && !st.done && st.viewMs >= 0L &&
                  ms > st.viewMs) {
                out += LagHit(ms - st.viewMs)
                st = st.copy(done = true)
              }
              st = st.copy(lastMs = ms)
            }
          }
          state.update(st)
          out.iterator
      }
    (hits, oooAcc)
  }

  /** Fold a table of emissions into the batch query's full output
    * (lag_band, n_users, share_bp, min/avg/max lag ms) — literally the
    * batch ladder tail over the emitted lags. */
  def ladderOf(emissions: DataFrame): DataFrame = {
    val n = emissions.agg(count(lit(1)).as("n_conv"))
    emissions
      .select(when(col("lag_ms") < 3600000L, 0L)
        .when(col("lag_ms") < 21600000L, 1L)
        .when(col("lag_ms") < 86400000L, 2L)
        .when(col("lag_ms") < 259200000L, 3L)
        .when(col("lag_ms") < 604800000L, 4L).otherwise(5L).as("lag_band"),
        col("lag_ms"))
      .groupBy(col("lag_band"))
      .agg(count(lit(1)).as("n_users"), min(col("lag_ms")).as("min_lag_ms"),
        // DECIMAL(38,0) lag sum — the batch query's r18 wide spelling
        sum(col("lag_ms").cast("decimal(38,0)")).as("sum_lag"),
        max(col("lag_ms")).as("max_lag_ms"))
      .crossJoin(broadcast(n))
      .select(col("lag_band"), col("n_users"),
        expr("n_users * 10000 DIV n_conv").as("share_bp"),
        col("min_lag_ms"),
        expr("CAST(sum_lag DIV n_users AS BIGINT)").as("avg_lag_ms"),
        col("max_lag_ms"))
      .orderBy(col("lag_band"))
  }
}
