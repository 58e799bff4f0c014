package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live DAU/WAU stickiness — the 28th streaming twin, incremental over
  * x_stickiness: as events arrive, each user's FIRST event on a new
  * calendar day emits one "dau" hit and the first in a new calendar
  * week one "wau" hit; any counting sink then reproduces the batch
  * DAU/WAU ratio exactly.
  *
  * Why this is append-only: a distinct (user, day) / (user, week) is
  * an existence fact — later arrivals never retract it — so the
  * emissions are monotone and [[stickinessOf]] is literally the batch
  * tail over them (the [[StreamingGrowthAccounting]] dissolution
  * applied a third time). State per user is TWO longs: the current
  * calendar week and a 7-bit day-of-week mask — the mask makes
  * WITHIN-week arrival order irrelevant (any permutation of a week's
  * days yields the same hits), so the in-order contract only carries
  * week-level weight. Week = day DIV 7, day = ms DIV 86400000 — the
  * batch query's own integer arithmetic on nonnegative epochs.
  *
  * CONTRACT ENFORCEMENT (the [[StreamingGrowthAccounting]] rule): an
  * arrival with w < wk — a cross-micro-batch reorder into a PRIOR
  * week — may carry an uncounted (user, day) and silently undercount
  * DAU/WAU relative to batch; the two-long state cannot tell. Every
  * such arrival increments the accumulator [[emissions]] returns:
  * zero ⇒ the parity
  * guarantee held; nonzero ⇒ the contract was violated, loudly.
  *
  * At 100 TB: state is |users| × two longs sharded by the state
  * store; emissions are ≤ one tiny row per (user, day); the read-side
  * rollup is calendar-bounded. */
object StreamingStickiness {

  final case class WeekMask(wk: Long, mask: Long)

  final case class StickHit(cls: String, idx: Long)

  /** events: (user_id, ts_ms, event_id) — ts as epoch millis. Returns
    * the hit stream paired with its own in-order-contract accumulator
    * (the [[StreamingGrowthAccounting.emissions]] pairing rule —
    * ADVICE r16: a global handle is last-writer-wins across
    * concurrent streams in one JVM). */
  def emissions(events: DataFrame)
      : (Dataset[StickHit], org.apache.spark.util.LongAccumulator) = {
    import events.sparkSession.implicits._
    val oooAcc = events.sparkSession.sparkContext
      .longAccumulator("graft.stickiness.outOfOrderArrivals")
    val hits = events.select("user_id", "ts_ms", "event_id")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[WeekMask, StickHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[WeekMask]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[StickHit]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ms, _) =>
            val day = ms / 86400000L
            val w = day / 7L
            val bit = 1L << (day % 7L)
            if (st == null || w > st.wk) {
              out += StickHit("dau", day)
              out += StickHit("wau", w)
              st = WeekMask(w, bit)
            } else if (w == st.wk) {
              if ((st.mask & bit) == 0L) {
                out += StickHit("dau", day)
                st = st.copy(mask = st.mask | bit)
              }
            } else oooAcc.add(1L) // w < wk: cross-batch reorder, surfaced
          }
          state.update(st)
          out.iterator
      }
    (hits, oooAcc)
  }

  /** Fold a table of emissions into the batch query's full output
    * (day_idx, dau, wau, stickiness_bp) — literally the batch tail
    * over the emitted distinct-existence hits. */
  def stickinessOf(emissions: DataFrame): DataFrame = {
    def hits(c: String): DataFrame =
      emissions.where(col("cls") === c)
    val dau = hits("dau").groupBy(col("idx").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = hits("wau").groupBy(col("idx").as("wk"))
      .agg(count(lit(1)).as("wau"))
    val d0 = dau.agg(min(col("day")).as("d0"))
    dau.join(broadcast(wau), expr("day DIV 7") === col("wk"))
      .crossJoin(broadcast(d0))
      .select((col("day") - col("d0")).as("day_idx"), col("dau"),
        col("wau"), expr("dau * 10000 DIV wau").as("stickiness_bp"))
      .orderBy(col("day_idx"))
  }
}
