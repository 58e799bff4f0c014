package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live bot-burstiness screening — the incremental twin of x_bot_burst:
  * as events stream in, each user's inter-event gaps accumulate into
  * (n_gaps, n_burst, min_gap_ms) running totals and an updated snapshot
  * row is emitted for every user that gained a gap in the batch. The
  * burst rule is the batch query's exact integer arithmetic (gap <
  * 600000 ms, burst_bp = n_burst·10000 DIV n_gaps), so the final
  * snapshot per user is bit-identical to the batch aggregate.
  *
  * State is FOUR longs per user (last event ms + three counters) —
  * bounded by the user population, independent of event volume; the
  * abuse case x_bot_burst screens for (a bot firing millions of events)
  * grows state not at all.
  *
  * In-order delivery per user across batches (same contract as the
  * other live folds); within a batch the group is sorted by
  * (ms, event_id) — the batch window's exact order.
  */
object StreamingBurst {

  final case class BurstState(
      lastMs: Long, nGaps: Long, nBurst: Long, minGap: Long)

  /** Running per-user snapshot; the latest row per user equals the
    * batch x_bot_burst aggregate over the same prefix of events. */
  final case class BurstStat(
      user_id: Long, n_gaps: Long, n_burst: Long, min_gap_ms: Long,
      burst_bp: Long)

  /** events: (user_id, event_id, ms) — ms = epoch millis. */
  def stats(events: DataFrame): Dataset[BurstStat] = {
    import events.sparkSession.implicits._
    events.select($"user_id".cast("long"), $"event_id".cast("long"),
        $"ms".cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BurstState, BurstStat](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[BurstState]) =>
          var s = state.getOption.getOrElse(
            BurstState(Long.MinValue, 0L, 0L, Long.MaxValue))
          val before = s.nGaps
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, ms) =>
            if (s.lastMs != Long.MinValue) {
              val gap = ms - s.lastMs
              s = BurstState(ms, s.nGaps + 1L,
                s.nBurst + (if (gap < 600000L) 1L else 0L),
                math.min(s.minGap, gap))
            } else s = s.copy(lastMs = ms)
          }
          state.update(s)
          if (s.nGaps > before)
            Iterator.single(BurstStat(user, s.nGaps, s.nBurst, s.minGap,
              s.nBurst * 10000L / s.nGaps))
          else Iterator.empty
      }
  }
}
