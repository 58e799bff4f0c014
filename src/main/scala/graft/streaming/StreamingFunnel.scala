package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live conversion funnel — the incremental twin of x_funnel: events
  * arrive as a stream and every user carries three numbers of state
  * (first view, first qualifying click, first qualifying purchase).
  * A row is emitted whenever a user advances a stage, so a dashboard
  * folds the emitted stream into live per-stage counts.
  *
  * Contract matches the batch query exactly — stage 2 is the first
  * `click` in (t1, t1+24 h], stage 3 the first `purchase` in
  * (t2, t2+72 h] — under the same in-order delivery assumption the
  * other live folds document (a user's later events arrive in later
  * batches; within a batch the group is sorted by timestamp before
  * folding). Greedy first-match on an ordered stream IS the min, so
  * the streaming state equals the batch min-chaining.
  *
  * State is 3 longs per user — bounded by the user population, not the
  * event volume; at cluster scale it routes to RocksDB like every
  * other stateful projection here (graft.streaming.StateStores).
  */
object StreamingFunnel {

  private val ClickWindowMs = 86400000L    // 24 h, as declared by x_funnel
  private val PurchaseWindowMs = 259200000L // 72 h

  /** (t of first view, t of first in-window click, t of first in-window
    * purchase); 0 = not reached. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  /** Emitted when `user_id` advances to `stage` (1, 2 or 3) at `ms`. */
  final case class StageAdvance(user_id: Long, stage: Int, ms: Long)

  /** events: (user_id, event_type, ms). Emits one StageAdvance per
    * stage transition. */
  def advances(events: DataFrame): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    events.select($"user_id".cast("long"), $"event_type", $"ms".cast("long"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[StageAdvance]
          rows.toSeq.sortBy(_._3).foreach { case (_, typ, ms) =>
            if (typ == "view" && s.t1 == 0L) {
              s = s.copy(t1 = ms)
              out += StageAdvance(user, 1, ms)
            } else if (typ == "click" && s.t1 != 0L && s.t2 == 0L &&
                ms > s.t1 && ms <= s.t1 + ClickWindowMs) {
              s = s.copy(t2 = ms)
              out += StageAdvance(user, 2, ms)
            } else if (typ == "purchase" && s.t2 != 0L && s.t3 == 0L &&
                ms > s.t2 && ms <= s.t2 + PurchaseWindowMs) {
              s = s.copy(t3 = ms)
              out += StageAdvance(user, 3, ms)
            }
          }
          state.update(s)
          out.iterator
      }
  }
}
