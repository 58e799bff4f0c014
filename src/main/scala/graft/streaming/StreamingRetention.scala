package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live cohort retention — the incremental twin of x_retention: events
  * arrive as a stream; each user carries its cohort day (first-seen)
  * plus the set of week offsets it has already been counted in, and a
  * row is emitted exactly when a (user, week-offset) becomes active for
  * the first time. Folding the emitted stream by (cohort day, offset)
  * gives the same n_active counts as the batch query.
  *
  * State: one long (cohort day) + the set of already-emitted week
  * offsets. The set grows with CALENDAR WEEKS SINCE COHORT (52/year),
  * not with event volume, so per-user state stays tiny over any
  * realistic horizon — and no offset is ever silently dropped, which
  * keeps the streamed fold exactly equal to the batch query (a 64-bit
  * mask would diverge from x_retention past week 63). Unlike the
  * funnel, retention needs NO delivery-order assumption within a
  * week: membership in a (user, week) is order-independent, and the
  * cohort day only needs the user's first batch to contain its
  * earliest event — guaranteed by the same in-order ingest contract
  * the other live folds document.
  */
object StreamingRetention {

  /** (cohort day, already-emitted week offsets). */
  final case class RetentionState(cohortDay: Long, seen: Seq[Long])

  /** Emitted when `user_id` is first active in `off_w` (weeks since its
    * cohort day). */
  final case class WeekActive(user_id: Long, c_day: Long, off_w: Long)

  /** events: (user_id, ms). Emits one WeekActive per new (user, week). */
  def activations(events: DataFrame): Dataset[WeekActive] = {
    import events.sparkSession.implicits._
    events.select($"user_id".cast("long"), $"ms".cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, WeekActive](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[RetentionState]) =>
          val days = rows.map(_._2 / 86400000L).toSeq
          var s = state.getOption.getOrElse(
            RetentionState(days.min, Seq.empty))
          val seen = scala.collection.mutable.Set[Long](s.seen: _*)
          val out = scala.collection.mutable.ArrayBuffer.empty[WeekActive]
          days.sorted.foreach { day =>
            val off = (day - s.cohortDay) / 7L
            if (off >= 0 && seen.add(off))
              out += WeekActive(user, s.cohortDay, off)
          }
          state.update(RetentionState(s.cohortDay, seen.toSeq.sorted))
          out.iterator
      }
  }
}
