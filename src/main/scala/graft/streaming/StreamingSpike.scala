package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live rate-spike detection — the incremental twin of x_spike_detect:
  * hourly (event_type, hour, n) rollups arrive as a stream (the
  * upstream windowed count emits them as watermarks close each hour);
  * each type carries its last ≤ 6 observed hourly counts and a flag is
  * emitted the moment an hour exceeds 1.5× the trailing mean — the
  * batch query's exact integer rule (2·n·cnt > 3·sum, ≥ 3 trailing
  * observed hours), over the same ROWS-frame semantics (previous
  * OBSERVED hours; calendar gaps don't widen the window).
  *
  * State is ≤ 6 longs per event type — bounded by the type population,
  * independent of event volume and of history length.
  */
object StreamingSpike {

  final case class SpikeState(counts: Seq[Long])

  /** Emitted when `event_type`'s count at `hour_ms` breaches 1.5× its
    * trailing mean. */
  final case class SpikeFlag(
      event_type: String, hour_ms: Long, n: Long,
      trail_sum: Long, trail_cnt: Long)

  /** rollup: (event_type, hour, n) with `hour` = epoch-ms DIV 3600000.
    * In-order delivery per type (a type's later hours arrive in later
    * batches or later within the batch — same contract as the other
    * live folds; within a batch the group is sorted by hour). */
  def flags(rollup: DataFrame): Dataset[SpikeFlag] = {
    import rollup.sparkSession.implicits._
    rollup.select($"event_type", $"hour".cast("long"), $"n".cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SpikeState, SpikeFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[SpikeState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[SpikeFlag]
          rows.toSeq.sortBy(_._2).foreach { case (_, hour, n) =>
            val cnt = counts.length.toLong
            val sum = counts.sum
            if (cnt >= 3 && n * cnt * 2 > sum * 3)
              out += SpikeFlag(typ, hour * 3600000L, n, sum, cnt)
            counts = (counts :+ n).takeRight(6)
          }
          state.update(SpikeState(counts))
          out.iterator
      }
  }
}
