package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live growth accounting — the 25th streaming twin, incremental over
  * x_growth_accounting: as events arrive, each user's FIRST event in a
  * new calendar week emits exactly one classification — "new" (first
  * week ever), "retained" (also active the immediately-previous week)
  * or "resurrected" (active before, but not last week) — and any
  * counting sink then reproduces the batch decomposition exactly.
  *
  * Why this is append-only with NO retraction machinery: a week-w
  * classification depends only on the user's activity in weeks < w, so
  * later arrivals can never flip it (the batch lag window reads the
  * same past-only evidence). The two batch columns that DO look
  * retraction-laden — n_churned(w) and the quick ratio — are not
  * emitted per event at all: churned(w) ≡ active(w−1) − retained(w)
  * (the users who were there last week and didn't come back), both
  * terms already in the weekly counts, so [[growthOf]] derives them at
  * read — the same conservation-law dissolution as
  * [[StreamingAbsorbMass]]'s n_end ≡ arrivals − n_out.
  *
  * State per user is TWO week numbers ([[StreamingPaths]]'s
  * constant-bytes discipline); in-order delivery per user is the same
  * contract as the other live folds, with each micro-batch's group
  * sorted by (ts_ms, event_id) before folding. Week = ms DIV
  * 604800000 with the batch query's own trunc division (corpus
  * timestamps are post-epoch; a pre-1970 stream would need floorDiv in
  * BOTH engines — the SCALING trunc rule).
  *
  * CONTRACT ENFORCEMENT (ADVICE r15): under in-order delivery a
  * user's week sequence is non-decreasing, so ANY arrival with
  * w < lastW is a cross-micro-batch reorder — and if it carries the
  * user's only activity for an uncounted mid-span week, the stream
  * silently undercounts that (user, week) relative to batch. The
  * two-long state cannot distinguish that case from a benign repeat
  * of an already-counted week, so the fold counts EVERY w < lastW
  * arrival in the accumulator [[emissions]] returns — a loud upper
  * bound: zero means the parity guarantee held exactly; nonzero
  * means the in-order contract was violated and parity is void until
  * re-fed in order. (Task retries can inflate the count — it is a
  * violation DETECTOR, not a metric; the parity claim needs only
  * zero/nonzero.)
  *
  * Trust chain: the batch x_growth_accounting is oracle-hash-matched,
  * so the parity spec's equality pins stream ≡ batch ≡ DuckDB for the
  * full weekly decomposition across micro-batch splits and a
  * checkpoint restart. At 100 TB: state is |users| × two longs
  * (flatMapGroupsWithState shards it across executors); emissions are
  * ≤ one tiny row per (user, week) into whatever counting sink the
  * deployment already runs. */
object StreamingGrowthAccounting {

  final case class WeekSpan(firstW: Long, lastW: Long)

  final case class GrowthHit(cls: String, w: Long)

  /** events: (user_id, ts_ms, event_id) — ts as epoch millis.
    *
    * Returns the hit stream PAIRED with its freshly-created
    * in-order-contract accumulator (the detector the fold increments
    * on every w < lastW arrival — the class doc's CONTRACT
    * ENFORCEMENT paragraph). Paired-per-call, not a shared handle
    * (ADVICE r16): a last-writer-wins global Option meant two
    * concurrent streams in one JVM could read the OTHER query's
    * zero/nonzero parity signal; here each caller owns exactly the
    * accumulator its own fold writes. */
  def emissions(events: DataFrame)
      : (Dataset[GrowthHit], org.apache.spark.util.LongAccumulator) = {
    import events.sparkSession.implicits._
    val oooAcc = events.sparkSession.sparkContext
      .longAccumulator("graft.growth.outOfOrderArrivals")
    val hits = events.select("user_id", "ts_ms", "event_id")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[WeekSpan, GrowthHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[WeekSpan]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[GrowthHit]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ms, _) =>
            val w = ms / 604800000L
            if (st == null) {
              out += GrowthHit("new", w); st = WeekSpan(w, w)
            } else if (w > st.lastW) {
              out += GrowthHit(
                if (st.lastW == w - 1) "retained" else "resurrected", w)
              st = st.copy(lastW = w)
            } else if (w < st.lastW) {
              // in-order weeks are non-decreasing: this is a reorder
              // across micro-batches — surfaced, never silent (ADVICE
              // r15). w == lastW stays the benign same-week repeat.
              oooAcc.add(1L)
            }
          }
          state.update(st)
          out.iterator
      }
    (hits, oooAcc)
  }

  /** Fold a table of emissions into the batch query's full output
    * (week_idx, n_active, n_new, n_retained, n_resurrected, n_churned,
    * quick_ratio_bp) — literally the batch tail over the emitted
    * classifications, churned via the conservation identity. */
  def growthOf(emissions: DataFrame): DataFrame = {
    def n(c: String): Column =
      sum(when(col("cls") === c, 1L).otherwise(0L))
    val weekly = emissions.groupBy(col("w"))
      .agg(count(lit(1)).as("n_active"), n("new").as("n_new"),
        n("retained").as("n_retained"),
        n("resurrected").as("n_resurrected"))
    val w0 = weekly.agg(min(col("w")).as("w0"))
    weekly
      .withColumn("n_churned",
        coalesce(lag(col("n_active"), 1).over(Window.orderBy(col("w"))),
          lit(0L)) - col("n_retained"))
      .crossJoin(broadcast(w0))
      .select((col("w") - col("w0")).as("week_idx"), col("n_active"),
        col("n_new"), col("n_retained"), col("n_resurrected"),
        col("n_churned"),
        when(col("n_churned") > 0,
          expr("(n_new + n_resurrected) * 10000 DIV n_churned"))
          .otherwise(0L).as("quick_ratio_bp"))
      .orderBy(col("week_idx"))
  }
}
