package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live twin of x_forecast_hw_log — the 40th, closing the forecast
  * family's live side completely (SES / Holt / damped / HW / HW-log
  * each have a twin): the log-additive Holt–Winters double state
  * folded over the daily count stream, emitting the multiplicative-
  * seasonality read (ratio amplitude, growth rate) live.
  *
  * The batch fold is sequential-per-type IEEE doubles with identical
  * operand trees, and this twin executes the SAME operand trees in
  * the same order (x = ln(n), the three half-smoothing equations,
  * /2 exact), so the raw state is bit-identical to the batch
  * aggregate's at any batch split; emissions round-4 (HALF_UP, the
  * functions.round rule) exactly where the batch projects, so the
  * last emission per type EQUALS the oracle-hash-matched batch row —
  * stream ≡ batch ≡ DuckDB, carried into the float domain. Seed
  * reproduces the n_days = 1 guard branch (trend/seasonal/mae emitted
  * as literal 0.0, level = forecast = ln x₁ — the batch's own
  * branch values).
  *
  * CONTRACT ENFORCEMENT (the [[StreamingHoltWinters]] rule): day ≤
  * lastDay arrivals increment the accumulator [[levels]] returns and
  * fold/emit NOTHING — a silent fold would corrupt the seasonal
  * profile permanently. */
object StreamingHwLog {

  final case class HwLogState(l: Double, b: Double, s: Array[Double],
      e: Double, nDays: Long, lastDay: Long)

  final case class HwLogPoint(event_type: String, day: Long, n_days: Long,
      level_ln: Double, trend_ln: Double, season_next_ln: Double,
      forecast_next_ln: Double, season_amp_ln: Double, mae_ln: Double)

  private def r4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** rollup: (event_type, day, n) with `day` = epoch-ms DIV 86400000.
    * Returns the emission stream paired with its in-order-contract
    * accumulator. */
  def levels(rollup: DataFrame)
      : (Dataset[HwLogPoint], org.apache.spark.util.LongAccumulator) = {
    import rollup.sparkSession.implicits._
    val oooAcc = rollup.sparkSession.sparkContext
      .longAccumulator("graft.hwlog.outOfOrderArrivals")
    val points = rollup
      .select($"event_type", $"day".cast("long"), $"n".cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HwLogState, HwLogPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[HwLogState]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[HwLogPoint]
          def emit(day: Long): Unit = {
            if (st.nDays == 1L)
              out += HwLogPoint(typ, day, 1L, r4(st.l), 0.0, 0.0,
                r4(st.l), 0.0, 0.0)
            else {
              val sn = st.s(((day + 1L) % 7L).toInt)
              out += HwLogPoint(typ, day, st.nDays, r4(st.l), r4(st.b),
                r4(sn), r4(st.l + st.b + sn), r4(st.s.max - st.s.min),
                r4(st.e / (st.nDays - 1L)))
            }
          }
          rows.toSeq.sortBy(_._2).foreach { case (_, day, n) =>
            val x = math.log(n.toDouble)
            if (st == null) {
              st = HwLogState(x, 0.0, Array.fill(7)(0.0), 0.0, 1L, day)
              emit(day)
            } else if (day > st.lastDay) {
              val i = (day % 7L).toInt
              val l2 = (x - st.s(i) + st.l + st.b) / 2.0
              val b2 = (l2 - st.l + st.b) / 2.0
              val e2 = st.e + math.abs(x - st.l - st.b - st.s(i))
              val s2 = st.s.clone()
              s2(i) = (x - l2 + st.s(i)) / 2.0
              st = HwLogState(l2, b2, s2, e2, st.nDays + 1L, day)
              emit(day)
            } else {
              oooAcc.add(1L) // reorder/duplicate: surfaced, never silent
            }
          }
          state.update(st)
          out.iterator
      }
    (points, oooAcc)
  }
}
