package graft.queries

/** The exponential-smoothing family's integer-fold operand trees
  * (x_forecast_holt / x_forecast_holt_damped / x_forecast_holt_winters),
  * factored so the queries and the overflow-straddle spec drive ONE
  * shared spelling — the DriftArith discipline (r18 verdict task 5)
  * extended to the forecast folds.
  *
  * Envelope contract (SCALING.md "Arithmetic envelopes", forecast row):
  * each fold runs the level/trend/seasonal recurrence in Long basis
  * points. The documented OPERATING envelope is daily counts ≤ 10⁷
  * (state ≤ ~10¹¹ bp — five orders of headroom); the HARD boundary is
  * the x·10⁴ promotion plus the level-scale additions, which first
  * exceed 2⁶³ once a single day's count reaches ~4.6·10¹⁴ (the sum
  * x·10⁴ + l + b doubles the level term). Under the pinned ANSI mode
  * every Long overflow RAISES (SparkArithmeticException) — loud, never
  * a silent wrap; ArithmeticEnvelopeSpec drives each fold above and
  * below that boundary, observing the raise and the exact value.
  *
  * x_forecast_ses is deliberately NOT here: its fold is pure dyadic
  * DOUBLE halving of integer-born values (no ×10⁴ integer promotion),
  * so it sits in the "rounds, never wraps" float-envelope class with
  * no reachable integer boundary to straddle.
  *
  * All three strings expect the family's standard frame: a column
  * `xs` holding the per-type day-ordered daily-count array (Long for
  * holt/damped; struct<day,n> for Holt–Winters). */
object ForecastArith {

  /** Holt (α = β = 1/2) linear-trend fold: seed l = x₁·10⁴, b = 0;
    * step l' = (x·10⁴ + l + b) DIV 2, b' = (l' − l + b) DIV 2,
    * e += |x·10⁴ − l − b|. */
  val holtFoldSql: String =
    """aggregate(slice(xs, 2, size(xs) - 1),
                    named_struct('l', xs[0] * 10000L, 'b', 0L, 'e', 0L),
                    (acc, x) -> named_struct(
                      'l', (x * 10000L + acc.l + acc.b) DIV 2,
                      'b', ((x * 10000L + acc.l + acc.b) DIV 2
                            - acc.l + acc.b) DIV 2,
                      'e', acc.e + abs(x * 10000L - acc.l - acc.b)))"""

  /** Damped-trend Holt (φ = 3/4): the Holt fold with every read of b
    * damped first — (b·3) DIV 4 is one exact trunc division. */
  val dampedFoldSql: String =
    """aggregate(slice(xs, 2, size(xs) - 1),
                    named_struct('l', xs[0] * 10000L, 'b', 0L, 'e', 0L),
                    (acc, x) -> named_struct(
                      'l', (x * 10000L + acc.l + (acc.b * 3L) DIV 4) DIV 2,
                      'b', ((x * 10000L + acc.l + (acc.b * 3L) DIV 4) DIV 2
                            - acc.l + (acc.b * 3L) DIV 4) DIV 2,
                      'e', acc.e + abs(x * 10000L - acc.l
                            - (acc.b * 3L) DIV 4)))"""

  /** Additive Holt–Winters (α = β = γ = 1/2, weekly season, 7 slots):
    * xs is the day-carrying struct array (the seasonal index is
    * day MOD 7). Seed l = x₁·10⁴, b = 0, s = 0⁷; the step updates the
    * hit slot only. */
  val hwFoldSql: String =
    """aggregate(slice(xs, 2, size(xs) - 1),
                    named_struct('l', xs[0].n * 10000L, 'b', 0L,
                      's', array_repeat(0L, 7), 'e', 0L),
                    (acc, x) -> named_struct(
                      'l', (x.n * 10000L
                        - element_at(acc.s, CAST(x.day % 7 AS INT) + 1)
                        + acc.l + acc.b) DIV 2,
                      'b', ((x.n * 10000L
                        - element_at(acc.s, CAST(x.day % 7 AS INT) + 1)
                        + acc.l + acc.b) DIV 2 - acc.l + acc.b) DIV 2,
                      's', transform(acc.s, (v, j) ->
                        IF(j = CAST(x.day % 7 AS INT),
                           (x.n * 10000L
                             - (x.n * 10000L
                                - element_at(acc.s, CAST(x.day % 7 AS INT) + 1)
                                + acc.l + acc.b) DIV 2
                             + v) DIV 2,
                           v)),
                      'e', acc.e + abs(x.n * 10000L - acc.l - acc.b
                        - element_at(acc.s, CAST(x.day % 7 AS INT) + 1))))"""
}
