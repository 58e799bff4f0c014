package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a mergeable `Aggregator` — the
  * grouped-data analogue of TakeOrderedAndProject. A
  * `row_number().over(Window.partitionBy(g))` ranking shuffles EVERY
  * candidate row into one partition per group and sorts it there: with
  * a handful of groups (x_dim_error's 5 probes) parallelism collapses
  * to a few whole-corpus single-task sorts. This aggregator instead
  * keeps ≤ k entries per group in every map-side partial, so the
  * exchange carries at most k·partitions tiny rows per group and no
  * full sort ever happens.
  *
  * Ordering is (ord DESC, id ASC) — descending score with a
  * deterministic id tiebreak, the convention every ranked query in
  * this repo uses. `byA = true` orders by field `a`, else by `b`
  * (letting one groupBy compute top-k under two different metrics from
  * the same input row). State is ≤ k entries regardless of input size;
  * reduce/merge are O(k log k) with k fixed and small.
  */
object TopK {

  /** One ranked entry: id + the two metric values it carried. */
  final case class Ent(id: Long, a: Double, b: Double)

  /** Keep the k entries ranked highest by `a` (byA) or `b` (!byA),
    * ties broken by ascending id; `finish` returns them in rank order. */
  final case class TopKAgg(k: Int, byA: Boolean)
      extends Aggregator[Ent, Seq[Ent], Seq[Ent]] {

    private def ord(e: Ent): (Double, Long) = (if (byA) -e.a else -e.b, e.id)
    private def trim(s: Seq[Ent]): Seq[Ent] = s.sortBy(ord).take(k)

    override def zero: Seq[Ent] = Nil
    override def reduce(b: Seq[Ent], x: Ent): Seq[Ent] = trim(b :+ x)
    override def merge(a: Seq[Ent], b: Seq[Ent]): Seq[Ent] = trim(a ++ b)
    override def finish(r: Seq[Ent]): Seq[Ent] = trim(r)

    override def bufferEncoder: Encoder[Seq[Ent]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Ent]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
