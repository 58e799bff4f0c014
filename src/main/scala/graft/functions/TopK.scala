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
    * ties broken by ascending id; `finish` returns them in rank order.
    * The buffer is allowed to grow to 2k between trims, so reduce costs
    * an amortized O(log k) sort-share per row instead of a full
    * O(k log k) sort per row — which keeps k=64 rerank stages cheap. */
  final case class TopKAgg(k: Int, byA: Boolean)
      extends Aggregator[Ent, Seq[Ent], Seq[Ent]] {

    private def ord(e: Ent): (Double, Long) = (if (byA) -e.a else -e.b, e.id)
    private def trim(s: Seq[Ent]): Seq[Ent] = s.sortBy(ord).take(k)

    override def zero: Seq[Ent] = Nil
    override def reduce(b: Seq[Ent], x: Ent): Seq[Ent] = {
      val grown = b :+ x
      if (grown.length >= 2 * k) trim(grown) else grown
    }
    override def merge(a: Seq[Ent], b: Seq[Ent]): Seq[Ent] = trim(a ++ b)
    override def finish(r: Seq[Ent]): Seq[Ent] = trim(r)

    override def bufferEncoder: Encoder[Seq[Ent]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Ent]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** One string-keyed ranked entry (token rankings etc.). */
  final case class SEnt(id: String, a: Double)

  /** String-id variant of [[TopKAgg]]: keep the k entries ranked
    * highest by `a`, ties broken by ascending id (= `(metric DESC,
    * token ASC)`, the repo's ranking convention). Same bounded-buffer
    * amortization as the Long variant. */
  final case class StrTopKAgg(k: Int)
      extends Aggregator[SEnt, Seq[SEnt], Seq[SEnt]] {

    private def ord(e: SEnt): (Double, String) = (-e.a, e.id)
    private def trim(s: Seq[SEnt]): Seq[SEnt] = s.sortBy(ord).take(k)

    override def zero: Seq[SEnt] = Nil
    override def reduce(b: Seq[SEnt], x: SEnt): Seq[SEnt] = {
      val grown = b :+ x
      if (grown.length >= 2 * k) trim(grown) else grown
    }
    override def merge(a: Seq[SEnt], b: Seq[SEnt]): Seq[SEnt] = trim(a ++ b)
    override def finish(r: Seq[SEnt]): Seq[SEnt] = trim(r)

    override def bufferEncoder: Encoder[Seq[SEnt]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[SEnt]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** Rank ANN candidates `(p_id, vec_id, <simCol>)` into the repo-wide
    * output contract `(p_id, rk, vec_id, sim_bp)` — rk 1-based by
    * (sim DESC, vec_id ASC), sim_bp = floor(sim·10000). One bounded
    * top-k aggregate per probe + a posexplode rank over the ≤ k-element
    * array; identical rows to the `row_number().over(partitionBy(p_id)
    * .orderBy(sim desc, vec_id))` formulation it replaces, without
    * shuffling the whole candidate set into n_probes partitions and
    * sorting the corpus inside each. */
  def rankBySim(cands: DataFrame, simCol: String, k: Int): DataFrame = {
    val top = udaf(TopKAgg(k, byA = true))
    cands.groupBy(col("p_id"))
      .agg(top(col("vec_id"), col(simCol), col(simCol)).as("top"))
      .select(col("p_id"), posexplode(col("top")))
      .select(col("p_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("vec_id"),
        floor(col("col.a") * 10000.0).cast("long").as("sim_bp"))
      .orderBy("p_id", "rk")
  }

  /** Candidate pruning: keep each probe's top-k ids by `<ordCol>`
    * (ties by vec_id) and emit bare `(p_id, vec_id)` — the shape the
    * ADC-scan → exact-rerank pipelines feed forward. Same bounded
    * aggregate as [[rankBySim]], no rank/score columns. */
  def pruneBySim(cands: DataFrame, ordCol: String, k: Int): DataFrame = {
    val top = udaf(TopKAgg(k, byA = true))
    cands.groupBy(col("p_id"))
      .agg(top(col("vec_id"), col(ordCol), col(ordCol)).as("top"))
      .select(col("p_id"), explode(col("top")).as("e"))
      .select(col("p_id"), col("e.id").as("vec_id"))
  }
}
