package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch (Misra & Gries 1982; the "frequent"
  * algorithm, a.k.a. space-saving's deterministic cousin) as a mergeable
  * Spark `Aggregator` — the frequency member of the sketch family next
  * to HLL (cardinality), approx_percentile (quantiles) and the bloom
  * sketch (membership).
  *
  * Guarantee (holds under ANY partitioning/merge order): every item
  * with true count > N/(k+1) is present in the final counter set, and
  * each kept counter undercounts by at most N/(k+1). The counter set
  * itself may differ with merge order — which is why the query layer
  * (x_freq_items) treats the sketch as a CANDIDATE GENERATOR and runs
  * an exact rescoring pass over the ≤ k candidates: the final top-m is
  * exact (and thus oracle-checkable) whenever the true m-th count
  * clears the N/(k+1) bound — trivially true on these corpora and the
  * condition a production use sizes k for.
  *
  * State is ≤ k counters regardless of input size; merge is counter
  * union + rank-(k+1) subtraction — both bounded, both associative in
  * the guarantee (not in the exact counter values, which is fine).
  */
object FreqItems {

  /** k counters; state maps item → lower-bound count. */
  final case class MG(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
      val cur = b.getOrElse(item, 0L)
      if (cur > 0L || b.size < k) b.updated(item, cur + 1L)
      else {
        // decrement-all step: drop zeros; the new item is NOT inserted
        b.iterator.map { case (t, c) => t -> (c - 1L) }
          .filter(_._2 > 0L).toMap
      }
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything (the
        // standard mergeable-MG step: Agarwal et al., "Mergeable
        // Summaries", PODS 2012), keep strictly-positive counters
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        sum.iterator.map { case (t, c) => t -> (c - cut) }
          .filter(_._2 > 0L).toMap
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Run the sketch over a token Dataset and return the candidate set
    * (≤ k items). Uses Dataset.select with a TypedColumn — no UDAF
    * registration needed, and the aggregate runs with partial merge. */
  def candidates(tokens: org.apache.spark.sql.Dataset[String], k: Int): Map[String, Long] = {
    import org.apache.spark.sql.functions.udaf
    val spark = tokens.sparkSession
    import spark.implicits._
    val agg = udaf(MG(k))
    tokens.toDF("token")
      .agg(agg($"token").as("sketch"))
      .head().getMap[String, Long](0).toMap
  }
}
