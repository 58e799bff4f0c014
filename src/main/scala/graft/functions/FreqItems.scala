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
  * The buffer additionally carries `total` — the exact stream length N
  * — incremented on every reduce and summed on merge. The margin guard
  * N/(k+1) and the losslessness check (Σ estimates == N ⇒ no decrement
  * ever fired ⇒ counters are exact) therefore come out of the SAME
  * pass as the sketch; the query never pays a separate `count()` scan.
  *
  * State is ≤ k counters + one Long regardless of input size; merge is
  * counter union + rank-(k+1) subtraction — both bounded, both
  * associative in the guarantee (not in the exact counter values,
  * which is fine).
  */
object FreqItems {

  /** Sketch buffer: item → lower-bound count, plus the exact stream
    * length (total tokens seen across all partials). */
  final case class MGBuf(counters: Map[String, Long], total: Long)

  /** k counters; reduce/merge maintain both the MG counter set and the
    * exact total. */
  final case class MG(k: Int) extends Aggregator[String, MGBuf, MGBuf] {

    override def zero: MGBuf = MGBuf(Map.empty, 0L)

    override def reduce(b: MGBuf, item: String): MGBuf = {
      val cur = b.counters.getOrElse(item, 0L)
      val next =
        if (cur > 0L || b.counters.size < k) b.counters.updated(item, cur + 1L)
        else {
          // decrement-all step: drop zeros; the new item is NOT inserted
          b.counters.iterator.map { case (t, c) => t -> (c - 1L) }
            .filter(_._2 > 0L).toMap
        }
      MGBuf(next, b.total + 1L)
    }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val sum = (a.counters.keySet ++ b.counters.keySet).iterator
        .map(t => t -> (a.counters.getOrElse(t, 0L) + b.counters.getOrElse(t, 0L))).toMap
      val merged =
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from everything (the
          // standard mergeable-MG step: Agarwal et al., "Mergeable
          // Summaries", PODS 2012), keep strictly-positive counters
          val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
          sum.iterator.map { case (t, c) => t -> (c - cut) }
            .filter(_._2 > 0L).toMap
        }
      MGBuf(merged, a.total + b.total)
    }

    override def finish(r: MGBuf): MGBuf = r
    override def bufferEncoder: Encoder[MGBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[MGBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Run the sketch over a token Dataset in ONE pass and return both
    * the candidate set (≤ k items, lower-bound counts) and the exact
    * stream length N. Uses Dataset.select with a TypedColumn — no UDAF
    * registration needed, and the aggregate runs with partial merge. */
  def sketch(tokens: org.apache.spark.sql.Dataset[String], k: Int): (Map[String, Long], Long) = {
    import org.apache.spark.sql.functions.udaf
    val spark = tokens.sparkSession
    import spark.implicits._
    val agg = udaf(MG(k))
    val row = tokens.toDF("token")
      .agg(agg($"token").as("sketch"))
      .head().getStruct(0)
    (row.getMap[String, Long](0).toMap, row.getLong(1))
  }

  /** Candidate set only (spec-facing convenience). */
  def candidates(tokens: org.apache.spark.sql.Dataset[String], k: Int): Map[String, Long] =
    sketch(tokens, k)._1
}
