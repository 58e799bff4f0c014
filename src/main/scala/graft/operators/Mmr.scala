package graft.operators

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * — the diversity stage of a retrieval serving path: from a bounded
  * candidate set, greedily pick items maximizing
  * `λ·sim(q,d) − (1−λ)·max_{s∈S} cos(d,s)` so near-duplicate
  * candidates don't crowd the result page.
  *
  * Runs per probe over the ALREADY-BOUNDED top-k candidate array
  * (≤ candidates² dot products, candidates ≤ a few dozen), so the
  * natural Spark shape is a scalar function applied after the ANN
  * stage — no extra exchange, no driver loop; the expensive part
  * (candidate generation) stays with the ANN operators.
  *
  * Deterministic: selection is (score DESC, id ASC) and each step's
  * scores depend only on the candidate SET (max over selected is
  * order-independent), so the result is stable under any input order
  * — the property MmrSpec pins.
  */
object Mmr {

  /** One candidate: id, similarity to the probe, unit-free vector. */
  final case class CandIn(id: Long, sim: Double, v: Seq[Double])

  /** One selected item: 1-based rank, id, the MMR score at selection
    * (rank 1 carries raw relevance — nothing is selected yet). */
  final case class Sel(rk: Long, id: Long, score: Double)

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy MMR over one candidate set. */
  def select(cands: Seq[CandIn], lambda: Double, k: Int): Seq[Sel] = {
    val pool = scala.collection.mutable.ArrayBuffer(cands.sortBy(c => (-c.sim, c.id)): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[Sel]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[CandIn]
    while (out.length < k && pool.nonEmpty) {
      val scored = pool.map { c =>
        val redundancy =
          if (chosen.isEmpty) 0.0
          else chosen.iterator.map(s => cos(c.v, s.v)).max
        c -> (lambda * c.sim - (1.0 - lambda) * redundancy)
      }
      val (best, score) = scored.minBy { case (c, s) => (-s, c.id) }
      out += Sel(out.length + 1L, best.id, score)
      chosen += best
      pool -= best
    }
    out.toSeq
  }
}
