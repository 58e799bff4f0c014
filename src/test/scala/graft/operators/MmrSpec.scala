package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Mmr.CandIn

/** MMR selection semantics + the declared query's contract. */
class MmrSpec extends AnyFunSuite with SparkTestBase {

  // q = e1; a and c equal relevance in orthogonal "topics", b a near-dup
  // of a. After a (lowest id among the tied max), the diversity penalty
  // must prefer c over b.
  private val a = CandIn(1L, 1.0 / math.sqrt(1.25), Seq(1.0, 0.5, 0.0, 0.0))
  private val b = CandIn(2L, 1.0 / math.sqrt(1.25 + 1e-6), Seq(1.0, 0.5, 0.001, 0.0))
  private val c = CandIn(3L, 1.0 / math.sqrt(1.25), Seq(1.0, 0.0, 0.5, 0.0))

  test("near-duplicate candidate is deferred in favor of the diverse one") {
    val sel = Mmr.select(Seq(a, b, c), lambda = 0.7, k = 3)
    assert(sel.map(_.id) == Seq(1L, 3L, 2L), sel)
    // rank-1 score is pure relevance
    assert(math.abs(sel.head.score - 0.7 * a.sim) < 1e-12)
  }

  test("selection is independent of candidate input order") {
    val perms = Seq(Seq(a, b, c), Seq(c, b, a), Seq(b, a, c), Seq(c, a, b))
    val results = perms.map(p => Mmr.select(p, 0.7, 3))
    assert(results.distinct.size == 1, results)
  }

  test("x_mmr_rerank: deterministic, and rank-1 equals plain top-1 per probe") {
    val sf = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("x_mmr_rerank")
    val r1 = q(spark, sf).collect().map(_.toSeq)
    val r2 = q(spark, sf).collect().map(_.toSeq)
    assert(r1.sameElements(r2))
    val first = r1.filter(_(1) == 1L).map(r => r(0) -> r(2)).toMap
    val brute = graft.SparkEntry.queries("x_sim_topk")(spark, sf)
      .collect().filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(first == brute, s"rank-1 diverged: $first vs $brute")
  }
}
