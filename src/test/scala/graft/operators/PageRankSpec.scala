package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The two-regime integer PageRank: both regimes must execute the
  * IDENTICAL recurrence (1500 + (8500·Σ rank DIV deg) DIV 10000), and
  * the closed forms on tiny graphs pin the arithmetic itself. */
class PageRankSpec extends AnyFunSuite with SparkTestBase {

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    ps.toDF("a_id", "b_id")
  }

  private def run(ps: Seq[(Long, Long)], iters: Int = 3): Map[Long, (Long, Long)] =
    PageRank.ranksBp(pairsDf(ps), "a_id", "b_id", iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("closed form: a symmetric pair converges to the fixpoint 10000") {
    // deg 1 each, rank 10000: contrib = 10000 DIV 1; next =
    // 1500 + 85000000 DIV 10000 = 10000 — stationary at every iteration
    val got = run(Seq((1L, 2L)))
    assert(got == Map(1L -> (1L, 10000L), 2L -> (1L, 10000L)), got.toString)
  }

  test("closed form: 3-star hub vs leaves after one iteration") {
    // hub 0 (deg 3), leaves 1,2,3 (deg 1). One iteration:
    // hub: s = 3 × (10000 DIV 1) = 30000 → 1500 + 255000000 DIV 10000 = 27000
    // leaf: s = 10000 DIV 3 = 3333     → 1500 + 28330500  DIV 10000 = 4333
    val got = run(Seq((0L, 1L), (0L, 2L), (0L, 3L)), iters = 1)
    assert(got(0L) == (3L, 27000L), got.toString)
    Seq(1L, 2L, 3L).foreach(l => assert(got(l) == (1L, 4333L), got.toString))
  }

  test("regime equality on the real corpus pairs: driver loop vs the distributed stack") {
    import spark.implicits._
    // the testdata near-dup graph is small, so the public entry point
    // takes the DRIVER regime; the distributed branch is exercised here
    // as the identical DataFrame stack over the same pairs (inflating
    // the pair list past the probe limit would change degrees, i.e.
    // the answer — so the scale branch is pinned by construction, not
    // by forcing the dispatch)
    val pairs = graft.SparkEntry
      .queries("x_dedup_ngram")(spark, "/root/testdata/sf0.001")
      .select($"a_id", $"b_id")
    val pub = PageRank.ranksBp(pairs, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val edges = pairs.select($"a_id".as("src"), $"b_id".as("dst"))
      .unionAll(pairs.select($"b_id".as("src"), $"a_id".as("dst")))
      .repartition($"src")
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val edgesD = edges.join(deg, "src")
    var rank = deg.select($"src".as("id"), lit(10000L).as("rank"))
    for (_ <- 1 to 3) {
      rank = edgesD.join(rank, $"src" === $"id")
        .select($"dst", expr("rank DIV deg").as("contrib"))
        .groupBy($"dst")
        .agg(sum($"contrib").as("s"))
        .select($"dst".as("id"),
          expr("CAST(1500 + (8500 * s) DIV 10000 AS BIGINT)").as("rank"))
    }
    val dist = rank.join(deg, $"id" === $"src")
      .select($"id", $"deg", $"rank".as("rank_bp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pub.nonEmpty && pub == dist,
      s"driver regime diverged from the distributed stack: " +
        s"${(pub -- dist).take(3)} vs ${(dist -- pub).take(3)}")
  }
}
