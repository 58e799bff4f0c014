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

  test("regime equality on the real corpus pairs: driver loop vs the distributed branch") {
    import spark.implicits._
    // the testdata near-dup graph is small, so the public entry point
    // takes the DRIVER regime; driverLimit = 0 forces the OPERATOR'S
    // OWN distributed branch over the same pairs (the KCore pattern —
    // an inline copy of the stack would silently drift from the code
    // it claims to pin)
    val pairs = graft.SparkEntry
      .queries("x_dedup_ngram")(spark, "/root/testdata/sf0.001")
      .select($"a_id", $"b_id")
    val pub = PageRank.ranksBp(pairs, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = PageRank.ranksBp(pairs, "a_id", "b_id", driverLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pub.nonEmpty && pub == dist,
      s"driver regime diverged from the distributed branch: " +
        s"${(pub -- dist).take(3)} vs ${(dist -- pub).take(3)}")
  }

  test("distributed branch on a constructed graph matches the star closed form") {
    val got = PageRank.ranksBp(
        pairsDf(Seq((0L, 1L), (0L, 2L), (0L, 3L))), "a_id", "b_id",
        iters = 1, driverLimit = 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (3L, 27000L) && got(1L) == (1L, 4333L), got.toString)
  }

  test("property: random graphs rank identically in both regimes (ScalaCheck)") {
    // the fixed closed forms + the one corpus graph can hide regime
    // drift between their particular shapes; random multigraphs (dup
    // pairs and self-loops allowed — both regimes must treat the
    // multiset identically) pin row-for-row equality across the space
    import org.scalacheck.{Gen, rng}
    val graphGen = for {
      n <- Gen.chooseNum(50, 200)
      es <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 40L)
        b <- Gen.chooseNum(0L, 40L)
        if a != b // self-pairs would divide by zero in NO regime, but
                  // keep the generator on the documented pair contract
      } yield (a, b))
    } yield es
    val graphs = Iterator.iterate(rng.Seed(7L))(_.next).take(5)
      .map(s => graphGen.pureApply(Gen.Parameters.default, s)).toList
    graphs.zipWithIndex.foreach { case (ps, i) =>
      val pairs = pairsDf(ps)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val drv = rows(PageRank.ranksBp(pairs, "a_id", "b_id"))
      val dst = rows(PageRank.ranksBp(pairs, "a_id", "b_id", driverLimit = 0L))
      assert(drv.nonEmpty && drv == dst,
        s"graph#$i (${ps.size} pairs): regimes diverged — " +
          s"${(drv -- dst).take(3)} vs ${(dst -- drv).take(3)}")
    }
  }

  test("string-keyed pairs are rejected loudly, not silently nulled") {
    import spark.implicits._
    val strPairs = Seq(("tok_a", "tok_b")).toDF("a_id", "b_id")
    val e = intercept[IllegalArgumentException] {
      PageRank.ranksBp(strPairs, "a_id", "b_id")
    }
    assert(e.getMessage.contains("integral node ids"), e.getMessage)
  }
}
