package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The two-regime connected components: driver union-find vs the
  * distributed min-label propagation must agree row for row (the same
  * randomized cross-regime pin PageRank/KCore carry), and the
  * distributed branch must hand its checkpoint blocks to the caller's
  * first action instead of waiting for the ContextCleaner. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkTestBase {

  private def run(ps: Seq[(Long, Long)], limit: Long): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(ps.toDF("a", "b"), "a", "b",
        driverLimit = limit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("closed forms agree in both regimes: chain, two islands, singleton pair") {
    val ps = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(run(ps, ConnectedComponents.DriverEdgeLimit) == want)
    assert(run(ps, 0L) == want)
  }

  test("property: random graphs cluster identically in both regimes (ScalaCheck)") {
    import org.scalacheck.{Gen, rng}
    val graphGen = for {
      n <- Gen.chooseNum(50, 300)
      es <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 60L)
        b <- Gen.chooseNum(0L, 60L)
      } yield (a, b))
    } yield es
    val graphs = Iterator.iterate(rng.Seed(17L))(_.next).take(4)
      .map(s => graphGen.pureApply(Gen.Parameters.default, s)).toList
    graphs.zipWithIndex.foreach { case (ps, i) =>
      val drv = run(ps, ConnectedComponents.DriverEdgeLimit)
      val dst = run(ps, 0L)
      assert(drv == dst,
        s"graph#$i (${ps.size} pairs): regimes diverged — " +
          s"${drv.toSet.diff(dst.toSet).take(3)} vs ${dst.toSet.diff(drv.toSet).take(3)}")
      // every cluster id is the min id of its member set (the keeper rule)
      drv.groupBy(_._2).foreach { case (cid, members) =>
        assert(cid == members.keys.min, s"graph#$i: cluster $cid not min-labeled")
      }
    }
  }

  test("distributed branch leaves zero persistent RDDs after consumption") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val got = run(Seq((1L, 2L), (2L, 3L), (7L, 8L)), 0L)
    assert(got.nonEmpty)
    val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.nanoTime < deadline) Thread.sleep(50)
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"stranded ${leaked.size} RDDs: " +
        leaked.values.map(r => s"${r.id}:${r.name}").mkString(", "))
  }
}
