package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Exactness of the k-core decomposition on graphs with known core
  * numbers, equality of the driver peel and the distributed h-index
  * fixpoint (the two paths KCore switches between on the edge-count
  * probe), and the invariants the rows-only x_graph_kcore query relies
  * on. */
class KCoreSpec extends AnyFunSuite with SparkTestBase {

  private def cores(forceDistributed: Boolean, pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    val limit = if (forceDistributed) 0L else KCore.DriverEdgeLimit
    KCore.coreNumbers(pairs.toDF("a", "b"), "a", "b", driverLimit = limit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)

  test("closed forms: K4, star, path, diamond, shared-node triangles, pendant") {
    for (dist <- Seq(false, true)) {
      assert(cores(dist, k4: _*) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
        s"K4 (distributed=$dist)")
      assert(cores(dist, (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
        === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
        s"star (distributed=$dist)")
      assert(cores(dist, (1L, 2L), (2L, 3L), (3L, 4L))
        === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
        s"path (distributed=$dist)")
      // diamond = 4-cycle + one chord: every node sits in a 2-core
      assert(cores(dist, (0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
        === Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L),
        s"diamond (distributed=$dist)")
      // two triangles sharing node 0: all in the 2-core despite deg(0)=4
      assert(cores(dist, (0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (3L, 4L), (4L, 0L))
        === Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L),
        s"shared-node triangles (distributed=$dist)")
      // K4 with a pendant: the tail never reaches the 3-core
      assert(cores(dist, (k4 :+ (3L, 9L)): _*)
        === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 9L -> 1L),
        s"K4+pendant (distributed=$dist)")
    }
  }

  test("duplicate, reversed and self-loop edges canonicalize away") {
    val c = cores(false, (1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L))
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("driver peel and distributed h-index agree on a real string-id graph") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the sf0.001 token-bigram graph — string node ids, organic degree
    // skew; dedupe to canonical undirected edges first
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val grams = docs.select(explode(
        expr("""filter(transform(split(lower(text), ' +'),
                  (w, i) -> struct(w AS a, try_element_at(split(lower(text), ' +'), i + 2) AS b)),
                p -> p.b IS NOT NULL AND p.a != '' AND p.b != '' AND p.a != p.b)"""))
        .as("e"))
      .select($"e.a", $"e.b").distinct()
    val drv = KCore.coreNumbers(grams, "a", "b")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dst = KCore.coreNumbers(grams, "a", "b", driverLimit = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(drv.nonEmpty && drv === dst,
      s"paths disagree: ${drv.toSet.diff(dst.toSet).take(5)} vs ${dst.toSet.diff(drv.toSet).take(5)}")

    // invariant: core(v) <= deg(v), and the max core is the degeneracy
    val deg = grams.where($"a" =!= $"b")
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b")).distinct()
      .select(explode(array($"a", $"b")).as("id"))
      .groupBy($"id").agg(count(lit(1)).as("dg"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(drv.forall { case (v, c) => c <= deg(v) })
  }

  test("property: random graphs decompose identically in both regimes (ScalaCheck)") {
    // fixed closed forms + one corpus graph can hide drift between their
    // particular shapes; random multigraphs (dups, reversals and
    // self-loops included — canonicalization is part of the contract)
    // pin row-for-row equality across the space
    import org.scalacheck.{Gen, rng}
    val graphGen = for {
      n <- Gen.chooseNum(50, 300)
      es <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 45L)
        b <- Gen.chooseNum(0L, 45L)
      } yield (a, b))
    } yield es
    val graphs = Iterator.iterate(rng.Seed(13L))(_.next).take(5)
      .map(s => graphGen.pureApply(Gen.Parameters.default, s)).toList
    graphs.zipWithIndex.foreach { case (ps, i) =>
      val drv = cores(false, ps: _*)
      val dst = cores(true, ps: _*)
      assert(drv == dst,
        s"graph#$i (${ps.size} pairs): regimes diverged — " +
          s"${drv.toSet.diff(dst.toSet).take(3)} vs ${dst.toSet.diff(drv.toSet).take(3)}")
    }
  }

  test("distributed branch leaves zero persistent RDDs after consumption") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val got = cores(true, k4 ++ Seq((3L, 4L), (4L, 5L), (9L, 10L)): _*)
    assert(got.nonEmpty)
    // h-index rounds release superseded checkpoints inline; the final
    // round's blocks release via the first-action listener (async bus)
    val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.nanoTime < deadline) Thread.sleep(50)
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"stranded ${leaked.size} RDDs: " +
        leaked.values.map(r => s"${r.id}:${r.name}").mkString(", "))
  }

  test("empty edge list yields an empty result on both paths") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(KCore.coreNumbers(empty, "a", "b").count() === 0L)
  }
}
