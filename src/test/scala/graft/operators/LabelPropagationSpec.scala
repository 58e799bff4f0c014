package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** LabelPropagation: synchronous, fixed-round, min-label-tie LPA —
  * constructed communities, tie determinism, and driver ≡ distributed
  * regime equality (the KCore spec pattern). */
class LabelPropagationSpec extends AnyFunSuite with SparkTestBase {

  private def df(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("a", "b")
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int = 5,
      driverLimit: Long = LabelPropagation.DriverEdgeLimit): Map[Long, Long] =
    LabelPropagation.communities(df(edges), "a", "b", rounds, driverLimit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one bridge resolve to two communities") {
    // cliques {1,2,3,4} and {11,12,13,14}, bridge 4-11: within each
    // clique the min label floods (3 clique neighbors beat the single
    // bridge vote), so communities = the cliques' min ids
    val k1 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k2 = Seq((11L, 12L), (11L, 13L), (11L, 14L), (12L, 13L),
      (12L, 14L), (13L, 14L))
    val got = run(k1 ++ k2 ++ Seq((4L, 11L)))
    assert(Seq(1L, 2L, 3L).forall(got(_) == 1L),
      s"clique 1 did not flood to label 1: $got")
    assert(Seq(12L, 13L, 14L).forall(got(_) == 11L),
      s"clique 2 did not flood to label 11: $got")
    // the two bridge endpoints stay with their own cliques (3 internal
    // votes vs 1 bridge vote every round)
    assert(got(4L) == 1L && got(11L) == 11L, got.toString)
  }

  test("exact vote ties break to the SMALLEST label, synchronously") {
    // path 1-2-3: after round 1 (sync from initial labels), node 2
    // sees {1, 3} — a 1:1 tie that must break to 1; nodes 1 and 3 each
    // see only node 2 → label 2. Round 2: node 2 sees {2, 2} → 2;
    // nodes 1/3 see node 2's round-1 label 1 → 1. The exact sequence
    // is pinned for one round to catch an asynchronous (in-round)
    // update sneaking in.
    val got1 = run(Seq((1L, 2L), (2L, 3L)), rounds = 1)
    assert(got1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L), got1.toString)
    val got2 = run(Seq((1L, 2L), (2L, 3L)), rounds = 2)
    assert(got2 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L), got2.toString)
  }

  test("driver and distributed regimes agree on a seeded random graph " +
      "and on the constructed cliques") {
    val rnd = new scala.util.Random(42)
    val rand = (1 to 120).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val cliques = Seq((1L, 2L), (1L, 3L), (2L, 3L), (11L, 12L), (11L, 13L),
      (12L, 13L), (3L, 11L))
    for (edges <- Seq(rand, cliques)) {
      val viaDriver = run(edges)
      val viaDistributed = run(edges, driverLimit = 0L) // force scale path
      assert(viaDriver == viaDistributed,
        s"regimes diverged:\n driver=$viaDriver\n dist  =$viaDistributed")
    }
  }

  test("a negative driverLimit routes distributed instead of throwing " +
      "(ADVICE r14: limit(cap+1) on a negative cap was an AnalysisException)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val got = run(edges, driverLimit = -5L) // degenerate: never driver path
    assert(got == run(edges), s"negative-limit route diverged: $got")
  }

  test("self-loops and duplicate edges are canonicalized away; " +
      "string ids order lexicographically") {
    import spark.implicits._
    val edges = Seq(("b", "a"), ("a", "b"), ("b", "b"), ("b", "c"))
      .toDF("a", "b")
    val got = LabelPropagation.communities(edges, "a", "b", rounds = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // path a-b-c: round 1 → b sees {a, c} tie → "a"; a/c see b → "b";
    // round 2 → b sees {b, b} → "b", a/c see b's "a" → "a"
    assert(got == Map("a" -> "a", "b" -> "b", "c" -> "a"), got.toString)
  }

  test("string ties order by UTF-8 bytes in BOTH regimes (ADVICE r13: " +
      "UTF-16 code units would rank supplementary-plane ids differently)") {
    import spark.implicits._
    // U+FFFD (UTF-8 ef bf bd) vs U+10000 (UTF-8 f0 90 80 80): Java's
    // UTF-16 code-unit order puts the surrogate pair (0xD800…) FIRST,
    // UTF-8 byte order (= Spark's UTF8String binary order) puts U+FFFD
    // first — a real divergence, not a synonym. Path u-m-s: round 1,
    // m ties on {u, s} and must take the UTF-8 min = u.
    val u = "\uFFFD"
    val s = "\uD800\uDC00" // U+10000 as its surrogate pair
    assert(s < u, "precondition: Java String order ranks these opposite")
    val edges = Seq((u, "zzz"), ("zzz", s)).toDF("a", "b")
    def run(limit: Long): Map[String, String] =
      LabelPropagation.communities(edges, "a", "b", rounds = 1,
          driverLimit = limit)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaDriver = run(LabelPropagation.DriverEdgeLimit)
    val viaDistributed = run(0L)
    assert(viaDriver("zzz") == u,
      s"driver tie-break must be the UTF-8 min: $viaDriver")
    assert(viaDriver == viaDistributed,
      s"regimes diverged:\n driver=$viaDriver\n dist  =$viaDistributed")
  }
}
