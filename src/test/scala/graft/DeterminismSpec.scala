package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must be run-to-run deterministic — the oracle
  * hash-compare assumes it (missing total ORDER BY, rand(), partition-
  * order-dependent floats would all break it silently on the driver).
  * Running each query twice and comparing row text catches the whole
  * class at once. */
class DeterminismSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("each declared query returns identical rows on repeated runs") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = fn(spark, sf).collect().map(_.toString)
      val b = fn(spark, sf).collect().map(_.toString)
      if (a.sameElements(b)) None else Some(name)
    }
    assert(bad.isEmpty, s"non-deterministic queries: $bad")
  }
}
