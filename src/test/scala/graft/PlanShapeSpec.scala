package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the scale properties (pushdown, pruning,
  * broadcast, top-k short-circuit) that correctness checks can't see.
  * If one of these breaks, the query still returns the right rows — and
  * would fall over at 100 TB. */
class PlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  test("r_filter_project: predicates pushed into the parquet scan, schema pruned") {
    val p = plan("r_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate range not pushed:\n$p")
    assert(!p.contains("l_tax"), "unprojected column read from parquet")
  }

  test("dim joins broadcast; the fact side never shuffles on the join key") {
    Seq("r_join_broadcast", "r_join_multi").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q fell back to SMJ:\n$p")
    }
  }

  test("r_sort_topk plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("r_sort_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k regressed to full sort:\n$p")
  }

  test("r_agg_hash does map-side partial aggregation before its shuffle") {
    val p = plan("r_agg_hash")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"no partial aggregate below the exchange:\n$p")
  }

  test("x_sim_topk keeps the probe side broadcast (big side streams once)") {
    val p = plan("x_sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe side not broadcast:\n$p")
  }

  test("p_cold_scan limit is planned as a limit, not a full materialization") {
    val p = plan("p_cold_scan")
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"),
      s"limit not planned:\n$p")
  }
}
