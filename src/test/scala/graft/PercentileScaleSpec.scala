package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB percentile story as executable code (QueryModule.pct):
  * four queries buffer exact per-group percentile arrays
  * (x_user_skew, x_session_stats, x_value_outliers, x_doc_diversity);
  * each exposes an approx_percentile twin whose aggregation state is
  * constant per group. This spec pins the swap's calibration:
  *
  * - schema parity and parity of every column NOT derived from a
  *   percentile (counts, maxes, keys) — the twin is the same query;
  * - rank-exactness at gate scale where the base distribution is
  *   cheaply recomputable: the approx value must be one of the two
  *   order statistics the exact interpolated percentile lies between
  *   (accuracy=10000 ⇒ rank error < 1 for groups ≤ 10000 values —
  *   the sketch's only remaining deviation is that it never
  *   interpolates);
  * - bounded drift of the percentile-derived screen columns.
  */
class PercentileScaleSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** The two order statistics around the exact interpolated p-quantile
    * of `vals` (sorted ascending): v[floor(h)], v[ceil(h)], h=p(N-1). */
  private def bracket(vals: Array[Double], p: Double): (Double, Double) = {
    val s = vals.sorted
    val h = p * (s.length - 1)
    (s(math.floor(h).toInt), s(math.ceil(h).toInt))
  }

  test("x_user_skew twin: non-pct parity; p50/p99 are the exact rank neighbours") {
    import spark.implicits._
    val e = SparkEntry.queries("x_user_skew")(spark, sf).collect()
    val a = graft.queries.EventAnalytics.userSkewApprox(spark, sf).collect()
    assert(e.length == a.length)
    // per-type events-per-user distributions, recomputed independently
    val dists = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("n"))
      .groupBy($"event_type").agg(collect_list($"n".cast("double")).as("ns"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    e.zip(a).foreach { case (er, ar) =>
      assert(er.getString(0) == ar.getString(0))
      Seq(1, 2, 5, 6).foreach(i => assert(er.get(i) == ar.get(i),
        s"non-pct col $i diverged for ${er.getString(0)}"))
      val ns = dists(er.getString(0))
      Seq(3 -> 0.5, 4 -> 0.99).foreach { case (i, p) =>
        val (lo, hi) = bracket(ns, p)
        val av = ar.getDouble(i)
        assert(av == lo || av == hi,
          s"approx p$p=${av} not a rank neighbour [$lo,$hi] for ${er.getString(0)}")
        assert(lo <= er.getDouble(i) && er.getDouble(i) <= hi) // sanity: exact interpolates the same bracket
      }
    }
  }

  test("x_doc_diversity twin: non-pct parity; p50 is an exact rank neighbour") {
    import spark.implicits._
    val e = SparkEntry.queries("x_doc_diversity")(spark, sf).collect()
    val a = graft.queries.MiningOps.docDiversityApprox(spark, sf).collect()
    assert(e.length == a.length)
    val dists = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source",
        explode(expr("filter(split(lower(text), ' +'), x -> x != '')")).as("token"))
      .groupBy($"doc_id", $"source", $"token").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id", $"source")
      .agg(sum($"cnt").as("n"), sum($"cnt" * $"cnt").as("s2"))
      .select($"source", expr("((n * n - s2) * 10000) DIV (n * n)").as("div_bp"))
      .groupBy($"source").agg(collect_list($"div_bp".cast("double")).as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    e.zip(a).foreach { case (er, ar) =>
      assert(er.getString(0) == ar.getString(0))
      Seq(1, 3, 4).foreach(i => assert(er.get(i) == ar.get(i),
        s"non-pct col $i diverged for ${er.getString(0)}"))
      val (lo, hi) = bracket(dists(er.getString(0)), 0.5)
      val av = ar.getDouble(2)
      assert(av == lo || av == hi,
        s"approx p50=$av not a rank neighbour [$lo,$hi] for ${er.getString(0)}")
    }
  }

  test("x_session_stats twin: non-pct parity; pct columns stay within the exact spread") {
    val e = SparkEntry.queries("x_session_stats")(spark, sf).collect().head
    val a = graft.queries.EventAnalytics.sessionStatsApprox(spark, sf).collect().head
    Seq(0, 1, 6).foreach(i => assert(e.get(i) == a.get(i), s"non-pct col $i diverged"))
    // rank-exact ⇒ the approx value deviates from the interpolated one
    // by at most the neighbour gap; on these session distributions that
    // is a tight band around the exact value
    Seq(2, 3, 4, 5).foreach { i =>
      val (ev, av) = (e.getDouble(i), a.getDouble(i))
      assert(math.abs(av - ev) <= math.max(1.0, 0.05 * math.abs(ev)),
        s"pct col $i drifted: exact=$ev approx=$av")
    }
  }

  test("x_value_outliers twin: counts survive the approx med/mad swap") {
    val e = SparkEntry.queries("x_value_outliers")(spark, sf).collect()
    val a = graft.queries.EventAnalytics.valueOutliersApprox(spark, sf).collect()
    assert(e.length == a.length)
    e.zip(a).foreach { case (er, ar) =>
      assert(er.getString(0) == ar.getString(0))
      assert(er.getLong(1) == ar.getLong(1)) // n is pct-independent
      // med/mad move to a rank neighbour; the 5·MAD screen verdict is
      // robust to that by construction — pin the drift band
      val (em, am) = (er.getDouble(2), ar.getDouble(2))
      assert(math.abs(am - em) <= math.max(0.5, 0.05 * math.abs(em)),
        s"median drifted: exact=$em approx=$am for ${er.getString(0)}")
      val (ebp, abp) = (er.getLong(5), ar.getLong(5))
      assert(math.abs(abp - ebp) <= 100L, // ≤ 1pp outlier-rate drift
        s"outlier_bp drifted: exact=$ebp approx=$abp for ${er.getString(0)}")
    }
  }
}
