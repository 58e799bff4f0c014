package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantic checks over the declared query surface at sf0.001.
  * (Exact value parity vs DuckDB is the driver's oracle gate; here we
  * assert the invariants that gate can't see — approx tolerances and the
  * non-oracle queries.) */
class QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("the whole surface constructs and executes 8-wide concurrently (registry-race pin)") {
    // graft.Verify runs queries on a thread pool over ONE session; the
    // r7 gate caught a session-global registry race (an interleaved
    // Centroids.register swapping another query's centroid set mid-
    // construction), which is why operator code uses registry-free
    // Column builders. This pins that discipline for the FULL declared
    // surface: every query built AND executed concurrently, no
    // exceptions, non-oracle queries still non-empty. Declared FIRST in
    // the suite so the per-JVM caches (schemaCache, cachedIndex,
    // cachedBytes) are COLD — the concurrent run exercises first-build
    // races, not the warmed fast path.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = fn(spark, sf).count()
        })
      }
      futs.foreach { case (name, f) =>
        val n = try f.get() catch {
          case e: Throwable => fail(s"$name failed under concurrency: $e")
        }
        if (!SparkEntry.oracleSql.contains(name))
          assert(n > 0, s"non-oracle query $name empty under concurrency")
      }
    } finally pool.shutdown()
  }

  test("every declared query runs and the oracle-less ones return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      if (!SparkEntry.oracleSql.contains(name))
        assert(n > 0, s"non-oracle query $name returned no rows (untestable)")
    }
  }

  test("entry() (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("incremental oracle twins ≡ self-join twins restricted to the split") {
    // The incremental probes (batch = doc_id % 10 = 0 vs index = rest)
    // must emit EXACTLY the self-join twin's pairs that cross the
    // split, re-keyed to (new, index) — the lifecycle changes the join
    // shape, never the emitted set. Pinned for both families so the
    // MinHash/SimHash symmetry is an executable invariant, not just a
    // pair of independent hash-matches.
    def pairs(q: String, lc: String, rc: String, vc: String): Set[(Long, Long, Long)] =
      SparkEntry.queries(q)(spark, sf)
        .select(col(lc).cast("long"), col(rc).cast("long"), col(vc).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for ((self, inc, vc) <- Seq(
        ("x_minhash_oracle", "x_minhash_oracle_incremental", "jac_bp"),
        ("x_simhash_oracle", "x_simhash_oracle_incremental", "hamming"))) {
      val crossing = pairs(self, "a_id", "b_id", vc).collect {
        case (a, b, v) if (a % 10 == 0) != (b % 10 == 0) =>
          if (a % 10 == 0) (a, b, v) else (b, a, v)
      }
      assert(pairs(inc, "new_id", "index_id", vc) == crossing,
        s"$inc diverged from $self restricted to the batch/index split")
    }
  }

  test("token graph edge list builds ONCE per table generation across its three consumers") {
    // warm the cache once (any token-graph query), then pin that every
    // further token-graph read serves from the per-generation local
    // artifact instead of re-running the distinct + self-join edge
    // build (x_graph_degree reads the DOC near-dup graph, not this one)
    SparkEntry.queries("x_graph_triangles")(spark, sf).count()
    val before = graft.queries.QueryModule.localCacheBuilds.get()
    Seq("x_graph_lcc", "x_graph_kcore", "x_graph_triangles")
      .foreach(q => SparkEntry.queries(q)(spark, sf).count())
    val built = graft.queries.QueryModule.localCacheBuilds.get() - before
    assert(built == 0, s"edge list rebuilt $built times on a warm generation")
  }

  test("driver contract: every oracle key names a query; names are unique and well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    assert(qs.forall(_.matches("[a-z0-9_]+")), "query ids must be snake_case")
    // every oracle is syntactically complete enough to end in an ORDER BY
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle lacks ORDER BY")
    }
  }

  test("x_approx_quantile within 5% of exact quantiles") {
    import spark.implicits._
    val approx = SparkEntry.queries("x_approx_quantile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - e50) / e50 <= 0.05, s"$k p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 <= 0.05, s"$k p95: $a95 vs $e95")
    }
  }

  test("x_dsir_resample: exp-weighted selection actually separates domains") {
    // the oracle pins the exact values; this pins the SEMANTICS the
    // hash can't guarantee by construction — the Gumbel race must keep
    // the target domain at a strictly higher rate than the average and
    // than the most off-domain source, or the importance weighting
    // isn't biting (e.g. a broken weight sum would still hash-match a
    // symmetrically broken oracle)
    val rows = SparkEntry.queries("x_dsir_resample")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val target = rows("src0")
    val others = (rows - "src0").values
    // target beats EVERY off-domain source (measured margin at this sf:
    // 7600 bp vs 6000 max), not merely the average
    assert(target > others.max,
      s"target keep_bp $target not above off-domain max ${others.max}")
  }

  test("x_sketch_union: 5% of exact, and union-of-daily EQUALS the single-pass sketch") {
    import spark.implicits._
    val est = SparkEntry.queries("x_sketch_union")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n <= 0.05,
        s"$k: est=${est(k)} exact=$n")
    }
    // the artifact's trust property: merging per-day sketches must give
    // the SAME registers as sketching the whole range in one pass
    // (max is associative/commutative) — estimate equality, not
    // tolerance
    val single = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    single.foreach { case (k, n) =>
      assert(est(k) == n, s"$k: union ${est(k)} != single-pass $n")
    }
  }

  test("x_sketch_incremental: persisted-history + fresh-today EQUALS full recompute") {
    // HLL register merge is order/partition-invariant, so probing the
    // persisted artifact must give the SAME rows as x_sketch_union's
    // full-recompute spelling — exact equality, the cutover trust
    // property for nightly-append deployments
    val inc = SparkEntry.queries("x_sketch_incremental")(spark, sf)
      .collect().map(_.toString).toSeq
    val full = SparkEntry.queries("x_sketch_union")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(inc == full, s"incremental diverged from full recompute:\n$inc\nvs\n$full")
  }

  test("x_sketch_quantiles: lb within 3.125% below the exact order statistic; bounded buckets") {
    import spark.implicits._
    val got = SparkEntry.queries("x_sketch_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // exact per-type cents arrays, recomputed independently
    val cents = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", expr("CAST(floor(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    cents.foreach { case (t, sorted) =>
      val (n, nBuckets, p50, p95, p99) = got(t)
      assert(n == sorted.length.toLong, s"$t: n $n != ${sorted.length}")
      // bucket-count bound: log-linear layout holds ≤ (e_max-4)·32
      // buckets for this domain (cents ≤ 49102 → e ≤ 15 → ≤ 384) —
      // the KB-artifact claim, independent of event volume
      assert(nBuckets <= 384L, s"$t: $nBuckets buckets")
      Seq(0.50 -> p50, 0.95 -> p95, 0.99 -> p99).foreach { case (p, lb) =>
        // the sketch picks the bucket CONTAINING the ceil(p·n)-th order
        // statistic, so: lb ≤ stat ≤ lb + width, width ≤ max(1, lb/32)
        // (linear sub-buckets of a power-of-2 range) → relative error
        // ≤ 3.125% one-sided
        val stat = sorted((math.ceil(p * sorted.length) - 1).toInt.max(0))
        assert(lb <= stat && stat <= lb + math.max(1L, lb / 32),
          s"$t p$p: lb=$lb outside band of exact stat=$stat")
      }
    }
    // mergeability is graded by the oracle itself (single-pass SQL vs
    // the query's daily-then-merge) — re-pin here across an arbitrary
    // 3-way split instead of days: bucket vectors must be IDENTICAL
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"event_type",
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .withColumn("bucket", expr(
        """CASE WHEN cents < 32 THEN cents
                ELSE (length(bin(cents)) - 5) * 32
                     + shiftright(cents, length(bin(cents)) - 6) - 32 END"""))
    val merged = ev.withColumn("part", $"event_id" % 3)
      .groupBy($"part", $"event_type", $"bucket").agg(count(lit(1)).as("c"))
      .groupBy($"event_type", $"bucket").agg(sum($"c").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val single = ev.groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == single, "split-then-merge bucket vector diverged")
  }

  test("x_sketch_intersect: set-op estimates EXACTLY equal brute force in exact mode") {
    import spark.implicits._
    // theta sketches retain every hash until they exceed nominal
    // entries (4096 at lgK=12); every test sf stays far below that, so
    // intersection/difference/union estimates are EXACT — equality,
    // not tolerance (the regime bound is documented at the query)
    val got = SparkEntry.queries("x_sketch_intersect")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val tu = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"user_id").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val types = tu.keys.toSeq.sorted
    for (ta <- types; tb <- types if ta < tb) {
      val (ia, oa, ua) = got((ta, tb))
      val inter = (tu(ta) & tu(tb)).size.toLong
      assert(ia == inter, s"($ta,$tb) both: $ia != $inter")
      assert(oa == (tu(ta) -- tu(tb)).size.toLong, s"($ta,$tb) only_a: $oa")
      assert(ua == (tu(ta) | tu(tb)).size.toLong, s"($ta,$tb) either: $ua")
    }
    assert(got.size == types.combinations(2).size, s"pair count ${got.size}")
  }

  test("x_hll_distinct within 15% of exact distinct counts") {
    import spark.implicits._
    val approx = SparkEntry.queries("x_hll_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.15, s"$k: approx=$a exact=$n")
    }
  }

  test("x_markov_steady: nonnegative max-scaled weights, shares sum to " +
      "≤ 10^4, and outgoing mass balances incoming mass") {
    val rows = SparkEntry.queries("x_markov_steady")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ws = rows.map(_.getLong(3))
    assert(ws.forall(_ >= 0), s"negative steady weight: ${ws.mkString(",")}")
    // the scale-invariant renorm pins max|w| = 10^4 whenever the chain
    // has any transition (s != 0 at the final step — true on the corpus)
    assert(ws.max == 10000L, s"max weight ${ws.max} != 10000")
    val bps = rows.map(_.getLong(4))
    assert(bps.forall(_ >= 0) && bps.sum <= 10000L,
      s"steady shares must floor-sum to <= 10^4: ${bps.mkString(",")}")
    // every transition leaves one type and enters one: Σ n_out = Σ n_in
    assert(rows.map(_.getLong(1)).sum == rows.map(_.getLong(2)).sum)
  }

  test("x_hazard_km: the corpus-calibrated 2-day churn threshold keeps " +
      "BOTH branches nonzero at both GATE SFs (VERDICT r13 #6)") {
    // the threshold is corpus-calibrated (x_hazard_km's scaladoc: max
    // observed absence is 2 days — a 7-day production rule would churn
    // nobody here). A testdata regeneration that silently zeroes either
    // the churned or the censored branch would ship a degenerate hazard
    // table through a green hash-match (an all-zero column still
    // matches); fail HERE instead, with a recalibration pointer.
    // Scoped to the GATE SFs (sf0.01: 1 churned/149 censored; sf0.1:
    // 13/1487 — measured r14): the 15-user sf0.001 corpus has a max
    // end-gap of ONE day, so its churn branch is zero BY THE DATA (the
    // oracle hash-matches the all-zero column; writing this pin at
    // sf0.001 was how that fact surfaced) — sf0.001 is the fast dev
    // loop, not a graded gate.
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("x_hazard_km")(spark, dir).collect()
      assert(rows.nonEmpty, s"$dir: empty hazard table")
      val churned = rows.map(_.getLong(2)).sum
      val censored = rows.map(_.getLong(3)).sum
      assert(churned > 0,
        s"$dir: the 2-day threshold churns NOBODY — recalibrate it " +
          "against the corpus's max observed absence (scaladoc rule)")
      assert(censored > 0,
        s"$dir: the censored branch is empty — the threshold churns " +
          "everyone; recalibrate")
    }
  }

  test("x_hazard_km_7d: the production threshold is LOUDLY near-degenerate " +
      "on this corpus — all-zero churn with the lifetime/at-risk columns " +
      "identical to the 2-day variant (VERDICT r14 #4)") {
    // the 7-day rule ships as a declared read precisely BECAUSE the
    // corpus can't exercise it (max observed absence is 2 days): this
    // pin documents the expected degenerate shape at both gate SFs so
    // a regeneration that suddenly makes 7-day churn fire — or a code
    // drift that breaks the threshold plumbing — both surface here.
    // (t_days, n_at-derived n_risk) don't depend on the threshold, so
    // they must match the 2-day variant's rows exactly.
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val prod = SparkEntry.queries("x_hazard_km_7d")(spark, dir).collect()
      val cal = SparkEntry.queries("x_hazard_km")(spark, dir).collect()
      assert(prod.nonEmpty, s"$dir: empty hazard table")
      assert(prod.forall(r => r.getLong(2) == 0L && r.getLong(4) == 0L),
        s"$dir: 7-day churn fired — the corpus now has week-scale " +
          "absences; update this pin AND x_hazard_km's calibration note")
      assert(prod.forall(r => r.getLong(3) > 0L),
        s"$dir: a lifetime row with zero censored users under an " +
          "all-censoring threshold is impossible")
      assert(prod.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
          cal.map(r => (r.getLong(0), r.getLong(1))).toSeq,
        s"$dir: lifetime/at-risk columns must be threshold-independent")
    }
  }

  test("x_hazard_na: na_bp IS the exact prefix sum of x_hazard_km's " +
      "hazard_bp over the shared t_days axis (the declared " +
      "quantize-then-sum semantics)") {
    // The NA read shares the KM pipeline through the at-risk table
    // (same 2-day rule), so its per-level hazard column must equal
    // x_hazard_km's row for row, and the cumulative column must be the
    // running sum of those already-floored terms — never a re-derived
    // rational. Both gate SFs, same scoping as the KM pins.
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val na = SparkEntry.queries("x_hazard_na")(spark, dir).collect()
      val km = SparkEntry.queries("x_hazard_km")(spark, dir).collect()
      assert(na.nonEmpty, s"$dir: empty NA table")
      assert(na.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
          km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
        s"$dir: (t_days, n_risk, n_churn) must match the KM table")
      assert(na.map(_.getLong(3)).toSeq ==
          km.map(_.getLong(4)).toSeq,
        s"$dir: per-level hazard_bp must equal x_hazard_km's")
      val cum = na.map(_.getLong(3)).scanLeft(0L)(_ + _).drop(1)
      assert(na.map(_.getLong(4)).toSeq == cum.toSeq,
        s"$dir: na_bp must be the exact prefix sum of hazard_bp")
      assert(na.last.getLong(4) >= na.head.getLong(4) &&
          na.map(_.getLong(4)).toSeq.sorted == na.map(_.getLong(4)).toSeq,
        s"$dir: a cumulative hazard must be nondecreasing")
    }
  }

  test("r17 cross-query consistency: w1_bp dominates ks_bp on a shared " +
      "(type, ne, nl) domain across KS/EMD/CvM; the forecast family " +
      "shares one (type, n_days) domain") {
    // W₁ ≥ KS exactly in bp: the sup's level has a ≥1-cent gap to the
    // next merged level (it is never the last — D there is 0), so
    // tot ≥ Dmax and floor monotonicity gives w1_bp ≥ ks_bp. A
    // violation would mean the two walks disagree about the ECDFs.
    val ks = SparkEntry.queries("x_drift_ks")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val emd = SparkEntry.queries("x_drift_emd")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cvm = SparkEntry.queries("x_drift_cvm")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val adq = SparkEntry.queries("x_drift_ad")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(ks.nonEmpty && ks.keySet == emd.keySet &&
      ks.keySet == cvm.keySet && ks.keySet == adq.keySet,
      s"drift domain split: ${ks.keySet}/${emd.keySet}/${cvm.keySet}/${adq.keySet}")
    ks.foreach { case (t, (ne, nl, ksBp)) =>
      assert(emd(t)._1 == ne && emd(t)._2 == nl && cvm(t) == ((ne, nl)) &&
        adq(t) == ((ne, nl)),
        s"$t: (ne, nl) drifted across the drift family")
      assert(emd(t)._3 >= ksBp,
        s"$t: w1_bp ${emd(t)._3} < ks_bp $ksBp — the transport distance " +
          "can never undercut the sup gap on integer-cent levels")
    }

    // all five exponential-smoothing forecasters fold the SAME
    // (type, day) rollup — their (type, n_days) domains must be one
    val fam = Seq("x_forecast_ses", "x_forecast_holt",
      "x_forecast_holt_damped", "x_forecast_holt_winters",
      "x_forecast_hw_log").map { q =>
      q -> SparkEntry.queries(q)(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val ref = fam.head._2
    assert(ref.nonEmpty, "forecast family empty")
    fam.tail.foreach { case (q, m) =>
      assert(m == ref, s"$q: (type, n_days) domain drifted vs ses")
    }
  }

  test("r16 cross-query consistency: x_markov_entropy's steady_bp is " +
      "LITERALLY x_markov_steady's; gap-sweep sessions are monotone in " +
      "the threshold; drift_js shares KS's type domain and Lin's bound") {
    // steady_bp rides two declared queries from one cached training
    // artifact — a drifting copy would mean the cache key split
    val ent = SparkEntry.queries("x_markov_entropy")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val std = SparkEntry.queries("x_markov_steady")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(ent.nonEmpty, "entropy table empty")
    ent.foreach { case (t, bp) =>
      assert(std(t) == bp, s"$t: steady_bp drifted: entropy $bp vs steady ${std(t)}")
    }

    // sessions(T) = n_users + #{gaps > T}: a larger threshold can only
    // drop boundaries — n_sessions nonincreasing, density nondecreasing
    val sweep = SparkEntry.queries("x_session_gap_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sweep.map(_._1).toSeq == Seq(1L, 5L, 15L, 30L, 60L))
    assert(sweep.map(_._2).toSeq.reverse.sorted == sweep.map(_._2).toSeq.reverse,
      s"n_sessions must be nonincreasing in the threshold: $sweep")
    assert(sweep.map(_._3).toSeq.sorted == sweep.map(_._3).toSeq,
      s"events/session must be nondecreasing in the threshold: $sweep")

    // JSD: same empty-half drop rule as KS (identical type domains)
    // and Lin's bound 0 ≤ JSD ≤ ln 2
    val js = SparkEntry.queries("x_drift_js")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val ks = SparkEntry.queries("x_drift_ks")(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(js.keySet == ks, s"JSD/KS type domains differ: ${js.keySet} vs $ks")
    js.foreach { case (t, v) =>
      assert(v >= 0.0 && v <= 0.6932, s"$t: JSD $v outside [0, ln 2]")
    }
  }
}
