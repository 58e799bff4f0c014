package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Invariants for the corpus-curation stages the oracle can't see:
  * plan shapes (what survives 100 TB) and cross-run determinism. */
class PipelineOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_decontaminate: benchmark probe broadcasts; corpus side never sort-merges") {
    val phys = run("x_decontaminate").queryExecution.executedPlan
    val smj = phys.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"benchmark join fell back to SMJ:\n$phys")
    val p = run("x_decontaminate").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
    // the benchmark source itself never appears in the output
    val rows = run("x_decontaminate").collect()
    assert(rows.forall(_.getString(1) != "src0"))
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("x_decontam_bloom: sketch prefilter returns exactly the unfiltered answer") {
    // no false negatives => prefilter + exact-verify == exact join
    val exact = run("x_decontaminate").collect().map(_.toString)
    val sketched = run("x_decontam_bloom").collect().map(_.toString)
    assert(sketched.sameElements(exact))
    // and the sketch path is actually in the plan
    val p = run("x_decontam_bloom").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("might_contain"), s"bloom prefilter missing:\n$p")
  }

  test("x_sample_stratified: narrow scan+filter (no join/window, only the final sort moves data)") {
    val phys = run("x_sample_stratified").queryExecution.executedPlan
    assert(phys.collect { case w: WindowExec => w }.isEmpty)
    val shuffles = phys.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1, s"sampling should not shuffle beyond the output sort:\n$phys")
    // deterministic: the arithmetic hash gives identical samples across runs
    val a = run("x_sample_stratified").collect().map(_.getLong(0))
    val b = run("x_sample_stratified").collect().map(_.getLong(0))
    assert(a.sameElements(b))
    // per-source rates honored: every bucket is below its source's rate
    val rates = Map("src0" -> 90L, "src1" -> 60L, "src2" -> 30L)
    run("x_sample_stratified").collect().foreach { r =>
      val limit = rates.getOrElse(r.getString(1), 10L)
      assert(r.getLong(2) < limit, s"${r.getString(1)} bucket ${r.getLong(2)} >= $limit")
    }
  }

  test("sampler/shard hash family is int64-safe past doc_id 3.5e9 (100 TB id space)") {
    // the raw doc_id*2654435761 product overflows int64 past doc_id
    // ≈ 3.47e9 — ANSI Spark throws and DuckDB errors, so the cross-
    // engine determinism contract would break exactly at scale. The
    // mod-before-multiply form must evaluate cleanly out there.
    val big = spark.range(5_000_000_000L, 5_000_001_000L).toDF("doc_id")
    val buckets = big.selectExpr(
      "((doc_id % 1000003) * 2654435761) % 1000003 % 100 AS bucket",
      "((doc_id % 1000003) * 2654435761) % 1000003 % 16 AS shard")
      .collect()
    assert(buckets.length == 1000)
    assert(buckets.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 100))
    assert(buckets.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
  }

  test("x_repetition: per-row kernel — no join, no window, bp bounded, verdict consistent") {
    val phys = run("x_repetition").queryExecution.executedPlan
    assert(phys.collect { case w: WindowExec => w }.isEmpty)
    val p = run("x_repetition").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ngram_top_count"), s"repetition kernel missing:\n$p")
    run("x_repetition").collect().foreach { r =>
      val bp = r.getLong(1)
      assert(bp >= 0 && bp <= 10000)
      assert((r.getString(2) == "repetitive") == (bp >= 600))
    }
  }

  test("x_token_budget: shares sum to ~1, keep rates bounded, total driver-sized") {
    val rows = run("x_token_budget").collect()
    assert(rows.length == 20) // one row per source at any corpus size
    val shareSum = rows.map(_.getLong(3)).sum
    assert(shareSum >= 10000 - 20 && shareSum <= 10000, s"share sum $shareSum")
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000)
      assert(r.getLong(2) > 0)
    }
  }

  test("x_dedup_keepbest: one keeper per cluster, member counts match x_dedup_clusters") {
    val best = run("x_dedup_keepbest").collect()
    assert(best.map(_.getLong(0)).distinct.length == best.length)
    best.foreach(r => assert(r.getLong(2) >= 2)) // components only hold paired docs
    val clusters = run("x_dedup_clusters").collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    best.foreach { r =>
      assert(clusters(r.getLong(0)) == r.getLong(2),
        s"cluster ${r.getLong(0)} member count mismatch")
      // the keeper is a member of its own cluster
      assert(clusters.contains(r.getLong(0)))
    }
  }

  test("x_curation_e2e: benchmark source yields zero; yields never exceed the filter chain") {
    val e2e = run("x_curation_e2e").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(e2e("src0") == ((0L, 0L))) // the benchmark set never ships
    // e2e stacks dedup+contamination on top of the chain gates, so
    // per-source yield can only be <= the filter chain's pass count
    val chain = run("x_filter_chain").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    e2e.foreach { case (src, (kept, _)) =>
      if (src != "src0") assert(kept <= chain(src), s"$src kept $kept > chain")
    }
  }

  test("x_shard_assign: every doc lands in exactly one of 16 shards, totals conserved") {
    val rows = run("x_shard_assign").collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    // deterministic across runs (it's the writer partitioner)
    val again = run("x_shard_assign").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("x_pack_sequences: per-shard windows (no global sort), packing arithmetic consistent") {
    // the prefix-sum window must be partitioned by shard — a global
    // (empty-partition-spec) window is the single-task scale killer.
    // (logical plan: AQE hides the physical operators pre-execution)
    val lp = run("x_pack_sequences").queryExecution.optimizedPlan
    val wins = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"found a globally-ordered window:\n$lp")
    val rows = run("x_pack_sequences").collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 16L).toSet))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (docs, toks, seqs, crossing) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(seqs == (toks + 2047) / 2048, s"shard ${r.getLong(0)}")
      // a doc can cross at most (its span / budget) boundaries; crossing
      // docs are a subset of docs
      assert(crossing >= 0 && crossing <= docs)
    }
  }

  test("x_sample_quality: high tier keeps everything, rates honored, deterministic") {
    val rows = run("x_sample_quality").collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3))).toMap
    byKey.foreach { case ((src, tier), (n, kept)) =>
      assert(kept <= n, s"$src/$tier")
      if (tier == "high") assert(kept == n, s"high tier must keep all: $src")
    }
    // tiers partition the non-empty corpus
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) > 0).count()
    assert(rows.map(_.getLong(2)).sum == total)
    val again = run("x_sample_quality").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("x_stats_profile: one-pass profile matches direct per-column queries") {
    val rows = run("x_stats_profile").collect()
    assert(rows.length == 5)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val n = orders.count()
    rows.foreach { r =>
      val (cname, nRows, nNull, nDistinct) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nRows == n)
      assert(nNull == orders.where(org.apache.spark.sql.functions.col(cname)
        .isNull).count(), cname)
      assert(nDistinct == orders.select(cname).distinct().count(), cname)
    }
  }

  test("x_sample_reservoir: exactly k per source, deterministic, WindowGroupLimit planned") {
    val rows = run("x_sample_reservoir").collect()
    val perSource = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (src, n) =>
      assert(perSource.getOrElse(src, 0) == math.min(5L, n), src)
    }
    val again = run("x_sample_reservoir").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    // Catalyst should plan the rank-filter as a group limit (the rn<=k
    // pushdown that keeps per-group work bounded before the window)
    val p = run("x_sample_reservoir").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("WindowGroupLimit"), s"group-limit pushdown missing:\n$p")
  }

  test("x_chunk_docs: chunk arithmetic consistent, token mass conserved") {
    val rows = run("x_chunk_docs").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    // token mass agrees with the shard audit's independent total
    val shardTokens = run("x_shard_assign").collect().map(_.getLong(2)).sum
    assert(rows.map(_.getLong(3)).sum == shardTokens)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0) // chunks
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000, "last_fill_bp")
      // every non-empty doc yields at least one chunk
      assert(r.getLong(2) <= r.getLong(3) || r.getLong(3) == 0)
    }
  }

  test("x_length_histogram: bands partition the corpus, token mass conserved") {
    val rows = run("x_length_histogram").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
    // token mass agrees with the shard audit's independent total
    val shardTokens = run("x_shard_assign").collect().map(_.getLong(2)).sum
    assert(rows.map(_.getLong(3)).sum == shardTokens)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 5))
  }

  test("x_shard_assign audit matches a physical partitionBy(shard) write") {
    import org.apache.spark.sql.functions._
    // the audit's hash IS the writer partitioner: a partitioned write
    // with the same expression must land exactly the audited counts
    val out = tmpDir("shardwrite")
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        (((col("doc_id") % 1000003) * lit(2654435761L)) % 1000003 % 16)
          .cast("long").as("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val audit = run("x_shard_assign").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    audit.foreach { case (s, n) =>
      assert(spark.read.parquet(s"$out/shard=$s").count() == n, s"shard $s")
    }
  }

  test("x_filter_chain: per-source accounting sums to the corpus") {
    val rows = run("x_filter_chain").collect()
    assert(rows.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$sf/documents.parquet")
        .where(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")) > 0).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
    }
  }

  test("x_gopher_rules: join-free single-aggregate plan; conjunction bounded by every rule") {
    val phys = run("x_gopher_rules").queryExecution.executedPlan
    assert(phys.collect { case j: SortMergeJoinExec => j }.isEmpty &&
      !phys.toString.contains("Join"), s"rule ensemble must not join:\n$phys")
    assert(phys.collect { case w: WindowExec => w }.isEmpty)
    val rows = run("x_gopher_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bps = (2 to 7).map(r.getLong)
      assert(bps.forall(b => b >= 0 && b <= 10000), r.toString)
      // pass_all is a conjunction: can't beat any individual rule
      assert(bps.last <= bps.init.min, r.toString)
    }
    // the corpus spread must exercise both branches of ≥1 rule
    assert(rows.exists(r => (2 to 6).map(r.getLong).exists(b => b > 0 && b < 10000)))
  }

  test("x_split_leakage: constructed cross-split duplicates are counted on every side") {
    import spark.implicits._
    // bucket((doc_id % 1000003) * 2654435761 % 1000003 % 100):
    // 5-10 → train, 3/4 → val, 1/2 → test (precomputed)
    val dir = tmpDir("splitleak")
    Seq(
      (5L, "alpha beta gamma", "en", "s", 15L),   // train ┐ dup pair
      (3L, "alpha beta gamma", "en", "s", 15L),   // val   ┘ leaks both ways
      (6L, "delta epsilon", "en", "s", 13L),      // train ┐
      (1L, "delta epsilon", "en", "s", 13L),      // test  ┘
      (7L, "unique one", "en", "s", 10L),         // train, clean
      (8L, "unique two", "en", "s", 10L),         // train, clean
      (4L, "unique three", "en", "s", 12L),       // val, clean
      (2L, "unique four", "en", "s", 11L))        // test, clean
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x_split_leakage")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("train") == ((4L, 3L + 2L + 2L + 2L, 2L)), out.toString) // both dup docs leaked
    assert(out("val") == ((2L, 3L + 2L, 1L)), out.toString)
    assert(out("test") == ((2L, 2L + 2L, 1L)), out.toString)
    // and determinism on the real corpus
    val a = run("x_split_leakage").collect().map(_.toString)
    val b = run("x_split_leakage").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
