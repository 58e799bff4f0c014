package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // ANSI pinned ON (the Spark 4 default, made explicit): the drift
      // family's loud-or-exact overflow contract (DriftArith) relies on
      // decimal/integral overflow RAISING, never wrapping to null.
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on non-bench data (sf0.001) so the first timed
    // query doesn't absorb session + JIT startup
    spark.range(100000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    // full materialization of every output column (count() would let the
    // optimizer drop projections); noop is the standard benchmark sink
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // drop per-query cached/broadcast state so one rep's leftovers
      // don't tax the next. clearCache() only covers catalog-cached
      // relations — localCheckpoint() blocks (x_ann_recall, the
      // incremental-index builds) live as persistent RDDs OUTSIDE the
      // catalog and would otherwise accumulate across all ~500 query
      // executions, pressuring the block manager/GC for exactly the
      // late-alphabet lines (the r8 x_zipf_slope anomaly). The sweep
      // runs OUTSIDE the timed window: it is inter-query hygiene, not
      // part of any query's cost (r11 verdict — at ~ms each it biased
      // every one of ~580 recorded reps upward).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (elapsed, ok)
    }
    // Fixed-work steal probes (r17 verdict task 2 — the probe gating
    // moves from ROUND_NOTES prose INTO the artifact): two known-cost
    // lines timed BEFORE and AFTER the sweep. Ceilings are the r17
    // measured same-code clean bands (x_pca_oracle 0.149–0.28 s,
    // x_dedup_incremental 0.196–0.306 s across 12 same-binary runs)
    // plus ~30% headroom; a probe outside its ceiling means the host
    // was stealing CPU in that window and the run's totals are NOT
    // comparable round-over-round. steal_index = max(probe/ceiling)
    // over all four measurements — a graded run is machine-readably
    // clean (≤ 1.0) or dirty, ending the per-round noise
    // re-litigation. Each probe takes one discarded warm-up rep first
    // (plan+codegen; the pre-probe therefore also pre-warms these two
    // lines for the sweep — a ~0.1 s downward bias on exactly those
    // two sweep lines, documented here rather than avoided, since
    // fixed-work comparability is the probe's whole point).
    // Position-aware ceilings (r18 calibration, measured over five
    // same-code runs in one session): the PRE probe runs in a
    // just-started JVM (partial JIT, cold page cache) and reads
    // ~1.5–2× the fully-warmed POST position on a clean host — that
    // is position state, not steal, so each position carries its own
    // band. pre = observed clean pre band (0.31–0.52) + headroom;
    // post = the r17 sweep-position clean bands + ~30% headroom.
    // r19 (ADVICE r18 #3): the PRE position gets a third measured rep
    // and a widened x_dedup_incremental ceiling. The r18 driver run
    // was graded dirty on pre=0.792 vs a 0.70 ceiling — a value that
    // cold-JVM variance (not steal) can produce when BOTH of two reps
    // land in the partial-JIT window; min-of-3 gives a cold start one
    // more escape without inflating the statistic, and the ceiling
    // widens to the observed cold-clean band (0.59–0.79) + headroom.
    val preCeilings = Map("x_pca_oracle" -> 0.60, "x_dedup_incremental" -> 0.85)
    val postCeilings = Map("x_pca_oracle" -> 0.40, "x_dedup_incremental" -> 0.45)
    // min of the measured reps after one discarded warm-up — the same
    // discipline the sweep lines use (3 reps pre, 2 post)
    def runProbes(reps: Int): Seq[(String, Double)] = preCeilings.keys.toSeq.sorted.map { name =>
      val fn = SparkEntry.queries(name)
      timeOne(name, fn) // discarded warm-up rep
      val rs = Seq.fill(reps)(timeOne(name, fn))
      (name, if (rs.forall(_._2)) rs.map(_._1).min else -1.0)
    }
    // Block-manager state probe, printed every 50 queries (stderr, not
    // part of the JSON contract): makes end-of-run storage pressure a
    // measurement instead of a hypothesis.
    def storageProbe(i: Int, name: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum / (1024 * 1024)
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
      System.err.println(
        s"[bench] storage@$i ($name): persistedRDDs=${infos.length} " +
        s"storageMemMB=$mem heapUsedMB=$heapMb")
    }
    // Two reps per query, headline = min of the two. One cold rep on a
    // shared JVM swings 2-3x with JIT/GC/page-cache state (ROUND_NOTES
    // lesson 5; measured 19.7s vs 0.9s on identical code), so a single
    // sample is not a comparable number round over round. The min of
    // cold+warm tracks isolation-profile numbers; the cold rep is kept
    // in `queries_cold` for startup-sensitive analysis.
    // Noise floor: this host shows multi-second CPU-steal windows
    // (measured same-code swings of 0.46 s ↔ 3.25 s on one line an hour
    // apart), so any line whose 2-rep min is still slow gets a THIRD
    // rep — both slow reps may have landed in one steal window. Bounded
    // extra wall: only lines over the threshold re-run once.
    val slowRepThreshold = 1.2
    val probePre = runProbes(3)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), i) =>
      if (i % 50 == 0) storageProbe(i, name)
      val (cold, okCold) = timeOne(name, fn)
      val (warm, okWarm) = timeOne(name, fn)
      val ok = okCold && okWarm
      val best =
        if (ok && math.min(cold, warm) > slowRepThreshold) {
          val (third, okThird) = timeOne(name, fn)
          if (okThird) math.min(math.min(cold, warm), third)
          else math.min(cold, warm)
        } else math.min(cold, warm)
      (name, cold, best, ok)
    }
    storageProbe(results.length, "END")
    val probePost = runProbes(2)
    // failed queries are self-describing in the JSON (value -1 + a
    // `failed` list), not just a stderr line a JSON consumer never sees
    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val qs = results.map { case (k, c, w, ok) =>
      "\"" + k + "\":" + (if (ok) f3(math.min(c, w)) else "-1") }.mkString("{", ",", "}")
    val qsCold = results.map { case (k, c, _, ok) =>
      "\"" + k + "\":" + (if (ok) f3(c) else "-1") }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, c, w, true) => math.min(c, w) }.sum
    val totalCold = results.collect { case (_, c, _, true) => c }.sum
    // The consumer keeps only the last ~2KB of stdout and (evidently)
    // parses line-wise, so ordering is: cold detail FIRST (may fall out
    // of the window as the query count grows), per-query min detail
    // SECOND, and a minimal headline LAST (~120B — survives any future
    // query-count growth plus sbt's trailing "[success]" line).
    // The COMPLETE per-query map additionally goes to bench_detail.json
    // in the working directory: at 118+ queries the detail lines
    // outgrew the stdout tail window (r6: 37 entries unreadable), and a
    // file survives any query-count growth.
    def probeJson(ps: Seq[(String, Double)]): String =
      ps.map { case (n, t) =>
        "\"" + n + "\":" + (if (t < 0) "-1" else f3(t)) }.mkString("{", ",", "}")
    val stealIndex = (probePre.map { case (n, t) => (t, preCeilings(n)) }
        ++ probePost.map { case (n, t) => (t, postCeilings(n)) })
      .map { case (t, ceil) =>
        if (t < 0) Double.PositiveInfinity else t / ceil }.max
    val benchClean = stealIndex <= 1.0
    val stealStr = if (stealIndex.isPosInfinity) "-1" else f3(stealIndex)
    // Host-floor index (r18 verdict task 3): the steal probes catch
    // SPIKES but are blind to broad uniform inflation — a 15% slower
    // host keeps every probe inside its +30% headroom while shifting
    // the whole sweep. So at run end the sweep's own per-query map is
    // compared against a committed clean floor pin
    // (bench_baselines/floor_pin.json, override SPARK_GRAFT_FLOOR_PIN):
    // host_floor_index = median(this_run[q] / pin[q]) over all common
    // lines. The pin is the r17 clean-window run (82.14 s, the
    // session-best measured floor) — an index ≈ 1.0 means the host is
    // in that floor class and totals ARE comparable to the 82 s era;
    // ≈ 1.15 is the documented shifted-floor class. The run_class
    // field folds both gates: spike-dirty (probe over ceiling) /
    // floor-shifted (spike-free, index > 1.10) / clean — the
    // machine-readable classification with no prose needed. The pin
    // compares CODE+HOST jointly, so a round that genuinely speeds
    // queries up reads < the host's true floor — fine: the index is a
    // comparability gate, not a speed grade.
    val warmByName = results.collect { case (k, c, w, true) => (k, math.min(c, w)) }.toMap
    val floorPinPath = sys.env.getOrElse("SPARK_GRAFT_FLOOR_PIN",
      "bench_baselines/floor_pin.json")
    val hostFloorIndex: Double = try {
      val src = scala.io.Source.fromFile(floorPinPath)
      val detailLine = try src.getLines().find(_.contains("\"metric\":\"detail\""))
        finally src.close()
      detailLine match {
        case Some(line) =>
          val kv = "\"(\\w+)\":(\\d+\\.\\d+)".r.findAllMatchIn(line)
            .map(m => (m.group(1), m.group(2).toDouble)).toMap - "value"
          val ratios = kv.keysIterator
            .filter(k => kv(k) > 0 && warmByName.contains(k))
            .map(k => warmByName(k) / kv(k)).toSeq.sorted
          if (ratios.isEmpty) -1.0
          else {
            val n = ratios.size
            if (n % 2 == 1) ratios(n / 2) else (ratios(n / 2 - 1) + ratios(n / 2)) / 2
          }
        case None => -1.0
      }
    } catch { case _: Throwable => -1.0 }
    val floorVerdict =
      if (hostFloorIndex < 0) "unknown"
      else if (hostFloorIndex > 1.10) "floor-shifted"
      else "floor-normal"
    val runClass =
      if (!benchClean) "spike-dirty"
      else if (floorVerdict == "floor-shifted") "floor-shifted"
      else "clean"
    val floorStr = if (hostFloorIndex < 0) "-1" else f3(hostFloorIndex)
    val floorJson =
      s""""host_floor_index":$floorStr,"host_verdict":"$floorVerdict","run_class":"$runClass""""
    // Artifact-build charge (r19 verdict task 1): every per-(JVM,
    // generation) artifact build runs inside the first consumer's cold
    // rep, so Σ min(cold, warm) never contained it. QueryModule times
    // each build thunk where it actually executes; the sum is emitted
    // here as a graded field so the driver SEES the build cost that the
    // per-query minimums exclude. Measured directly (not the cold−warm
    // proxy, which conflates JIT/page-cache warmup with build work).
    // By this point the sweep + probes have forced every bench-path
    // artifact, so the map is complete for the run.
    import scala.jdk.CollectionConverters._
    val builds = graft.queries.QueryModule.buildTimes.asScala
      .map { case (k, v) => (k, v.doubleValue) }.toSeq.sortBy(_._1)
    val artifactBuildTotal = builds.map(_._2).sum
    val buildsJson = builds.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val buildLine =
      s"""{"metric":"artifact_builds","value":${f3(artifactBuildTotal)},"unit":"sec","builds":$buildsJson}"""
    val probeLine =
      s"""{"metric":"probes","probe_pre":${probeJson(probePre)},"probe_post":${probeJson(probePost)},"steal_index":$stealStr,"bench_clean":$benchClean,$floorJson}"""
    val detailCold = s"""{"metric":"total_cold","value":${f3(totalCold)},"unit":"sec","queries_cold":$qsCold}"""
    val detail = s"""{"metric":"detail","value":${f3(total)},"unit":"sec","queries":$qs}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_detail.json"),
      probeLine + "\n" + buildLine + "\n" + detailCold + "\n" + detail + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] detail file: $e") }
    println(buildLine)
    println(detailCold)
    println(detail)
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","failed":$failed,"probe_pre":${probeJson(probePre)},"probe_post":${probeJson(probePost)},"steal_index":$stealStr,"bench_clean":$benchClean,$floorJson,"artifact_build":${f3(artifactBuildTotal)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
