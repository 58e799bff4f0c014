package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.DsirLm

/** Online DSIR scoring: the persisted estimator must reproduce the
  * closed-form add-one weights (including out-of-vocabulary smoothing,
  * which the in-corpus query can never exercise), agree with the inline
  * x_dsir_weights spelling on the real corpus, and stream with the
  * stateless idempotent-sink contract. */
class StreamingDsirSpec extends AnyFunSuite with SparkTestBase {

  private def docsAll =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))

  test("closed-form weights: in-vocab, target-doc, and OOV smoothing") {
    import spark.implicits._
    val corpus = Seq((1L, "src0", "a a b"), (2L, "src1", "a c"))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("dsirlm")
    DsirLm.train(corpus, "src0", s"$dir/lm")
    val lm = DsirLm.load(spark, s"$dir/lm")
    assert((lm.tr, lm.tt, lm.vsz) == ((5L, 3L, 3L)))
    val got = DsirLm.score(
        Seq((10L, "new", "a z"), (11L, "new", "b"), (1L, "src0", "a a b"))
          .toDF("doc_id", "source", "text"), lm)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // "a z": a cancels (ln(3/6)=ln(4/8)), OOV z smooths to (0+1) on both
    // sides -> ln(1/6)-ln(1/8)=ln(4/3); mean over 2 toks -> 1438 bp
    assert(got(10L) == 1438L, s"OOV doc: ${got(10L)}")
    // "b": ln(2/6)-ln(2/8)=ln(4/3) -> 2876 bp
    assert(got(11L) == 2876L, s"in-vocab doc: ${got(11L)}")
    // the target doc itself: (2*0 + ln(4/3))/3 -> 958 bp
    assert(got(1L) == 958L, s"target doc: ${got(1L)}")
    // the SUM form (lengthNormalized = false — the resample race key)
    // must differ from the mean by exactly the token count: "a z z" is
    // 2*ln(4/3) summed (5753 bp) vs /3 averaged (1917 bp)
    val sums = DsirLm.score(
        Seq((20L, "new", "a z z")).toDF("doc_id", "source", "text"),
        lm, lengthNormalized = false)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sums(20L) == 5753L, s"sum form: ${sums(20L)}")
    val means = DsirLm.score(
        Seq((20L, "new", "a z z")).toDF("doc_id", "source", "text"), lm)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(means(20L) == 1917L, s"mean form: ${means(20L)}")
  }

  test("persisted estimator reproduces the inline x_dsir_weights per-doc spelling") {
    import spark.implicits._
    val docs = docsAll
    val dir = tmpDir("dsirparity")
    DsirLm.train(docs, "src0", s"$dir/lm")
    val got = DsirLm.score(docs, DsirLm.load(spark, s"$dir/lm"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)

    // the query's own spelling: INNER join to raw counts (every token is
    // in-corpus), crossJoin'd scalar frame — a genuinely different plan
    val toks = docs.select($"doc_id", $"source",
        expr("filter(split(lower(text), ' +'), x -> x != '')").as("tk"))
      .where(size($"tk") >= 1)
    val uni = toks.select($"doc_id", $"source", explode($"tk").as("token"))
    val dt = uni.groupBy($"doc_id", $"source", $"token")
      .agg(count(lit(1)).as("occ"))
    val cr = uni.groupBy($"token".as("r_token")).agg(count(lit(1)).as("cr"))
    val ct = uni.where($"source" === "src0")
      .groupBy($"token".as("t_token")).agg(count(lit(1)).as("ct"))
    val sc = broadcast(
      cr.agg(sum($"cr").as("tr"), count(lit(1)).as("vsz"))
        .crossJoin(ct.agg(coalesce(sum($"ct"), lit(0L)).as("tt"))))
    val expected = dt
      .join(cr, $"r_token" === $"token")
      .join(ct, $"t_token" === $"token", "left")
      .crossJoin(sc)
      .groupBy($"doc_id", $"source")
      .agg(floor(lit(10000.0) * sum($"occ" * (
          log((coalesce($"ct", lit(0L)) + 1).cast("double") /
            ($"tt" + $"vsz").cast("double"))
          - log(($"cr" + 1).cast("double") /
            ($"tr" + $"vsz").cast("double"))))
        / sum($"occ")).cast("long").as("w_bp"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(got.length == expected.length && got.sameElements(expected),
      s"served ${got.length} rows vs inline ${expected.length}")
  }

  test("streamed micro-batches equal the batch score of their union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = docsAll
    val dir = tmpDir("dsirstream")
    DsirLm.train(docs.where($"doc_id" < 400), "src0", s"$dir/lm")
    val lm = DsirLm.load(spark, s"$dir/lm")
    val arriving = docs.where($"doc_id" >= 400 && $"doc_id" < 440)
    val expected = DsirLm.score(arriving, lm)
      .collect().map(_.toString).sorted

    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingDsir.start(
      mem.toDS().toDF("doc_id", "source", "text"),
      s"$dir/lm", outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      val rows = arriving.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val (h, t) = rows.splitAt(rows.length / 2)
      mem.addData(h.toIndexedSeq); q.processAllAvailable()
      mem.addData(t.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$dir/out")
      .select("doc_id", "source", "w_bp") // drop the batch_id partition col
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(expected),
      s"stream ${got.length} rows vs batch ${expected.length}")
  }

  test("gated stream (tauBp) keeps exactly the docs the batch Gumbel race keeps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = docsAll
    val dir = tmpDir("dsirgate")
    DsirLm.train(docs.where($"doc_id" < 400), "src0", s"$dir/lm")
    val lm = DsirLm.load(spark, s"$dir/lm")
    val arriving = docs.where($"doc_id" >= 400 && $"doc_id" < 460)
    // the gate races the length-UNNORMALIZED sum weight (the
    // x_dsir_resample form) — not the mean the ungated stream emits
    val expected = DsirLm.score(arriving, lm, lengthNormalized = false)
      .where($"w_bp" + DsirLm.gumbelBp($"doc_id") >= 0L)
      .collect().map(r => r.getLong(0)).sorted
    // the gate must bite in both directions on this slice
    assert(expected.nonEmpty && expected.length < arriving.count(),
      s"tau=0 gate degenerate: ${expected.length} kept")

    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingDsir.start(
      mem.toDS().toDF("doc_id", "source", "text"),
      s"$dir/lm", outDir = s"$dir/out", checkpoint = s"$dir/ckpt",
      tauBp = Some(0L))
    try {
      val rows = arriving.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val (h, t) = rows.splitAt(rows.length / 2)
      mem.addData(h.toIndexedSeq); q.processAllAvailable()
      mem.addData(t.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getAs[Long]("doc_id")).sorted
    assert(got.sameElements(expected),
      s"gate drift: stream kept ${got.length} vs batch ${expected.length}")
  }

  test("negative doc ids draw valid Gumbels — raced, never silently dropped") {
    import spark.implicits._
    // a negative crawl id must reach the race with a well-defined draw
    // (the naive hash fed ln a negative argument -> NULL -> the gate
    // dropped the doc regardless of weight); the draw must also be
    // finite and inside the discretized Gumbel support
    val ids = Seq(-1L, -5L, Long.MinValue, Long.MinValue + 7, -1048577L,
      0L, 42L, Long.MaxValue)
    val got = ids.toDF("doc_id")
      .select($"doc_id", DsirLm.gumbelBp($"doc_id").as("g"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), if (r.isNullAt(1)) 0L else r.getLong(1)))
    got.foreach { case (id, isNull, g) =>
      assert(!isNull, s"gumbelBp NULL for id=$id")
      // support of -ln(-ln(u)) over u in ((0.5)/2^20, (2^20-0.5)/2^20)
      assert(g >= -27000L && g <= 146000L, s"id=$id draw $g out of support")
    }
  }

  test("gated replay after estimator rollover: zero-keep replay removes the stale partition") {
    // the at-least-once crash window COMBINED with the documented
    // rollover path: batch 0 wrote rows under estimator A, the commit
    // marker is lost, the operator retrains (estimator B fails every
    // doc of the batch), and the stream restarts from the same
    // checkpoint — the replayed batch keeps ZERO rows, and the sink
    // must CONVERGE to that (no stranded rows from the first attempt)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("dsirroll")
    // estimator A: target LM contains the batch tokens -> positive w
    DsirLm.train(
      Seq((1L, "src0", "alpha beta alpha"), (2L, "src1", "zz yy xx ww vv uu"))
        .toDF("doc_id", "source", "text"), "src0", s"$dir/lm")
    val mem = MemoryStream[(Long, String, String)]
    def start() = StreamingDsir.start(
      mem.toDS().toDF("doc_id", "source", "text"),
      s"$dir/lm", outDir = s"$dir/out", checkpoint = s"$dir/ckpt",
      tauBp = Some(0L))

    val q1 = start()
    try {
      mem.addData(Seq((900L, "new", "alpha beta"), (901L, "new", "alpha alpha")))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 2,
      "estimator A should keep both docs")

    // nightly roll while the stream is down: estimator B's target LM
    // is large and disjoint from the batch tokens while the raw LM
    // covers them heavily -> w ≈ -70000 bp per doc, below even the
    // larger of the two docs' FIXED Gumbel draws (G(900)=3344,
    // G(901)=31021 bp) — the race is deterministically unwinnable
    DsirLm.train(
      Seq((1L, "src0", ("qq " * 5000).trim),
        (2L, "src1", ("alpha beta " * 2000).trim))
        .toDF("doc_id", "source", "text"), "src0", s"$dir/lm")
    // lose the commit marker (and its checksum sidecar) for batch 0
    val commit = new java.io.File(s"$dir/ckpt/commits/0")
    assert(commit.exists && commit.delete())
    new java.io.File(s"$dir/ckpt/commits/.0.crc").delete()

    val q2 = start()
    try q2.processAllAvailable()
    finally q2.stop()
    val files = Option(new java.io.File(s"$dir/out/batch_id=0").listFiles)
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    assert(files == 0,
      s"zero-keep replay left $files stale parquet files in batch_id=0")
  }

  test("a REPLAYED micro-batch overwrites its own output instead of duplicating it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("dsirreplay")
    DsirLm.train(docsAll.where($"doc_id" < 400), "src0", s"$dir/lm")
    val mem = MemoryStream[(Long, String, String)]
    def start() = StreamingDsir.start(
      mem.toDS().toDF("doc_id", "source", "text"),
      s"$dir/lm", outDir = s"$dir/out", checkpoint = s"$dir/ckpt")

    val q1 = start()
    try {
      mem.addData(Seq((900L, "new", "alpha beta"), (901L, "new", "gamma")))
      q1.processAllAvailable()
    } finally q1.stop()

    // at-least-once crash window: offsets committed, batch commit marker
    // lost — restart re-runs batch 0 with the same batchId; a
    // blind-append sink would double both rows
    val commit = new java.io.File(s"$dir/ckpt/commits/0")
    assert(commit.exists, "expected batch-0 commit marker in the checkpoint")
    assert(commit.delete())
    new java.io.File(s"$dir/ckpt/commits/.0.crc").delete()
    val q2 = start()
    try q2.processAllAvailable()
    finally q2.stop()

    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id", "w_bp").collect().map(_.toString)
    assert(out.length == 2, s"replayed batch duplicated rows: ${out.length}")
    assert(out.distinct.length == out.length, "duplicate scored rows")
  }
}
