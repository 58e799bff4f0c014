package graft.eventstore

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The SQL attachment surface (reference api.clj:29-49 read endpoints
  * re-expressed as temp views): plain SQL over the event store, with
  * partition pruning intact and the native kernels installed. */
class GraftSessionSpec extends AnyFunSuite with SparkTestBase {

  private val T0 = 1700000000000L

  test("attach exposes the log to plain SQL; stream predicates prune partitions") {
    val log = tmpDir("sqlattach")
    Ingest.ingest(rawEvents(30), log, T0)
    GraftSession.attach(spark, log)

    assert(spark.sql("SELECT count(*) FROM graft_events")
      .collect().head.getLong(0) == 30)

    // a stream_name predicate must reach the reader as a PARTITION
    // filter (the log is laid out by stream) — the SQL path keeps the
    // same pruning as the DataFrame path
    val one = spark.sql("SELECT * FROM graft_events WHERE stream_name = 's1'")
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("stream_name"),
      s"stream predicate did not prune:\n$scan")
    assert(one.count() == 15)

    // catalog views answer without touching payload columns
    val streams = spark.sql(
      "SELECT stream_name, total_events FROM graft_streams ORDER BY stream_name")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(streams.toMap == Map("s1" -> 15L, "s2" -> 15L))
    assert(spark.sql("SELECT * FROM graft_stream_names").count() == 2)

    // native kernels are installed for curation SQL out of the box
    val h = spark.sql(
      "SELECT poly_hash(payload) AS h, bpe_token_count(payload) AS t " +
        "FROM graft_events LIMIT 1").collect().head
    assert(h.getLong(0) >= 0 && h.getLong(1) > 0)
  }

  test("attachCorpus: curation SQL over documents/embeddings with pushdown intact") {
    GraftSession.attachCorpus(spark, "/root/testdata/sf0.001")

    // a curation signal in plain SQL, kernels pre-installed
    val q = spark.sql(
      """SELECT source, count(*) AS n, sum(ws_token_count(text)) AS toks
         FROM graft_documents WHERE lang = 'en' GROUP BY source""")
    assert(q.count() > 0)

    // the lang predicate and column pruning reach the parquet scan
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("lang"),
      s"lang predicate not pushed:\n$scan")
    assert(!scan.contains("n_chars"), s"unprojected column read:\n$scan")

    // embeddings queryable with the exact-dot kernel
    val sim = spark.sql(
      """SELECT a.vec_id, vec_dot(CAST(a.embedding AS ARRAY<DOUBLE>),
                                  CAST(a.embedding AS ARRAY<DOUBLE>)) AS s
         FROM graft_embeddings a WHERE a.vec_id < 3""").collect()
    assert(sim.length == 3 && sim.forall(_.getDouble(1) > 0))
  }

  test("attached projection view tracks the live descriptor table via refresh") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("sqlproj") + "/state"
    val mem = MemoryStream[Event]
    val q = graft.streaming.ProjectionSink.start(
      mem.toDS(), CountFold("views"), table, tmpDir("sqlprojck"))
    try {
      mem.addData(ev("a", 1), ev("a", 2), ev("b", 3))
      q.processAllAvailable()
      GraftSession.attachProjection(spark, table, "views")
      val v1 = spark.sql(
        "SELECT value FROM graft_projection_views WHERE stream_name = 'a'")
        .collect().head.getLong(0)
      assert(v1 == 2L)

      mem.addData(ev("a", 4))
      q.processAllAvailable()
      ProjectionView.refresh(spark, table, "views")
      val v2 = spark.sql(
        "SELECT value FROM graft_projection_views WHERE stream_name = 'a'")
        .collect().head.getLong(0)
      assert(v2 == 3L)
    } finally q.stop()
  }

  private def ev(stream: String, oid: Long): Event =
    Event(stream, oid, new java.sql.Timestamp(T0 + oid * 1000), "svc",
      s"l$oid", "1", "{}")
}
