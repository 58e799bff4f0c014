package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.eventstore.{Ingest, Replay}

/** Streaming semantics (reference streams.clj:368-405 hot/hot-cold):
  * hot-cold replays history then tails — here via the file source with a
  * checkpoint, so the reference's best-effort switchover becomes
  * exactly-once (SURVEY.md §4.4 upgrade). */
class HotColdSpec extends AnyFunSuite with SparkTestBase {

  private val T0 = 1700000000000L

  test("hot-cold: history replayed once, appended events picked up exactly once") {
    val log = tmpDir("hclog")
    val ckpt = tmpDir("hcckpt")
    Ingest.ingest(rawEvents(10), log, T0)

    def runOnce(name: String): Unit = {
      val q = HotCold.countProjection(HotCold.hotCold(spark, log))
        .writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    runOnce("hc1")
    val first = spark.table("hc1").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == Map("s1" -> 5L, "s2" -> 5L))

    // cold part done; now "live" appends arrive and the same checkpointed
    // query (a new incarnation = the hot tail) sees ONLY the new files
    Ingest.ingest(rawEvents(6), log, T0 + 60000)
    runOnce("hc2")
    val second = spark.table("hc2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(second == Map("s1" -> 8L, "s2" -> 8L)) // complete-mode state resumed, +3/+3
  }

  test("hot-cold replay after point delete on a date-bucketed stream omits exactly the victim") {
    val log = tmpDir("hcdel")
    val dayMs = 86400000L
    Ingest.append(Ingest.stamp(rawEvents(8, Seq("s1")), T0), log, byDate = true)
    Ingest.append(Ingest.stamp(rawEvents(4, Seq("s1")), T0 + dayMs), log, byDate = true)
    val ids = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id"))
    val victim = ids.min // lives in the day-1 bucket
    assert(Replay.deleteEvent(spark, log, "s1", victim))
    // a fresh hot-cold subscriber replays the rewritten layout: every
    // surviving event exactly once, the deleted one never delivered
    val q = HotCold.startMemorySink(
      HotCold.hotCold(spark, log, "s1"), "hcdel1", OutputMode.Append())
    try {
      q.awaitTermination(60000)
      val got = spark.table("hcdel1").collect().map(_.getAs[Long]("order_id")).sorted
      assert(got.sameElements(ids.filter(_ != victim).sorted),
        s"replay after delete: got ${got.length} events")
      // and the day-2 bucket still serves the date-pruned path
      assert(Replay.cold(Replay.open(spark, log), "s1", fromMs = T0 + dayMs).count() == 4)
    } finally q.stop()
  }

  test("windowed streaming counts equal the batch twin") {
    val log = tmpDir("wlog")
    Ingest.ingest(rawEvents(50), log, T0)

    val q = HotCold.windowedCounts(HotCold.hotCold(spark, log), "1 hour", "10 minutes")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("wc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val streamed = spark.table("wc")
      .select(unix_millis(col("window.start")).as("ws"), col("stream_name"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Replay.open(spark, log)
      .groupBy(window(col("event_time"), "1 hour").as("w"), col("stream_name"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("ws"), col("stream_name"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("hot: only events at/after subscribe time are delivered") {
    val log = tmpDir("hlog")
    val topic = tmpDir("htopic")
    // both batches land in the topic's retention window; the event_time
    // predicate alone must hide the pre-subscribe ones
    Ingest.ingest(rawEvents(10), log, T0, hotDir = Some(topic))
    Ingest.ingest(rawEvents(4), log, T0 + 60000, hotDir = Some(topic))

    val q = HotCold.hot(spark, topic, subscribeAtMs = T0 + 60000)
      .groupBy(col("stream_name")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hot1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("hot1").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s1" -> 2L, "s2" -> 2L))
  }

  test("hot subscribe never reads log history (topic tail + retention prune)") {
    val log = tmpDir("hblog")
    val topic = tmpDir("hbtopic")
    // history: dual-written, then aged out of the topic's retention
    Ingest.ingest(rawEvents(10), log, T0, hotDir = Some(topic))
    Thread.sleep(1200)
    assert(Ingest.pruneHotTopic(spark, topic, retainMs = 1000) >= 1)
    // live appends after subscribe
    Ingest.ingest(rawEvents(4), log, T0 + 60000, hotDir = Some(topic))

    val q = HotCold.hot(spark, topic, subscribeAtMs = T0 + 60000)
      .groupBy(col("stream_name")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hotb")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    // observable semantics unchanged: only post-subscribe events
    val got = spark.table("hotb").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s1" -> 2L, "s2" -> 2L))
    // and the INPUT was bounded: the 10 historical events stayed in the
    // log; the subscribe only read the topic's 4 live ones (the old
    // hot-over-log path replayed all 14 and filtered after the fact)
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows == 4L, s"log history was read: $inputRows input rows")
    // the full history is still in the cold log
    assert(Replay.cold(Replay.open(spark, log)).count() == 14)
  }

  test("streaming dedup: same (service_id, local_id) delivered once within watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(oid: Long, local: String) = graft.eventstore.Event(
      "s", oid, new java.sql.Timestamp(1700000000000L + oid), "svc", local, "1", "{}")
    val mem = MemoryStream[graft.eventstore.Event]
    val q = HotCold.dedupStream(mem.toDS().toDF(), "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup1")
      .start()
    try {
      mem.addData(ev(1, "a"), ev(2, "a"), ev(3, "b")) // dup "a" in batch
      q.processAllAvailable()
      mem.addData(ev(4, "a"), ev(5, "c")) // dup "a" across batches
      q.processAllAvailable()
      val locals = spark.table("dedup1").collect().map(_.getAs[String]("local_id")).sorted
      assert(locals.sameElements(Array("a", "b", "c")))
    } finally q.stop()
  }

  test("watermark drops late events from a windowed aggregation (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // epoch-aligned to the 10-min window grid so window starts land
    // exactly on t0 + k·10min (Spark tumbling windows align to epoch)
    val t0 = 1700000400000L
    def at(deltaMin: Long) = new java.sql.Timestamp(t0 + deltaMin * 60000L)

    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = mem.toDS().toDF("user_id", "tts")
      .withWatermark("tts", "10 minutes")
      .groupBy(window($"tts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"n")

    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late1").start()
    try {
      // batch 1: three on-time events in [t0, t0+10) and one at t0+20
      // → watermark advances to t0+10: the [t0, t0+10) window closes
      mem.addData((1L, at(0)), (2L, at(3)), (3L, at(7)), (4L, at(20)))
      q.processAllAvailable()
      // batch 2: a LATE event 30 min before t0 — processed under the
      // batch-1 watermark (t0+10), far past its window's end → dropped;
      // plus an on-time event at t0+45 advancing the watermark to t0+35
      mem.addData((5L, at(-30)), (6L, at(45)))
      q.processAllAvailable()
      // batch 3: one more on-time event so a batch RUNS with watermark
      // t0+35 — that strictly passes the t0+20 window's end (t0+30)
      // and flushes it
      mem.addData((7L, at(60)))
      q.processAllAvailable()

      val rows = spark.table("late1").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      // the closed on-time windows emitted with the right counts
      assert(rows(t0) == 3L, s"on-time window wrong: $rows")
      assert(rows(t0 + 20 * 60000L) == 1L, s"t0+20 window wrong: $rows")
      // the late event's window was NEVER emitted — the event was
      // dropped by the watermark, not slipped into a new window
      assert(!rows.contains(t0 - 30 * 60000L),
        s"late event leaked into output: $rows")
      // closed windows are exactly {t0: 3, t0+20: 1, t0+40: 1} — five
      // on-time events; the late event is counted in NO window (only
      // at(60)'s still-open window is absent)
      assert(rows.keySet == Set(t0, t0 + 20 * 60000L, t0 + 40 * 60000L),
        s"unexpected window set: $rows")
      assert(rows.values.sum == 5L, s"late event counted somewhere: $rows")
    } finally q.stop()
  }

  test("stream-stream join: events join within a watermarked time interval") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(oid: Long, stream: String, local: String, tMs: Long) = graft.eventstore.Event(
      stream, oid, new java.sql.Timestamp(tMs), "svc", local, "1", "{}")
    val t0 = 1700000000000L
    val purchases = MemoryStream[graft.eventstore.Event]
    val signups = MemoryStream[graft.eventstore.Event]

    val p = purchases.toDS().toDF()
      .select($"local_id".as("p_user"), $"event_time".as("p_time"))
      .withWatermark("p_time", "10 minutes")
    val s = signups.toDS().toDF()
      .select($"local_id".as("s_user"), $"event_time".as("s_time"))
      .withWatermark("s_time", "10 minutes")

    // purchase matches a signup of the same user within the prior hour
    val joined = p.join(s, expr(
      "p_user = s_user AND p_time >= s_time AND p_time <= s_time + INTERVAL 1 HOUR"))

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj").start()
    try {
      signups.addData(ev(1, "signup", "u1", t0), ev(2, "signup", "u2", t0))
      purchases.addData(
        ev(3, "purchase", "u1", t0 + 600000), // 10 min later → joins
        ev(4, "purchase", "u2", t0 + 7200000), // 2 h later → outside interval
        ev(5, "purchase", "u3", t0 + 300000)) // no signup → no join
      q.processAllAvailable()
      val users = spark.table("ssj").collect().map(_.getAs[String]("p_user")).sorted
      assert(users.sameElements(Array("u1")))
    } finally q.stop()
  }

  test("stats listener records processed rows per query (O23)") {
    val log = tmpDir("slog")
    Ingest.ingest(rawEvents(20), log, T0)
    val listener = StatsListener.install(spark)
    try {
      val q = HotCold.countProjection(HotCold.hotCold(spark, log))
        .writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("statq")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      // listener events are async; give the bus a moment
      val deadline = System.currentTimeMillis() + 10000
      var snap = listener.snapshot
      while (!snap.exists(s => s.name == "statq" && s.processed == 20L) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(200); snap = listener.snapshot
      }
      assert(snap.exists(s => s.name == "statq" && s.processed == 20L))
    } finally spark.streams.removeListener(listener)
  }

  test("descriptor stats (processed / avg-time / mem-used) advance over the twin set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = StatsListener.install(spark)
    val t0 = 1700000000000L

    def await(name: String, minProcessed: Long): StatsListener#QueryStats = {
      val deadline = System.currentTimeMillis() + 15000
      var s = listener.snapshot.find(_.name == name)
      while (!s.exists(_.processed >= minProcessed) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(200); s = listener.snapshot.find(_.name == name)
      }
      assert(s.exists(_.processed >= minProcessed),
        s"$name never reached $minProcessed processed: $s")
      s.get
    }

    // two stateful twins on one session; neither needs code changes to
    // report — the listener surface serves the whole twin set
    val memB = MemoryStream[(Long, Long, Long)]
    val qB = StreamingBurst.stats(memB.toDS().toDF("user_id", "event_id", "ms"))
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("twin_burst").start()
    val memP = MemoryStream[(Long, Long, Long, String)]
    val qP = StreamingPaths.paths(memP.toDS().toDF("user_id", "ts_ms", "event_id", "event_type"))
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("twin_paths").start()
    try {
      memB.addData((1L, 1L, t0), (1L, 2L, t0 + 1000), (2L, 3L, t0))
      qB.processAllAvailable()
      memP.addData((1L, t0, 1L, "view"), (1L, t0 + 1, 2L, "click"), (1L, t0 + 2, 3L, "purchase"))
      qP.processAllAvailable()
      val b1 = await("twin_burst", 3L)
      val p1 = await("twin_paths", 3L)
      // mem-used: the state store footprint is live and non-zero for
      // stateful twins (BurstState per user / PathState per user)
      assert(b1.memUsedBytes > 0L && b1.stateRows == 2L, s"burst state: $b1")
      assert(p1.memUsedBytes > 0L && p1.stateRows == 1L, s"paths state: $p1")
      assert(b1.avgMsPerEvent > 0.0)

      // a second batch ADVANCES the columns: processed grows, state rows
      // track the user population
      memB.addData((3L, 4L, t0), (3L, 5L, t0 + 500))
      qB.processAllAvailable()
      val b2 = await("twin_burst", b1.processed + 2L)
      assert(b2.lastBatchRows == 2L && b2.stateRows == 3L, s"burst after b2: $b2")

      // the queryable-rows surface (reference `stats` API): one row per
      // twin with the descriptor columns
      val rows = TwinStats.toDF(spark, listener)
        .where($"query_name".startsWith("twin_"))
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      assert(rows.keySet == Set("twin_burst", "twin_paths"))
      assert(rows.values.forall(_ > 0L), s"mem_used_bytes rows: $rows")
    } finally { qB.stop(); qP.stop(); spark.streams.removeListener(listener) }
  }
}
