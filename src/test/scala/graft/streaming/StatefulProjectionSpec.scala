package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.eventstore.{CountFold, Event, Fold}

/** Live arbitrary-fold projections: state carried across micro-batches,
  * in-order folding, failure capture (reference projections.clj live
  * update tests :46-66, error capture streams.clj:90-97). */
class StatefulProjectionSpec extends AnyFunSuite with SparkTestBase {

  private def ev(stream: String, oid: Long, payload: String = "{}"): Event =
    Event(stream, oid, new java.sql.Timestamp(oid / 1000), "svc", s"l$oid", "1", payload)

  test("count projection folds across micro-batches with state-store resume") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StatefulProjection.run(mem.toDS(), CountFold("live"))
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("live_counts")
      .start()
    try {
      mem.addData(ev("a", 1), ev("a", 2), ev("b", 3))
      q.processAllAvailable()
      mem.addData(ev("a", 4), ev("b", 5), ev("b", 6))
      q.processAllAvailable()
      // update mode: last row per stream is the live descriptor value
      val last = spark.table("live_counts").collect()
        .map(r => (r.getString(1), r.getLong(2))) // stream_name, value
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(last == Map("a" -> 3L, "b" -> 3L))
    } finally q.stop()
  }

  test("projection state resumes from the checkpoint across query restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("spckpt")
    val mem = MemoryStream[Event]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // memory sink can't recover from a checkpoint; foreachBatch can
    def start() = StatefulProjection.run(mem.toDS(), CountFold("ck"))
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.eventstore.ProjRow[Long]],
          _: Long) =>
        batch.collect().foreach(r => seen.add(r.value))
      }
      .start()

    val q1 = start()
    try {
      mem.addData(ev("a", 1), ev("a", 2))
      q1.processAllAvailable()
    } finally q1.stop()

    // new incarnation, same checkpoint: photon re-folds history on
    // restart (streams.clj:255-259); here the state store resumes at 2
    val q2 = start()
    try {
      mem.addData(ev("a", 3))
      q2.processAllAvailable()
      assert(seen.contains(3L), s"state not resumed: $seen")
    } finally q2.stop()
  }

  test("state resumes across restarts under the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateStores.useRocksDB(spark)
    try {
      val ckpt = tmpDir("rocksckpt")
      val mem = MemoryStream[Event]
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      def start() = StatefulProjection.run(mem.toDS(), CountFold("rk"))
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.eventstore.ProjRow[Long]],
            _: Long) =>
          batch.collect().foreach(r => seen.add(r.value))
        }
        .start()

      val q1 = start()
      try {
        mem.addData(ev("a", 1), ev("a", 2))
        q1.processAllAvailable()
        // the query really ran on RocksDB, not the heap default: the
        // checkpoint holds changelog/snapshot files, no HDFS-provider
        // .delta files
        val stateFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt, "state"))
          .filter(java.nio.file.Files.isRegularFile(_))
          .map[String](_.getFileName.toString)
          .collect(java.util.stream.Collectors.toList[String])
        assert(!stateFiles.isEmpty)
        assert(stateFiles.stream().noneMatch(_.endsWith(".delta")),
          s"HDFS provider files present: $stateFiles")
      } finally q1.stop()

      val q2 = start()
      try {
        mem.addData(ev("a", 3))
        q2.processAllAvailable()
        assert(seen.contains(3L), s"state not resumed under RocksDB: $seen")
      } finally q2.stop()
    } finally StateStores.useDefault(spark)
  }

  test("non-commutative fold sees events in order_id order within a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // state = concatenation of order ids: order-sensitive
    val concatFold = new Fold[String] {
      val name = "concat"
      val initial = ""
      def step(s: String, e: Event): String = s + e.order_id + ","
    }
    val mem = MemoryStream[Event]
    val q = StatefulProjection.run(mem.toDS(), concatFold)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("live_concat")
      .start()
    try {
      mem.addData(ev("a", 30), ev("a", 10), ev("a", 20)) // out of order in batch
      q.processAllAvailable()
      val v = spark.table("live_concat").collect().map(_.getString(2)).head
      assert(v == "10,20,30,")
    } finally q.stop()
  }

  test("projection sink maintains a queryable descriptor table (O10 point reads)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("ptable") + "/state"
    val ckpt = tmpDir("pckpt")
    val mem = MemoryStream[Event]
    val q = ProjectionSink.start(mem.toDS(), CountFold("live"), table, ckpt)
    try {
      mem.addData(ev("a", 1), ev("b", 2))
      q.processAllAvailable()
      mem.addData(ev("a", 3), ev("a", 4))
      q.processAllAvailable()
      val all = ProjectionSink.latest(spark, table).collect()
        .map(r => r.getAs[String]("stream_name") -> r.getAs[Long]("value")).toMap
      assert(all == Map("a" -> 3L, "b" -> 1L))
      assert(ProjectionSink.value(spark, table, "a").contains(3L))
      assert(ProjectionSink.value(spark, table, "nope").isEmpty)
    } finally q.stop()
  }

  test("runtime-registered SQL fold runs live with checkpoint resume (startSql)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("sqltable") + "/state"
    val ckpt = tmpDir("sqlckpt")
    val fold = graft.eventstore.SqlFold("v_sum",
      "sum(cast(get_json_object(payload, '$.v') as bigint))")
    val mem = MemoryStream[Event]
    def start() = ProjectionSink.startSql(mem.toDS().toDF(), fold, table, ckpt)

    val q1 = start()
    try {
      mem.addData(ev("a", 1, """{"v": 10}"""), ev("a", 2, """{"v": 5}"""),
        ev("b", 3, """{"v": 7}"""))
      q1.processAllAvailable()
      assert(ProjectionSink.value(spark, table, "a").contains(15L))
    } finally q1.stop()

    // new incarnation, same checkpoint: the streaming agg state resumes —
    // the fold continues from 15, it does not re-fold history
    val q2 = start()
    try {
      mem.addData(ev("a", 4, """{"v": 3}"""))
      q2.processAllAvailable()
      assert(ProjectionSink.value(spark, table, "a").contains(18L))
      assert(ProjectionSink.value(spark, table, "b").contains(7L))
      val rows = ProjectionSink.latest(spark, table).collect()
      val names = rows.map(_.getString(0)).distinct
      assert(names.sameElements(Array("v_sum")),
        s"names=${names.mkString("|")} rows=${rows.mkString("; ")}")
    } finally q2.stop()
  }

  test("ordered SQL fold runs live: state carries across batches and restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("ordtable") + "/state"
    val ckpt = tmpDir("ordckpt")
    val fold = graft.eventstore.OrderedSqlFold(
      "journal", "''", "concat(acc, x.local_id, ';')")
    val mem = MemoryStream[Event]
    def start() = ProjectionSink.startOrderedSql(mem.toDS().toDF(), fold, table, ckpt)

    val q1 = start()
    try {
      // out-of-order within the batch: the sorted-array fold must apply 1 then 2
      mem.addData(ev("a", 2), ev("a", 1), ev("b", 3))
      q1.processAllAvailable()
      assert(ProjectionSink.value(spark, table, "a").contains("l1;l2;"))
      mem.addData(ev("a", 4))
      q1.processAllAvailable()
      assert(ProjectionSink.value(spark, table, "a").contains("l1;l2;l4;"))
    } finally q1.stop()

    // restart with the same checkpoint: the snapshot IS the state — the
    // fold continues from it, it does not re-fold history
    val q2 = start()
    try {
      mem.addData(ev("a", 5), ev("c", 6))
      q2.processAllAvailable()
      assert(ProjectionSink.value(spark, table, "a").contains("l1;l2;l4;l5;"))
      assert(ProjectionSink.value(spark, table, "b").contains("l3;"))
      assert(ProjectionSink.value(spark, table, "c").contains("l6;"))
    } finally q2.stop()
  }

  test("ordered SQL fold does not double-apply a REPLAYED batch (at-least-once retry)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("replaytable") + "/state"
    val ckpt = tmpDir("replayckpt")
    val fold = graft.eventstore.OrderedSqlFold(
      "journal", "''", "concat(acc, x.local_id, ';')")
    val mem = MemoryStream[Event]
    def start() = ProjectionSink.startOrderedSql(mem.toDS().toDF(), fold, table, ckpt)

    val q1 = start()
    try {
      mem.addData(ev("a", 1), ev("a", 2))
      q1.processAllAvailable()
      assert(ProjectionSink.value(spark, table, "a").contains("l1;l2;"))
    } finally q1.stop()

    // force the documented at-least-once window: source offsets for
    // batch 0 committed, batch commit marker lost → restart re-runs
    // batch 0 with the SAME batch id (the .crc sidecar goes with the
    // marker, as a real crash would have left neither)
    assert(new java.io.File(s"$ckpt/commits/0").delete())
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    val q2 = start()
    try {
      q2.processAllAvailable()
      // the replayed fold read "the newest version STRICTLY BELOW batch
      // 0" = none → re-folded from init and overwrote v0: same value,
      // not l1;l2;l1;l2;
      assert(ProjectionSink.value(spark, table, "a").contains("l1;l2;"),
        s"replayed batch double-applied: ${ProjectionSink.value(spark, table, "a")}")
      mem.addData(ev("a", 3))
      q2.processAllAvailable()
      assert(ProjectionSink.value(spark, table, "a").contains("l1;l2;l3;"))
    } finally q2.stop()
  }

  test("fresh checkpoint against an existing descriptor table fails fast (no silent reset)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("mmtable") + "/state"
    val fold = graft.eventstore.OrderedSqlFold(
      "journal", "''", "concat(acc, x.local_id, ';')")
    val mem = MemoryStream[Event]
    val q1 = ProjectionSink.startOrderedSql(
      mem.toDS().toDF(), fold, table, tmpDir("mmckpt1"))
    try {
      // three separate batches so the table holds versions v1,v2 (> 0)
      mem.addData(ev("a", 1)); q1.processAllAvailable()
      mem.addData(ev("a", 2)); q1.processAllAvailable()
      mem.addData(ev("a", 3)); q1.processAllAvailable()
      assert(ProjectionSink.value(spark, table, "a").contains("l1;l2;l3;"))
    } finally q1.stop()

    // a FRESH checkpoint resets batch ids to 0; against the kept table
    // the old behavior silently re-initialized state AND the name-sorted
    // pruner deleted the just-written v0 while _LATEST pointed at it —
    // now it must fail fast instead
    val mem2 = MemoryStream[Event]
    val q2 = ProjectionSink.startOrderedSql(
      mem2.toDS().toDF(), fold, table, tmpDir("mmckpt2"))
    try {
      mem2.addData(ev("a", 4))
      val ex = intercept[Exception] { q2.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("checkpoint/table mismatch")), msgs(ex))
      // the table survived untouched: pointer resolves, state intact
      assert(ProjectionSink.value(spark, table, "a").contains("l1;l2;l3;"))
    } finally q2.stop()
  }

  test("projection/<name> subscription sees its own updates only, latest-conflated") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val updates = tmpDir("pupd") + "/updates"
    val memA = MemoryStream[Event]
    val memB = MemoryStream[Event]
    // two projections share one updates channel
    val qA = ProjectionSink.start(memA.toDS(), CountFold("proj_a"),
      tmpDir("pta") + "/state", tmpDir("pca"), Some(updates))
    val qB = ProjectionSink.start(memB.toDS(), CountFold("proj_b"),
      tmpDir("ptb") + "/state", tmpDir("pcb"), Some(updates))
    try {
      memA.addData(ev("s1", 1), ev("s1", 2))
      memB.addData(ev("s1", 3), ev("s2", 4))
      qA.processAllAvailable(); qB.processAllAvailable()

      def readSub(): Map[String, Long] = {
        val sub = ProjectionSink.subscribe(spark, updates, "proj_a")
        val qn = s"sub_${System.nanoTime()}"
        val sq = HotCold.startMemorySink(sub, qn, OutputMode.Update())
        try {
          sq.processAllAvailable()
          spark.table(qn).collect()
            .map(r => (r.getAs[String]("stream_name"), r.getAs[Long]("value")))
            .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
        } finally sq.stop()
      }
      // only proj_a's descriptors, conflated to the latest value
      assert(readSub() == Map("s1" -> 2L))

      // another ingest batch: the subscriber observes the updated value
      memA.addData(ev("s1", 5), ev("s2", 6))
      qA.processAllAvailable()
      assert(readSub() == Map("s1" -> 3L, "s2" -> 1L))
    } finally { qA.stop(); qB.stop() }
  }

  test("failing fold freezes state, reports failed, stream keeps running") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val boom = new Fold[Long] {
      val name = "boom"
      val initial = 0L
      def step(s: Long, e: Event): Long =
        if (e.payload == "bad") throw new IllegalStateException("kaboom") else s + 1
    }
    val mem = MemoryStream[Event]
    val q = StatefulProjection.run(mem.toDS(), boom)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("live_boom")
      .start()
    try {
      mem.addData(ev("a", 1), ev("a", 2), ev("a", 3, "bad"), ev("a", 4))
      q.processAllAvailable()
      val r = spark.table("live_boom").collect().last
      assert(r.getLong(2) == 2L) // frozen at last good state
      assert(r.getString(4) == "failed")
      assert(r.getString(5) != null && r.getString(5).contains("kaboom"))
    } finally q.stop()
  }
}
