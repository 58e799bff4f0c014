package graft.eventstore

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Mirrors the reference's ingest/replay invariants:
  * stamping (integration_test.clj:31-33), replay counts (:42-64),
  * cold-replay determinism (stream_test.clj:77-81, 97-101).
  */
class IngestReplaySpec extends AnyFunSuite with SparkTestBase {

  private val T0 = 1700000000000L

  test("stamp: event_time = ingest ms, order_id = 1000*ms + seq, unique and monotone") {
    val stamped = Ingest.stamp(rawEvents(20), T0).orderBy("order_id").collect()
    assert(stamped.length == 20)
    val oids = stamped.map(_.getAs[Long]("order_id"))
    assert(oids.distinct.length == 20)
    assert(oids.sorted.sameElements(oids))
    assert(oids.forall(o => o >= T0 * 1000 && o < (T0 + 1) * 1000))
    val ts = stamped.map(_.getAs[java.sql.Timestamp]("event_time").getTime)
    assert(ts.forall(_ == T0))
  }

  test("stamp: batches beyond the 1000/ms ceiling overflow into later ms (no collisions)") {
    val stamped = Ingest.stamp(rawEvents(2500), T0)
    import spark.implicits._
    assert(stamped.select("order_id").distinct().count() == 2500)
    val msSpread = stamped.select((unix_millis($"event_time") - T0).as("d"))
      .agg(min($"d"), max($"d")).as[(Long, Long)].head()
    assert(msSpread == ((0L, 2L))) // 2500 events = ms 0,1,2
  }

  test("partitioned stamping: zero exchanges, unique, per-partition monotone, re-stamp deterministic") {
    // stable multi-partition source: same files → same partition layout
    val dir = tmpDir("pstampsrc")
    rawEvents(300).repartition(8).write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)

    val stamped = Ingest.stampPartitioned(raw, T0)
    // shuffle-free: the whole stamping plan must contain no Exchange
    val plan = stamped.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stamping shuffled:\n$plan")

    val rows = stamped.select("order_id", "local_id", "stream_name").collect()
    val oids = rows.map(_.getLong(0))
    assert(oids.length == 300 && oids.distinct.length == 300) // unique
    // encoding: order_id DIV 2^20 recovers the ingest ms for every event
    assert(oids.forall(_ >> 20 == T0))
    // per-partition monotonicity: within one partition range, sequence
    // values increase in row order (ranges are disjoint by construction)
    val byPartition = oids.map(o => o & ((1L << 20) - 1)).groupBy(_ / (1 << 14))
    byPartition.values.foreach(seqs => assert(seqs.sorted.sameElements(seqs)))
    assert(byPartition.size > 1) // the source really was multi-partition

    // determinism: re-stamping the same source yields identical stamps
    val again = Ingest.stampPartitioned(spark.read.parquet(dir), T0)
      .select("order_id", "local_id", "stream_name").collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("validate: null required field is rejected, not stored") {
    import spark.implicits._
    val raw = rawEvents(4).withColumn("service_id",
      when($"local_id" === "loc-0", lit(null)).otherwise($"service_id"))
    val (ok, bad) = Ingest.validate(raw)
    assert(ok.count() == 3 && bad.count() == 1)
  }

  test("cold replay: determinism, counts, from/limit, point lookup") {
    val log = tmpDir("log")
    Ingest.ingest(rawEvents(4), log, T0)
    Ingest.ingest(rawEvents(9).where(col("local_id") =!= "loc-0"), log, T0 + 5000)
    val df = Replay.open(spark, log)

    assert(Replay.cold(df).count() == 12) // 4 + 8
    val r1 = Replay.cold(df, "s1").collect().map(_.getAs[Long]("order_id"))
    val r2 = Replay.cold(df, "s1").collect().map(_.getAs[Long]("order_id"))
    assert(r1.sameElements(r2)) // determinism: same replay twice
    assert(r1.sorted.sameElements(r1)) // total order by order_id

    assert(Replay.cold(df, fromMs = T0 + 5000).count() == 8)
    assert(Replay.cold(df, limit = Some(5)).count() == 5)

    val oid = r1.head
    assert(Replay.pointGet(df, "s1", oid).count() == 1)
    assert(Replay.distinctStreams(df).collect().map(_.getString(0)).toSeq == Seq("s1", "s2"))
  }

  test("date-partitioned layout: stream/date dirs, replay unchanged") {
    val log = tmpDir("dlog")
    Ingest.append(Ingest.stamp(rawEvents(10), T0), log, byDate = true)
    val dayMs = 86400000L
    Ingest.append(Ingest.stamp(rawEvents(6), T0 + dayMs), log, byDate = true)
    val s1 = new java.io.File(s"$log/stream_name=s1")
    assert(s1.listFiles().map(_.getName).count(_.startsWith("event_date=")) == 2)
    val df = Replay.open(spark, log)
    assert(Replay.cold(df, "s1").count() == 8)
    assert(Replay.cold(df, "s1", fromMs = T0 + dayMs).count() == 3)
  }

  test("compaction: many micro-batch files → few sorted files, same rows") {
    val log = tmpDir("clog")
    // 10 "micro-batches" → ≥10 files in s1's partition
    (0 until 10).foreach { i =>
      Ingest.ingest(rawEvents(20, Seq("s1")), log, T0 + i * 1000)
    }
    val part = new java.io.File(s"$log/stream_name=s1")
    val before = part.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 10)
    val before200 = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id"))

    val after = Replay.compactStream(spark, log, "s1", targetRows = 1000000L)
    assert(after == 1)
    val after200 = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id"))
    assert(after200.sameElements(before200)) // identical replay post-compaction
  }

  test("compaction preserves a date-bucketed layout (no mixed partition schemes)") {
    val log = tmpDir("cdlog")
    val dayMs = 86400000L
    (0 until 4).foreach { i =>
      Ingest.append(Ingest.stamp(rawEvents(20, Seq("s1")), T0 + i * dayMs), log,
        byDate = true)
    }
    val before = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id"))

    val nFiles = Replay.compactStream(spark, log, "s1", targetRows = 1000000L)
    assert(nFiles == 4, // one file per surviving event_date dir — the
      s"compactStream must count files recursively under byDate, got $nFiles")
    // event_date dirs survive the rewrite — whole-log partition
    // discovery still sees one consistent (stream_name, event_date) scheme
    val part = new java.io.File(s"$log/stream_name=s1")
    assert(part.listFiles().map(_.getName).count(_.startsWith("event_date=")) == 4)
    assert(part.listFiles().count(_.getName.endsWith(".parquet")) == 0)
    val after = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id"))
    assert(after.sameElements(before))
    // and the date-pruned scan still works
    assert(Replay.cold(Replay.open(spark, log), "s1", fromMs = T0 + 3 * dayMs)
      .count() == 20)
  }

  test("compaction crash between renames is healed at open time") {
    val log = tmpDir("crlog")
    Ingest.ingest(rawEvents(20, Seq("s1")), log, T0)
    val before = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id"))
    // simulate the crash window: partition renamed away, tmp half-written
    val part = new java.io.File(s"$log/stream_name=s1")
    val old = new java.io.File(s"$log/.compact_old_s1")
    assert(part.renameTo(old))
    new java.io.File(s"$log/.compact_tmp_s1").mkdirs()
    assert(Replay.recoverCompaction(spark, log, "s1"))
    assert(!old.exists() && part.exists())
    val after = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id"))
    assert(after.sameElements(before))
    assert(!Replay.recoverCompaction(spark, log, "s1")) // idempotent no-op
  }

  test("hot-topic reconciliation republishes log events a crashed dual-write missed") {
    val log = tmpDir("rlog")
    val hot = tmpDir("rhot")
    // batch 1 lands in both sinks; batch 2 simulates the crash window —
    // log committed, topic write never happened (the at-most-once gap)
    Ingest.append(Ingest.stamp(rawEvents(10, Seq("s1")), T0), log, hotDir = Some(hot))
    Ingest.append(Ingest.stamp(rawEvents(6, Seq("s1")), T0 + 1000), log)
    assert(spark.read.parquet(hot).count() == 10)

    val republished = Ingest.reconcileHotTopic(spark, log, hot, sinceMs = T0)
    assert(republished == 6)
    // topic now carries exactly the log's window, same order_ids, and the
    // canonical column order hot subscribers expect
    val topic = spark.read.parquet(hot)
    assert(topic.columns.head == "stream_name")
    val logIds = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id")).sorted
    assert(topic.collect().map(_.getAs[Long]("order_id")).sorted.sameElements(logIds))
    // idempotent: a second pass republishes nothing
    assert(Ingest.reconcileHotTopic(spark, log, hot, sinceMs = T0) == 0)
  }

  test("point event delete: cold replay excludes exactly that event") {
    val log = tmpDir("delev")
    Ingest.ingest(rawEvents(10), log, T0)
    val before = Replay.typed(spark, log).collect()
      .map(e => (e.stream_name, e.order_id)).toSet
    val victim = before.filter(_._1 == "s1").map(_._2).min
    assert(Replay.deleteEvent(spark, log, "s1", victim))
    val after = Replay.typed(spark, log).collect()
      .map(e => (e.stream_name, e.order_id)).toSet
    assert(after == before - (("s1", victim)))
    // nonexistent order_id → false, nothing changes
    assert(!Replay.deleteEvent(spark, log, "s1", victim))
    assert(Replay.open(spark, log).count() == before.size - 1)
    // the other stream's partition was never touched
    assert(Replay.cold(Replay.open(spark, log), "s2").count() == 5)
  }

  test("point event delete on a date-bucketed stream rewrites only the hit bucket") {
    val log = tmpDir("delevd")
    val dayMs = 86400000L
    Ingest.append(Ingest.stamp(rawEvents(10, Seq("s1")), T0), log, byDate = true)
    Ingest.append(Ingest.stamp(rawEvents(6, Seq("s1")), T0 + dayMs), log, byDate = true)
    val part = new java.io.File(s"$log/stream_name=s1")
    val buckets = part.listFiles().filter(_.getName.startsWith("event_date=")).sorted
    assert(buckets.length == 2)
    // fingerprint the day-2 bucket: (name, mtime) of every file
    def fp(d: java.io.File) = d.listFiles().map(f => (f.getName, f.lastModified())).toSet
    val day2Before = fp(buckets(1))
    val victim = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id")).min // lives in day 1
    assert(Replay.deleteEvent(spark, log, "s1", victim))
    assert(fp(buckets(1)) == day2Before, "untouched bucket was rewritten")
    val ids = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id"))
    assert(ids.length == 15 && !ids.contains(victim))
    // date-pruned reads still work over the rewritten layout
    assert(Replay.cold(Replay.open(spark, log), "s1", fromMs = T0 + dayMs).count() == 6)
  }

  test("point-delete crash between renames is healed at open time (flat + bucket)") {
    val log = tmpDir("delevc")
    val dayMs = 86400000L
    Ingest.append(Ingest.stamp(rawEvents(8, Seq("s1")), T0), log, byDate = true)
    Ingest.append(Ingest.stamp(rawEvents(4, Seq("s1")), T0 + dayMs), log, byDate = true)
    val part = new java.io.File(s"$log/stream_name=s1")
    val bucket = part.listFiles().filter(_.getName.startsWith("event_date=")).sorted.head
    val date = bucket.getName.stripPrefix("event_date=")
    // simulate the crash window: bucket renamed away, tmp half-written
    assert(bucket.renameTo(new java.io.File(s"$log/.delevent_old_s1_$date")))
    new java.io.File(s"$log/.delevent_tmp_s1_$date").mkdirs()
    assert(Replay.recoverDeleteEvent(spark, log, "s1"))
    assert(Replay.open(spark, log).count() == 12)
    assert(!Replay.recoverDeleteEvent(spark, log, "s1")) // idempotent no-op
    // flat layout crash: whole partition renamed away
    val flat = tmpDir("delevcf")
    Ingest.ingest(rawEvents(6, Seq("s1")), flat, T0)
    assert(new java.io.File(s"$flat/stream_name=s1")
      .renameTo(new java.io.File(s"$flat/.delevent_old_s1")))
    assert(Replay.recoverDeleteEvent(spark, flat, "s1"))
    assert(Replay.open(spark, flat).count() == 6)
  }

  test("completed-swap stale backup is purged — deleted data never resurrected") {
    def copyDir(src: java.io.File, dst: java.io.File): Unit = {
      dst.mkdirs()
      src.listFiles().foreach { f =>
        val t = new java.io.File(dst, f.getName)
        if (f.isDirectory) copyDir(f, t)
        else java.nio.file.Files.copy(f.toPath, t.toPath)
      }
    }
    val log = tmpDir("delevp")
    Ingest.ingest(rawEvents(6, Seq("s1")), log, T0)
    val part = new java.io.File(s"$log/stream_name=s1")
    // simulate a point-delete swap that COMPLETED but lost its final
    // cleanup: a pre-delete backup (it would contain the deleted event)
    // alongside a healthy partition
    copyDir(part, new java.io.File(s"$log/.delevent_old_s1"))
    assert(!Replay.recoverDeleteEvent(spark, log, "s1")) // healthy → no restore
    assert(!new java.io.File(s"$log/.delevent_old_s1").exists,
      "stale pre-delete backup retained: holds recoverable copies of deleted data")
    // same for compaction backups: once the stream is legitimately
    // deleted, a stale .compact_old must not resurrect it
    copyDir(part, new java.io.File(s"$log/.compact_old_s1"))
    assert(!Replay.recoverCompaction(spark, log, "s1"))
    assert(!new java.io.File(s"$log/.compact_old_s1").exists)
    Replay.deleteStream(spark, log, "s1")
    assert(!Replay.recoverDeleteEvent(spark, log, "s1"))
    assert(!Replay.recoverCompaction(spark, log, "s1"))
    assert(!part.exists, "deleted stream came back from a stale backup")
  }

  test("deleting the last event drops the bucket/partition instead of an empty dir") {
    val log = tmpDir("delevl")
    val dayMs = 86400000L
    Ingest.append(Ingest.stamp(rawEvents(1, Seq("s1")), T0), log, byDate = true)
    Ingest.append(Ingest.stamp(rawEvents(4, Seq("s1")), T0 + dayMs), log, byDate = true)
    val part = new java.io.File(s"$log/stream_name=s1")
    val victim = Replay.cold(Replay.open(spark, log), "s1")
      .collect().map(_.getAs[Long]("order_id")).min // the lone day-1 event
    assert(Replay.deleteEvent(spark, log, "s1", victim))
    val buckets = part.listFiles().filter(_.getName.startsWith("event_date="))
    assert(buckets.length == 1, "empty event_date= dir left behind")
    assert(Replay.open(spark, log).count() == 4)
    // flat layout: deleting every event removes the partition itself,
    // and a later deleteEvent fails cleanly instead of resurrecting
    val flat = tmpDir("delevlf")
    Ingest.ingest(rawEvents(2, Seq("s1")), flat, T0)
    val ids = Replay.cold(Replay.open(spark, flat), "s1")
      .collect().map(_.getAs[Long]("order_id")).sorted
    ids.foreach(id => assert(Replay.deleteEvent(spark, flat, "s1", id)))
    assert(!new java.io.File(s"$flat/stream_name=s1").exists,
      "empty partition dir left behind")
    intercept[IllegalArgumentException] {
      Replay.deleteEvent(spark, flat, "s1", 999L)
    }
  }

  test("streams catalog counts per stream; delete-stream drops its partition") {
    val log = tmpDir("log")
    Ingest.ingest(rawEvents(10), log, T0)
    val cat = Replay.streamsCatalog(Replay.open(spark, log)).collect()
    assert(cat.map(r => r.getString(0) -> r.getLong(1)).toMap == Map("s1" -> 5L, "s2" -> 5L))
    assert(Replay.deleteStream(spark, log, "s2"))
    assert(Replay.open(spark, log).select("stream_name").distinct().count() == 1)
  }
}
