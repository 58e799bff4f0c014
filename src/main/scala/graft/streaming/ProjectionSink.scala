package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.eventstore.{Event, Fold, ProjRow}

/** The queryable projection-value surface (reference O10: `projection` /
  * `projection-value` point reads of the materialized state,
  * api.clj:51-64): a live stateful projection writes its updated
  * descriptors per micro-batch into a parquet descriptor table
  * (one snapshot dir per batch, latest wins), and point reads go
  * through [[latest]] / [[value]].
  *
  * foreachBatch (not a plain file sink) because update-mode stateful
  * output can't append to files; the batch writer is also where a real
  * deployment would upsert into a key-value store instead.
  */
object ProjectionSink {

  /** Start the live projection, maintaining `tableDir` as the current
    * descriptor snapshot (overwritten per batch with the merged latest
    * values). */
  def start[S](
      events: Dataset[Event],
      fold: Fold[S],
      tableDir: String,
      checkpointDir: String)(
      implicit stateEnc: Encoder[StatefulProjection.ProjState[S]],
      rowEnc: Encoder[ProjRow[S]]): StreamingQuery = {
    StatefulProjection.run(events, fold)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[ProjRow[S]], batchId: Long) =>
        val spark = batch.sparkSession
        val next = batch.toDF()
        val base = new org.apache.hadoop.fs.Path(tableDir)
        val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // versioned snapshots + a pointer file: readers resolve _LATEST
        // and read an immutable version dir, so there is NO swap window
        // — the previous version stays intact until after the pointer
        // moves. (An in-place directory swap raced readers between
        // file-listing and file-reading.)
        val merged = currentVersion(spark, tableDir) match {
          case None => next
          case Some(prevDir) =>
            val prev = spark.read.parquet(prevDir)
            // latest descriptor per stream wins (this batch > previous)
            prev.join(next.select("stream_name"), Seq("stream_name"), "left_anti")
              .unionByName(next)
        }
        val vDir = new org.apache.hadoop.fs.Path(base, f"v$batchId%020d")
        merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(vDir.toString)
        // atomically move the pointer: write tmp, then rename OVER the
        // existing _LATEST in one operation (Options.Rename.OVERWRITE via
        // FileContext). Delete-then-rename would leave a window where the
        // pointer does not exist and readers see an empty table.
        val ptrTmp = new org.apache.hadoop.fs.Path(base, s"._LATEST.$batchId")
        val out = fs.create(ptrTmp, true)
        out.write(vDir.getName.getBytes("UTF-8")); out.close()
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.makeQualified(base).toUri, spark.sparkContext.hadoopConfiguration)
        fc.rename(fs.makeQualified(ptrTmp), fs.makeQualified(
          new org.apache.hadoop.fs.Path(base, "_LATEST")),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        // prune all but the two newest versions (current + one grace)
        val versions = fs.listStatus(base).map(_.getPath)
          .filter(_.getName.startsWith("v")).sortBy(_.getName)
        versions.dropRight(2).foreach(fs.delete(_, true))
        ()
      }
      .start()
  }

  /** Resolve the current snapshot dir via the pointer; None before the
    * first batch commits. */
  private def currentVersion(spark: SparkSession, tableDir: String): Option[String] = {
    val base = new org.apache.hadoop.fs.Path(tableDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new org.apache.hadoop.fs.Path(base, "_LATEST")
    if (!fs.exists(ptr)) None
    else {
      val len = fs.getFileStatus(ptr).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(ptr)
      in.readFully(0, buf)
      in.close()
      Some(new org.apache.hadoop.fs.Path(base, new String(buf, "UTF-8").trim).toString)
    }
  }

  /** One narrow retry: a reader that resolved the pointer just before a
    * prune can lose its (grace-period) version dir; re-resolving gets
    * the fresh snapshot. Only the file-missing case retries — real
    * errors surface immediately. The snapshot is MATERIALIZED inside the
    * guarded region (the descriptor table is catalog-sized — one row per
    * stream) and returned as a local frame, so the caller's later
    * orderBy/collect cannot re-scan a version dir the pruner has since
    * removed. A missing pointer is not retried: with the overwrite
    * rename above there is no pointer-swap window, so None genuinely
    * means "no batch committed yet". */
  private def readLatest(spark: SparkSession, tableDir: String): Option[DataFrame] = {
    def attempt(): Option[DataFrame] =
      currentVersion(spark, tableDir).map { dir =>
        val df = spark.read.parquet(dir)
        val rows = df.collect() // force the read inside the guarded region
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      }
    try attempt()
    catch { case _: java.io.FileNotFoundException => attempt() }
  }

  /** All current descriptors (the `projection` API read); empty frame
    * before the first batch commits. */
  def latest(spark: SparkSession, tableDir: String): DataFrame =
    readLatest(spark, tableDir)
      .map(_.orderBy("stream_name"))
      .getOrElse(spark.emptyDataFrame)

  /** Point read of one stream's materialized value (`projection-value`). */
  def value(spark: SparkSession, tableDir: String, stream: String): Option[Any] =
    readLatest(spark, tableDir).flatMap { df =>
      df.where(col("stream_name") === stream)
        .select("value").collect().headOption.map(_.get(0))
    }
}
