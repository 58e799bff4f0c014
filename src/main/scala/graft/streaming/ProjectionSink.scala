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
        val tablePath = new org.apache.hadoop.fs.Path(tableDir)
        val fs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // explicit existence check — a catch-all here would treat any
        // transient read failure as "first batch" and silently drop
        // every stream not present in this batch
        val merged =
          if (!fs.exists(tablePath)) next
          else {
            val prev = spark.read.parquet(tableDir)
            // latest descriptor per stream wins (this batch > previous)
            prev.join(next.select("stream_name"), Seq("stream_name"), "left_anti")
              .unionByName(next)
          }
        val tmp = new org.apache.hadoop.fs.Path(s"$tableDir.tmp_$batchId")
        merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        // rename old aside, swap, drop old — recoverable at every step
        val old = new org.apache.hadoop.fs.Path(s"$tableDir.old")
        fs.delete(old, true)
        if (fs.exists(tablePath)) require(fs.rename(tablePath, old),
          s"rename $tablePath -> $old failed")
        require(fs.rename(tmp, tablePath),
          s"descriptor table swap failed: $tmp -> $tableDir")
        fs.delete(old, true)
        ()
      }
      .start()
  }

  /** A read may race the batch writer's directory swap (old renamed
    * aside, new renamed in); one retry covers the sub-ms gap. */
  private def withRetry[T](f: => T): T =
    try f catch { case _: Exception => Thread.sleep(50); f }

  /** All current descriptors (the `projection` API read). */
  def latest(spark: SparkSession, tableDir: String): DataFrame =
    withRetry(spark.read.parquet(tableDir)).orderBy("stream_name")

  /** Point read of one stream's materialized value (`projection-value`). */
  def value(spark: SparkSession, tableDir: String, stream: String): Option[Any] =
    withRetry(spark.read.parquet(tableDir))
      .where(col("stream_name") === stream)
      .select("value").collect().headOption.map(_.get(0))
}
