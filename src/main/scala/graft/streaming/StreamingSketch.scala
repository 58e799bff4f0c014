package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Live mergeable-sketch maintenance — the streaming twin of
  * x_sketch_union: the per-(day, event_type) HLL sketch table is kept
  * up to date as events ARRIVE, so "distinct users, any window" is
  * answerable at any moment by unioning the current artifact rows —
  * no nightly batch job, no rescan, and the same downstream read path
  * as the batch-built artifact (hll_union_agg over the parquet table).
  *
  * Mechanics: a streaming aggregation carries one HLL buffer per
  * (day, type) key in the state store (Datasketches partial aggregates
  * work as streaming state like any typed buffer — KBs per key,
  * cardinality-independent), and each micro-batch writes the artifact
  * table in Complete mode as a fresh VERSIONED SNAPSHOT dir
  * (`outDir/v=<batchId>`), pruning older snapshots only after the new
  * one commits; [[estimates]] reads the newest snapshot carrying a
  * _SUCCESS marker. That gives readers snapshot isolation with no
  * atomic-rename assumption: a concurrent read never observes a
  * half-deleted table, a crash mid-write leaves the previous snapshot
  * live, and a replayed batch simply overwrites its own orphan
  * version dir (idempotent — Complete mode re-emits the same state).
  * Complete-over-foreachBatch is the right trade HERE because the
  * artifact is structurally tiny — |days|×|types| rows of KB sketches.
  * At 100 TB the artifact is still tiny (days × types, not events),
  * but if the key space ever grew unbounded the documented migration
  * is a watermark + update-mode sink that overwrites only changed day
  * partitions.
  *
  * Estimates from the live table are IDENTICAL to batch-built sketches
  * over the same events — HLL register state is a deterministic
  * set-function of the inputs (order/batching-invariant), which is the
  * same mergeability property the batch spec pins; the streaming spec
  * re-pins it across micro-batch splits and restarts.
  */
object StreamingSketch {

  /** Start maintaining the sketch table from `events` — streaming
    * (ts timestamp, event_type string, user_id long) rows — writing
    * the full artifact (day, event_type, sk, n_events) to a versioned
    * snapshot under `outDir` each micro-batch. */
  def start(
      events: DataFrame,
      outDir: String,
      checkpoint: String): StreamingQuery =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
        count(lit(1)).as("n_events"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // new snapshot first, prune strictly-older ones after: readers
        // of estimates() always find a complete snapshot, and a crash
        // between the two steps leaks only a superseded dir that the
        // next batch's prune removes
        batch.write.mode("overwrite").parquet(s"$outDir/v=$batchId")
        val root = new org.apache.hadoop.fs.Path(outDir)
        val fs = root.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        fs.listStatus(root).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("v=") && n.drop(2).toLongOption.exists(_ < batchId))
            fs.delete(st.getPath, true)
        }
      }
      .start()

  /** The artifact's read path (shared with the batch-built table):
    * distinct-user estimate per event_type across all days in the
    * NEWEST COMMITTED snapshot (largest v= dir with a _SUCCESS
    * marker — in-flight writes are invisible). */
  def estimates(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = fs.listStatus(root).flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("v=") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        n.drop(2).toLongOption.map(_ -> st.getPath.toString)
      else None
    }.maxBy(_._1)._2
    spark.read.parquet(latest)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
        .as("n_users_est"))
      .orderBy(col("event_type"))
  }
}
