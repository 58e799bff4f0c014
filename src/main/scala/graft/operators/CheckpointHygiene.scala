package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the block-manager storage behind a localCheckpoint'd
  * Dataset. `Dataset.unpersist` only uncaches CATALOG-cached plans;
  * a local checkpoint lives as a persistent RDD outside the catalog
  * and survives `spark.catalog.clearCache()` — in a long session
  * (bench: ~500 query executions) un-released checkpoints accumulate
  * into block-manager/GC pressure that taxes every LATER query (the
  * r8 x_zipf_slope anomaly: alphabetically-last lines inflated ~25×).
  *
  * Only call this once every action over the checkpoint has run:
  * local-checkpoint lineage is TRUNCATED, so an unpersisted block
  * cannot be recomputed — a consumer that reads it afterwards fails
  * rather than recomputes. Safe by construction at the two call
  * sites (MinHashDedup.saveIndex, the x_ann_incremental one-time
  * build): both fully consume the checkpoint inside the function
  * before releasing it.
  */
object CheckpointHygiene {
  /** Unpersist every checkpoint RDD under `df`'s plan — not just a root
    * LogicalRDD: a rename/projection over a checkpoint (BpeTrainer's
    * returned state, KCore's final select) must still be releasable by
    * the frame the caller actually holds. Only call on frames whose
    * checkpoint leaves the caller OWNS: leaves are truncated-lineage
    * blocks, so releasing someone else's means their next read fails
    * rather than recomputes. */
  def release(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.logical.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }

  /** Root-only variant: releases ONLY when the frame's plan IS a bare
    * checkpoint — the safe-by-default form for frames that may embed a
    * CALLER's lineage (ConnectedComponents' round-0 labels): recursive
    * release() would walk into and free checkpoints the caller owns.
    * Use release() only when every checkpoint leaf under the plan is
    * provably yours (a frame built over your own bare checkpoint). */
  def releaseRoot(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.logical match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }

  /** Transfer checkpoint-block ownership to the CALLER'S first action:
    * a one-shot QueryExecutionListener watches for the first completed
    * (or failed) execution whose plan reads this checkpoint RDD and
    * unpersists it then — the probeAndConsume pattern without forcing
    * the callee into continuation style, for operators (PageRank's
    * distributed branch) that must RETURN a lazily-consumed frame but
    * have no post-action hook of their own. Contract: the returned
    * frame is SINGLE-CONSUMPTION — local-checkpoint lineage is
    * truncated, so a second action over it would find the blocks gone
    * and fail rather than recompute (the same contract release()
    * documents; both prod consumers — Verify's parquet write, Bench's
    * noop write — run exactly one action per run() invocation). A
    * frame that is never consumed leaks one listener + its blocks,
    * exactly what the un-instrumented checkpoint leaked before. */
  def releaseAfterFirstAction(df: DataFrame): DataFrame =
    releaseAfterFirstAction(df, df)

  /** As above, but the frame being WATCHED (`result`, the one the
    * caller consumes) and the frame whose checkpoint blocks are
    * RELEASED (`checkpointed`, a LogicalRDD somewhere under `result`'s
    * plan) may differ — the shape of IvfPq's lazy probe, where the
    * per-batch encode checkpoint feeds the returned scored frame. */
  def releaseAfterFirstAction(result: DataFrame, checkpointed: DataFrame): DataFrame = {
    checkpointed.queryExecution.logical match {
      case l: LogicalRDD =>
        val spark = result.sparkSession
        val rddId = l.rdd.id
        // ARMING MARKER — the listener bus is ASYNCHRONOUS: an execution
        // that touched this rdd BEFORE registration (IvfPq's probed-cells
        // collect, an iteration loop's convergence count) can have its
        // completion event delivered AFTER registration, which would
        // release the blocks while the real consumer still needs them
        // (measured: x_dedup_keepbest "Block rdd_N does not exist" under
        // the 8-wide suite run). Events post to the bus synchronously at
        // action end and deliver FIFO, so a marker executed AFTER
        // registration cleanly separates stale events (ignored) from
        // genuine post-registration consumers. If the marker event is
        // ever dropped (bus overflow), the listener never arms and the
        // blocks merely leak — the pre-listener behavior, never a crash.
        val marker = spark.range(0).toDF()
        // WEAK reference to the checkpoint rdd: a frame that is
        // CONSTRUCTED but never consumed (plan-shape reads, explain,
        // speculative builds) would otherwise leave its listener
        // registered for the session's lifetime, and each such leak
        // taxes EVERY later execution with a plan traversal. Spark
        // tracks persisted rdds weakly, so once the un-consumed frame
        // is dropped the rdd is collectable — the listener then
        // unregisters itself on the next event it sees.
        val rddRef = new java.lang.ref.WeakReference(l.rdd)
        val listener = new org.apache.spark.sql.util.QueryExecutionListener {
          private val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
          private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
          private def maybe(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
            if (!armed.get) {
              if (qe eq marker.queryExecution) armed.set(true)
              return
            }
            val rdd = rddRef.get
            if (rdd == null) { // frame died unconsumed — expire
              if (fired.compareAndSet(false, true))
                spark.listenerManager.unregister(this)
              return
            }
            val touches = qe.analyzed.exists {
              case x: LogicalRDD => x.rdd.id == rddId
              case _             => false
            }
            if (touches && fired.compareAndSet(false, true)) {
              rdd.unpersist(blocking = false)
              spark.listenerManager.unregister(this)
            }
          }
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = maybe(qe)
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = maybe(qe)
        }
        spark.listenerManager.register(listener)
        marker.collect()
      case _ => ()
    }
    result
  }
}
